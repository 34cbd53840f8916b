"""lyt_net — implemented later in this build (placeholder module)."""
