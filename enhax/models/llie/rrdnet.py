"""rrdnet — implemented later in this build (placeholder module)."""
