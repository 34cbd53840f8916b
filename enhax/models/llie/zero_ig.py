"""zero_ig — implemented later in this build (placeholder module)."""
