"""hvi_cidnet — implemented later in this build (placeholder module)."""
