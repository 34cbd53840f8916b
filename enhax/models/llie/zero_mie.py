"""zero_mie — implemented later in this build (placeholder module)."""
