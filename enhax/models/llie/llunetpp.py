"""llunetpp — implemented later in this build (placeholder module)."""
