"""dehaze models."""
