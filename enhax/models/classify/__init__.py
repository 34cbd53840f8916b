"""classify models."""
