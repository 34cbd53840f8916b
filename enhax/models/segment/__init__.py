"""segment models."""
