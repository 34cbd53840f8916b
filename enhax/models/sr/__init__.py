"""sr models."""
