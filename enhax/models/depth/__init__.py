"""depth models."""
