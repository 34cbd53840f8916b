"""retouch models."""
