"""CLI layer: train / predict / metric / plot / interactive main.

Rebuild of reference ``project/runml/``: same command surface, same flag
names where they still make sense on TPU.
"""
