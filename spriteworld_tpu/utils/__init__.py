"""Utilities: color maps, checkpointing, specs."""
