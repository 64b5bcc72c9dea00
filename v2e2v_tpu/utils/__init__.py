"""Utilities: config flags, evaluation metrics, IO writers, checkpointing."""
