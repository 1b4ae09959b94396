"""Utilities: output templating, args serialization, logging helpers."""
