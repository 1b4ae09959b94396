"""Batch inference (RUN mode): persistent jit-compiled runner over IFCB bins
and image directories."""
