"""Assembled query pipelines registered into the engine registry."""
