"""Column-function extensions: multimodal binary plumbing, text statistics."""

from . import multimodal  # noqa: F401
