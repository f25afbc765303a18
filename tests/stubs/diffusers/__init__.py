"""Minimal test-only stand-in for the `diffusers` package.

Implements just enough of diffusers' public API — faithfully, from its
documented behavior — for the REFERENCE ASVA UNet source to import and run
under torch-CPU, so tests can compare our flax models against the actual
reference computation.  Not a copy of diffusers (only the thin wrapper
semantics: config capture, Attention + SDPA processor, GEGLU FeedForward,
sinusoidal Timesteps / TimestepEmbedding).
"""
from . import configuration_utils, loaders, models, utils  # noqa: F401
