# -*- coding: utf-8 -*-
"""Pallas TPU kernels for the hot compute ops (tiled covariance assembly;
the XLA vmapped paths remain the portable fallback)."""

from .assemble import gram, pallas_gram, xla_gram  # noqa: F401

__all__ = ["gram", "pallas_gram", "xla_gram"]
