# -*- coding: utf-8 -*-
"""Pallas TPU kernels for the hot compute ops (tiled covariance assembly;
the XLA vmapped paths remain the portable fallback)."""

from .assemble import gram, pallas_gram, xla_gram  # noqa: F401
from .tiled import tile_fn_for, pallas_gram_tiled, xla_gram_tiled  # noqa: F401
from .chol import cholesky, pallas_cholesky, pallas_cholesky_blocked  # noqa: F401

__all__ = [
    "gram",
    "pallas_gram",
    "xla_gram",
    "tile_fn_for",
    "pallas_gram_tiled",
    "xla_gram_tiled",
    "cholesky",
    "pallas_cholesky",
    "pallas_cholesky_blocked",
]
