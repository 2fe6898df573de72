# -*- coding: utf-8 -*-
"""Pallas op tests (interpret mode on CPU; the compiled path is exercised
on TPU hardware by the benchmarks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from george_tpu import kernels
from george_tpu.ops import pallas_gram, xla_gram


@pytest.mark.parametrize(
    "kernel",
    [
        1.2 * kernels.ExpSquaredKernel(2.0, ndim=2)
        + 0.3 * kernels.Matern32Kernel(1.0, ndim=2),
        kernels.ExpSine2Kernel(gamma=2.0, log_period=0.3),
        kernels.ExpSquaredKernel([1.0, 2.0], ndim=2),
        kernels.ExpSquaredKernel(1.0, block=[(-2.0, 2.0)]),
        kernels.RationalQuadraticKernel(log_alpha=0.3, metric=1.5),
    ],
)
def test_pallas_gram_matches_xla(kernel):
    pair = kernel.pair_fn
    rng = np.random.default_rng(0)
    d = kernel.ndim
    x1 = jnp.asarray(rng.uniform(-4, 5, (300, d)))
    x2 = jnp.asarray(rng.uniform(-4, 5, (200, d)))
    th = jnp.asarray(kernel.parameter_vector)
    A = xla_gram(pair, th, x1, x2)
    B = pallas_gram(pair, th, x1, x2, tile_m=128, tile_n=128,
                    interpret=True)
    assert np.allclose(np.asarray(A), np.asarray(B), atol=1e-12)


def test_pallas_gram_ragged_sizes():
    """Non-tile-multiple shapes are padded and cropped correctly."""
    kernel = 1.0 * kernels.ExpSquaredKernel(1.0)
    pair = kernel.pair_fn
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.uniform(0, 5, (131, 1)))
    x2 = jnp.asarray(rng.uniform(0, 5, (77, 1)))
    th = jnp.asarray(kernel.parameter_vector)
    A = xla_gram(pair, th, x1, x2)
    B = pallas_gram(pair, th, x1, x2, tile_m=64, tile_n=64,
                    interpret=True)
    assert B.shape == (131, 77)
    assert np.allclose(np.asarray(A), np.asarray(B), atol=1e-12)
