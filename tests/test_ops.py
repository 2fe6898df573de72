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


def test_tiled_gram_matches_pairwise():
    """Structure-compiled tile functions (centered matmul-trick r2)
    reproduce the pairwise path to machine precision in f64."""
    from george_tpu.ops.tiled import (
        tile_fn_for, pallas_gram_tiled, xla_gram_tiled,
    )

    rng = np.random.default_rng(0)
    cases = [
        (1.2 * kernels.ExpSquaredKernel(25.0)
         + 0.3 * kernels.Matern32Kernel(8.0), 1),
        (1.0 * kernels.ExpSquaredKernel([1.0, 3.0], ndim=2), 2),
        (2.0 * kernels.Matern52Kernel(np.eye(2).tolist(), ndim=2), 2),
        (1.0 * kernels.RationalQuadraticKernel(
            log_alpha=0.2, metric=2.0), 1),
    ]
    for kernel, d in cases:
        tf = tile_fn_for(kernel)
        assert tf is not None
        th = jnp.asarray(kernel.parameter_vector)
        x1 = jnp.asarray(rng.uniform(100, 110, (300, d)))
        x2 = jnp.asarray(rng.uniform(100, 110, (200, d)))
        A = xla_gram(kernel.pair_fn, th, x1, x2)
        B = xla_gram_tiled(tf, th, x1, x2)
        C = pallas_gram_tiled(tf, th, x1, x2, tile_m=128, tile_n=128,
                              interpret=True)
        assert np.allclose(np.asarray(A), np.asarray(B), atol=1e-12)
        assert np.allclose(np.asarray(A), np.asarray(C), atol=1e-12)


def test_tiled_gram_unsupported_returns_none():
    from george_tpu.ops.tiled import tile_fn_for

    assert tile_fn_for(kernels.ExpSine2Kernel(
        gamma=1.0, log_period=0.0)) is None
    assert tile_fn_for(kernels.ExpSquaredKernel(
        1.0, block=[(-1.0, 1.0)])) is None
