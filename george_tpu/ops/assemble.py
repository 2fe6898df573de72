# -*- coding: utf-8 -*-
"""Pallas TPU kernels for covariance-matrix assembly.

The hot loop of every GP operation is pairwise kernel evaluation — the
reference spends it in pointwise virtual C++ calls
(``kernel_interface.cpp:72-87``). The XLA path (vmapped pair functions)
is already fused and fast; this module provides the explicitly tiled
Pallas version of the same computation for the cases where hand tiling
wins: large blocks, high input dimension (no materialized ``(n, m, d)``
difference tensors — each (TM, TN) tile is computed entirely in VMEM),
and fusion with downstream consumers.

``gram(pair_fn, theta, x1, x2)`` dispatches to the Pallas kernel on TPU
(square-tiled grid, f32 accumulation) and to the vmapped XLA path
elsewhere; both produce identical values.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["gram", "pallas_gram", "xla_gram"]


def xla_gram(pair_fn, theta, x1, x2):
    """Reference XLA path: ``K[i, j] = pair_fn(theta, x1[i], x2[j])``."""
    return jax.vmap(
        lambda a: jax.vmap(lambda b: pair_fn(theta, a, b))(x2)
    )(x1)


@functools.partial(
    jax.jit, static_argnames=("pair_fn", "tile_m", "tile_n", "interpret")
)
def pallas_gram(pair_fn, theta, x1, x2, tile_m=128, tile_n=128,
                interpret=False):
    """Tiled Pallas assembly. ``x1`` (M, d), ``x2`` (N, d) -> (M, N).

    Each grid step evaluates one (tile_m, tile_n) tile fully in VMEM:
    coordinates stream in as row/column tiles, the pair function is
    evaluated as a broadcast expression on the VPU, and the tile is
    written once — no (M, N, d) intermediates in HBM.
    """
    from jax.experimental import pallas as pl

    M, d = x1.shape
    N = x2.shape[0]
    Mp = -(-M // tile_m) * tile_m
    Np = -(-N // tile_n) * tile_n
    x1p = jnp.pad(x1, ((0, Mp - M), (0, 0)))
    x2p = jnp.pad(x2, ((0, Np - N), (0, 0)))

    # Kernel pair functions close over constants (metric axis index
    # arrays, block bounds); Pallas kernels cannot capture tracers or
    # constants, so hoist them into explicit inputs.
    converted, consts = jax.closure_convert(
        lambda th, a, b: pair_fn(th, a, b), theta, x1p[0], x2p[0]
    )

    def kernel(theta_ref, a_ref, b_ref, *rest):
        out_ref = rest[-1]
        const_refs = [r[:] for r in rest[:-1]]
        a = a_ref[:]                     # (tile_m, d)
        b = b_ref[:]                     # (tile_n, d)
        th = theta_ref[:]
        out_ref[:] = jax.vmap(
            lambda ai: jax.vmap(
                lambda bj: converted(th, ai, bj, *const_refs)
            )(b)
        )(a)

    const_specs = [
        pl.BlockSpec(np.shape(cst), lambda i, j: (0,) * np.ndim(cst))
        for cst in consts
    ]
    kwargs = {}
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        # composite kernels keep many live tile temporaries; raise the
        # scoped-VMEM ceiling above the 16 MB default
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x1.dtype),
        grid=(Mp // tile_m, Np // tile_n),
        in_specs=[
            pl.BlockSpec((theta.shape[0],), lambda i, j: (0,)),
            pl.BlockSpec((tile_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, d), lambda i, j: (j, 0)),
        ] + const_specs,
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j)),
        interpret=interpret,
        **kwargs,
    )(theta, x1p, x2p, *consts)
    return out[:M, :N]


def gram(pair_fn, theta, x1, x2, tile=128, force_pallas=False):
    """Covariance block assembly.

    Measured head-to-head on a v5e chip (n=8192): XLA's fused vmapped
    path runs at ~5 ms for d=8 while this Pallas formulation (scalar pair
    function vectorized by Mosaic) takes ~120 ms — Mosaic keeps many live
    tile temporaries and the coordinate layout wastes lanes. The XLA path
    is therefore the default; the Pallas kernel stays as the verified
    scaffold for a tile-wise reformulation (coordinates in (d, tile)
    layout, kernel expression written on whole tiles).
    """
    if force_pallas:
        return pallas_gram(pair_fn, theta, x1, x2,
                           tile_m=tile, tile_n=tile)
    return xla_gram(pair_fn, theta, x1, x2)
