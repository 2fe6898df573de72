# -*- coding: utf-8 -*-
"""Tile-wise covariance assembly: centered matmul-trick distances.

The scalar-pair Pallas formulation (``assemble.py``) loses to XLA's
fusion because Mosaic vectorizes the per-element program with many live
tile temporaries. This module compiles *structure-aware* tile functions
instead: for stationary kernels the squared distance over a (TM, TN)
tile is

    r2 = ||a||^2_w + ||b||^2_w - 2 (A W) B^T,

one MXU matmul plus broadcasts — with the coordinates **centered per
tile** first. Centering is the accuracy trick the global matmul identity
lacks: for nearby points at large coordinates, ``a^2 + b^2 - 2ab``
cancels catastrophically in f32, but after subtracting the tile midpoint
the coordinates are O(tile span) and the identity is well conditioned.
A per-tile transformation like this is exactly what a hand-tiled kernel
can do and a global XLA graph cannot.

Supported: StationaryKernel subclasses (isotropic / axis-aligned /
general log-Cholesky metrics, no blocks), ConstantKernel, and Sum /
Product combinations thereof. ``tile_fn_for`` returns ``None`` for
anything else; callers fall back to the pair-function paths.

Measured on a v5e chip (n=8192, d=8, f32): this tiled Pallas kernel runs
at parity with XLA's fused pairwise path (~6 ms) — 20x faster than the
scalar-pair Pallas formulation. Accuracy note: the matmul identity loses
~eps * ||x||^2 of r2 resolution near the diagonal, which kernels with a
sqrt cusp (Matern family) amplify to ~1e-2 absolute in f32; the exact
difference formulation stays the default for the solvers, and this path
suits smooth kernels / throughput-bound cross-covariance evaluation.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["tile_fn_for", "pallas_gram_tiled", "xla_gram_tiled"]


def _metric_weight_fn(metric, nb):
    """Returns ``fn(theta_metric) -> W (d_axes, d_axes)`` for the inverse
    metric, plus the list of axes."""
    mtype = metric.metric_type
    axes = tuple(int(a) for a in metric.axes)
    naxes = len(axes)

    if mtype == 0:
        def weights(th):
            return jnp.exp(-th[0]) * jnp.eye(naxes, dtype=th.dtype)
    elif mtype == 1:
        def weights(th):
            return jnp.diag(jnp.exp(-th))
    elif mtype == 2:
        from ..metrics import unpack_cholesky

        def weights(th):
            L = unpack_cholesky(th, naxes)
            Linv = jax.scipy.linalg.solve_triangular(
                L, jnp.eye(naxes, dtype=th.dtype), lower=True
            )
            return Linv.T @ Linv
    else:  # pragma: no cover
        raise ValueError("unknown metric type")
    return weights, axes


def tile_fn_for(kernel):
    """Compile ``tile(theta, A, B) -> (TM, TN)`` for supported kernels,
    else ``None``. ``A``/``B`` are tile coordinate blocks (already
    centered by the caller)."""
    from ..kernels.base import StationaryKernel, Sum, Product

    if isinstance(kernel, (Sum, Product)):
        f1 = tile_fn_for(kernel.k1)
        f2 = tile_fn_for(kernel.k2)
        if f1 is None or f2 is None:
            return None
        n1 = kernel.k1.full_size
        op = jnp.add if isinstance(kernel, Sum) else jnp.multiply

        def tile(theta, A, B):
            return op(f1(theta[:n1], A, B), f2(theta[n1:], A, B))

        return tile

    # constant kernel: flat tile. Non-stationary kernels sum per axis
    # (reference template semantics) — hence the axis-count factor, the
    # same one scalar lifting divides out (kernels/base.py __mul__).
    if getattr(kernel, "kernel_type", -1) == 8:
        naxes = len(kernel.axes)

        def tile(theta, A, B):
            c = jnp.exp(theta[0]) * naxes
            return jnp.full((A.shape[0], B.shape[0]), c, dtype=A.dtype)

        return tile

    if isinstance(kernel, StationaryKernel) and not kernel.blocked:
        metric = kernel.models["metric"]
        weights, axes = _metric_weight_fn(metric, None)
        nb = len(kernel._base_param_names)
        consts = tuple(
            float(getattr(kernel, c)) for c in kernel._constant_names
        )
        value_fn = kernel._value_fn

        def pick(X):
            # static column slices — no constant index arrays (Pallas)
            if axes == tuple(range(X.shape[1])):
                return X
            return jnp.concatenate(
                [X[:, a:a + 1] for a in axes], axis=1
            )

        def tile(theta, A, B):
            base = tuple(theta[i] for i in range(nb))
            W = weights(theta[nb:]).astype(A.dtype)
            Aa = pick(A)
            Ba = pick(B)
            AW = Aa @ W
            sq_a = jnp.sum(AW * Aa, axis=1)
            sq_b = jnp.sum((Ba @ W) * Ba, axis=1)
            cross = jnp.dot(
                AW, Ba.T, preferred_element_type=A.dtype
            )
            r2 = jnp.maximum(
                sq_a[:, None] + sq_b[None, :] - 2.0 * cross, 0.0
            )
            return value_fn(r2, *base, *consts)

        return tile

    return None


def xla_gram_tiled(tile_fn, theta, x1, x2):
    """The tile function evaluated globally (centered once) — the XLA
    baseline for the same algorithm."""
    c = (jnp.mean(x1, axis=0) + jnp.mean(x2, axis=0)) * 0.5
    return tile_fn(theta, x1 - c, x2 - c)


@functools.partial(
    jax.jit, static_argnames=("tile_fn", "tile_m", "tile_n", "interpret")
)
def pallas_gram_tiled(tile_fn, theta, x1, x2, tile_m=256, tile_n=256,
                      interpret=False):
    """Tiled Pallas assembly with per-tile centering."""
    from jax.experimental import pallas as pl

    M, d = x1.shape
    N = x2.shape[0]
    Mp = -(-M // tile_m) * tile_m
    Np = -(-N // tile_n) * tile_n
    # pad with the last row so tile means stay in-range
    x1p = jnp.concatenate(
        [x1, jnp.broadcast_to(x1[-1:], (Mp - M, d))], axis=0
    )
    x2p = jnp.concatenate(
        [x2, jnp.broadcast_to(x2[-1:], (Np - N, d))], axis=0
    )

    def kernel(theta_ref, a_ref, b_ref, out_ref):
        A = a_ref[:]
        B = b_ref[:]
        c = 0.5 * (jnp.mean(A, axis=0) + jnp.mean(B, axis=0))
        out_ref[:] = tile_fn(theta_ref[:], A - c[None, :], B - c[None, :])

    kwargs = {}
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

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
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j)),
        interpret=interpret,
        **kwargs,
    )(theta, x1p, x2p)
    return out[:M, :N]
