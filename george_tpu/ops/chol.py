# -*- coding: utf-8 -*-
"""Pallas batched Cholesky for the hierarchical solver's leaf boxes.

XLA's TPU Cholesky expansion steps column-by-column through HLO loops
with dynamic slices; on a (512, 256, 256) f32 batch that costs ~15 ms on
a v5e — two orders of magnitude off the MXU roofline and the single
largest op in the HODLR factorization (the reference's hot loop is the
same leaf LLT, ``hodlr.h:303-358``). This kernel keeps a tile of blocks
resident in VMEM and runs the right-looking update fully vectorized over
the batch *and* the trailing submatrix: the per-step work is one fused
(bt, m, m) outer-product update, so the sequential chain is m cheap VPU
steps instead of m HLO loop iterations over HBM.

Forward-only by design: reverse-mode differentiation routes through a
``jax.custom_vjp`` wrapper (``cholesky`` below) whose backward pass uses
the standard Cholesky pullback built from XLA triangular solves — the
backward is only needed by the exact-gradient path, while the large-N
Hutchinson path (forward + jvp) never differentiates through the
factorization.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["cholesky", "pallas_cholesky"]


def _chol_kernel(a_ref, lt_ref, a_scratch, *, m):
    """Factor a VMEM-resident tile of SPD blocks; writes ``L^T``.

    Right-looking, one step per column, with every per-step op expressed
    on *rows* (the sublane dimension, where Mosaic supports dynamic
    indexing): the Schur complement stays symmetric, so row k IS column
    k. The trailing update is a broadcasted outer product over the whole
    (bt, m, m) tile — lrow is zeroed left of k, so it only touches the
    trailing submatrix."""
    import jax.experimental.pallas as pl

    a_scratch[:] = a_ref[:]
    bt = a_ref.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    tiny = jnp.asarray(1e-30, a_ref.dtype)

    def step(k, _):
        row = a_scratch[:, pl.ds(k, 1), :]                  # (bt, 1, m)
        dkk = jnp.sum(
            jnp.where(col_ids == k, row, 0.0), axis=2, keepdims=True
        )                                                   # (bt, 1, 1)
        inv = jax.lax.rsqrt(jnp.maximum(dkk, tiny))
        lrow = jnp.where(col_ids >= k, row * inv, 0.0)      # (bt, 1, m)
        lt_ref[:, pl.ds(k, 1), :] = lrow
        a_scratch[:] = a_scratch[:] - jnp.swapaxes(lrow, 1, 2) * lrow
        return 0

    jax.lax.fori_loop(0, m, step, 0)


@functools.partial(jax.jit, static_argnames=("block_tile", "interpret"))
def pallas_cholesky(A, block_tile=8, interpret=False):
    """Batched lower Cholesky of SPD ``A`` ``(B, m, m)`` via Pallas.

    ``block_tile`` blocks are factored per grid step; VMEM use is
    ``2 * block_tile * m * m * 4`` bytes (keep under ~8 MB).
    """
    from jax.experimental import pallas as pl

    B, m, _ = A.shape
    bt = min(block_tile, B)
    while B % bt:
        bt -= 1
    from jax.experimental.pallas import tpu as pltpu

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    Lt = pl.pallas_call(
        functools.partial(_chol_kernel, m=m),
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        grid=(B // bt,),
        in_specs=[pl.BlockSpec((bt, m, m), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bt, m, m), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((bt, m, m), A.dtype)],
        interpret=interpret,
        **kwargs,
    )(A)
    return jnp.swapaxes(Lt, -1, -2)


def _chol_panel_kernel(a_ref, lt_ref, s_scratch, *, m, nb):
    """Panel-blocked right-looking Cholesky on a VMEM tile; writes L^T.

    ``m`` sequential steps total (one per column); each step reads pivot
    row ``k`` of the symmetric Schur complement (a dynamic *sublane*
    slice — the layout Mosaic indexes cheaply), scales it into row ``k``
    of ``L^T``, and rank-1-updates only the current panel's row band
    (static sublane range). The trailing row bands are updated once per
    panel with an MXU contraction over the panel's L^T rows."""
    bt = a_ref.shape[0]
    import jax.experimental.pallas as pl

    s_scratch[:] = a_ref[:]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    tiny = jnp.asarray(1e-30, a_ref.dtype)

    for k0 in range(0, m, nb):                        # static panel loop
        nb_t = min(nb, m - k0)                        # ragged tail panel

        def step(t, _, k0=k0, nb_t=nb_t):
            k = k0 + t
            row = s_scratch[:, pl.ds(k, 1), :]        # (bt, 1, m)
            dkk = jnp.sum(
                jnp.where(lane_ids == k, row, 0.0), axis=2, keepdims=True
            )
            inv = jax.lax.rsqrt(jnp.maximum(dkk, tiny))
            lrow = jnp.where(lane_ids >= k, row * inv, 0.0)  # (bt, 1, m)
            lt_ref[:, pl.ds(k, 1), :] = lrow
            # in-panel rank-1 update, restricted to the panel's rows:
            # the (bt, nb_t, 1) left factor is the panel-lane slice of
            # lrow, flipped into sublanes
            lcol_band = jnp.swapaxes(
                lrow[:, :, k0:k0 + nb_t], 1, 2
            )                                          # (bt, nb_t, 1)
            s_scratch[:, k0:k0 + nb_t, :] = (
                s_scratch[:, k0:k0 + nb_t, :] - lcol_band * lrow
            )
            return 0

        jax.lax.fori_loop(0, nb_t, step, 0)
        if k0 + nb < m:
            # one deferred MXU update for all rows below the panel:
            # S[i, j] -= sum_t Lt[t, i] Lt[t, j] over the panel's rows t
            # full-f32 precision is load-bearing: the default bf16 MXU
            # passes lose enough of the Schur update that near-singular
            # leaf boxes go indefinite (rsqrt -> inf)
            Lt_panel = lt_ref[:, k0:k0 + nb, :]        # (bt, nb, m)
            s_scratch[:, k0 + nb:, :] = (
                s_scratch[:, k0 + nb:, :]
                - jax.lax.dot_general(
                    Lt_panel[:, :, k0 + nb:], Lt_panel,
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=a_ref.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )


@functools.partial(
    jax.jit, static_argnames=("block_tile", "panel", "interpret")
)
def pallas_cholesky_blocked(A, block_tile=32, panel=32, interpret=False):
    """Panel-blocked batched Cholesky (see ``_chol_panel_kernel``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, m, _ = A.shape
    # sublane-align the panel grid: extend odd sizes with an identity
    # block (its Cholesky is the identity, so the real block is
    # untouched); unaligned tail panels fault the Mosaic kernel
    m_orig = m
    m_pad = -(-m // 32) * 32
    if m_pad != m:
        pad = m_pad - m
        A = jnp.pad(A, ((0, 0), (0, pad), (0, pad)))
        idx = jnp.arange(m, m_pad)
        A = A.at[:, idx, idx].set(1.0)
        m = m_pad
    bt = min(block_tile, B)
    while B % bt:
        bt -= 1
    nb = min(panel, m)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    Lt = pl.pallas_call(
        functools.partial(_chol_panel_kernel, m=m, nb=nb),
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        grid=(B // bt,),
        in_specs=[pl.BlockSpec((bt, m, m), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bt, m, m), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((bt, m, m), A.dtype)],
        interpret=interpret,
        **kwargs,
    )(A)
    L = jnp.swapaxes(Lt, -1, -2)
    if m_orig != m:
        L = L[:, :m_orig, :m_orig]
    return L


def _phi(X):
    """Lower-triangular with halved diagonal (the Cholesky pullback's
    projection)."""
    return jnp.tril(X) - 0.5 * jnp.diagonal(
        X, axis1=-2, axis2=-1
    )[..., None] * jnp.eye(X.shape[-1], dtype=X.dtype)


@jax.custom_vjp
def cholesky(A):
    """``jnp.linalg.cholesky`` drop-in: Pallas forward on TPU, XLA
    elsewhere; differentiable via the standard pullback."""
    return _chol_fwd_impl(A)


def _use_pallas(A):
    import os

    if os.environ.get("GEORGE_TPU_NO_PALLAS_CHOL") == "1":
        # diagnostic escape hatch: force XLA's expansion everywhere
        return False
    try:
        dev = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        dev = "cpu"
    # ragged panels handle any m; Mosaic lane-pads non-128-multiple
    # trailing dims internally. Below m=64 XLA's expansion is fine.
    return (
        dev not in ("cpu",)
        and A.ndim == 3
        and A.shape[-1] >= 64
        and A.dtype in (jnp.float32, jnp.bfloat16)
    )


def _auto_tile(B, m, budget_bytes=8 * 1024 * 1024):
    """Largest block tile dividing B whose scratch fits the VMEM budget
    (bigger tiles amortize the sequential per-column steps)."""
    bt = max(1, min(64, budget_bytes // max(m * m * 4, 1)))
    bt = min(bt, B)
    while B % bt:
        bt -= 1
    return bt


def _chol_fwd_impl(A):
    if _use_pallas(A):
        B, m, _ = A.shape
        return pallas_cholesky_blocked(
            A, block_tile=_auto_tile(B, m), panel=32
        )
    return jnp.linalg.cholesky(A)


def _chol_fwd(A):
    L = _chol_fwd_impl(A)
    return L, L


def _chol_bwd(L, Lbar):
    # standard Cholesky pullback: Abar = L^-T phi(L^T Lbar) L^-1, symmetrized
    def solve_LT(X):
        return jax.vmap(
            lambda l, xx: jax.scipy.linalg.solve_triangular(
                l, xx, lower=True, trans=1
            )
        )(L, X) if L.ndim == 3 else jax.scipy.linalg.solve_triangular(
            L, X, lower=True, trans=1
        )

    P = _phi(jnp.einsum("...ji,...jk->...ik", L, Lbar))
    S = solve_LT(jnp.swapaxes(solve_LT(jnp.swapaxes(P, -1, -2)), -1, -2))
    Abar = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    return (Abar,)


cholesky.defvjp(_chol_fwd, _chol_bwd)
