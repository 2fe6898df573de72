# -*- coding: utf-8 -*-
"""Pallas op tests (interpret mode on CPU; the compiled path is exercised
on TPU hardware by the benchmarks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from george_tpu import kernels


def _spd_batch(rng, B, m, dtype=np.float32, near_singular=False):
    """Random SPD blocks shaped like the solver's leaf boxes."""
    X = rng.standard_normal((B, m, 3 * m))
    A = np.einsum("bik,bjk->bij", X, X) / (3 * m)
    jitter = 1e-4 if near_singular else 1.0
    A += jitter * np.eye(m)[None]
    return A.astype(dtype)


@pytest.mark.parametrize("B,m", [(8, 128), (6, 196), (16, 64), (4, 256)])
def test_pallas_cholesky_blocked_matches_xla(B, m):
    """Panel kernel (interpret mode) vs XLA, incl. ragged m needing the
    identity-extension sublane padding (m=196)."""
    from george_tpu.ops.chol import pallas_cholesky_blocked

    rng = np.random.default_rng(3)
    A = jnp.asarray(_spd_batch(rng, B, m))
    L_ref = np.asarray(jnp.linalg.cholesky(A))
    L = np.asarray(pallas_cholesky_blocked(A, block_tile=4, interpret=True))
    scale = np.abs(L_ref).max()
    assert np.allclose(L, L_ref, atol=3e-5 * scale)
    # strictly lower-triangular output (upper zeroed)
    assert np.allclose(L, np.tril(L), atol=0)


def test_pallas_cholesky_simple_kernel_matches_xla():
    from george_tpu.ops.chol import pallas_cholesky

    rng = np.random.default_rng(4)
    A = jnp.asarray(_spd_batch(rng, 8, 128))
    L_ref = np.asarray(jnp.linalg.cholesky(A))
    L = np.asarray(pallas_cholesky(A, block_tile=4, interpret=True))
    assert np.allclose(L, L_ref, atol=3e-5 * np.abs(L_ref).max())


def test_pallas_cholesky_blocked_near_singular():
    """Small-jitter leaves must stay finite (the f32 regime the
    full-precision Schur update protects)."""
    from george_tpu.ops.chol import pallas_cholesky_blocked

    rng = np.random.default_rng(5)
    A = jnp.asarray(_spd_batch(rng, 4, 128, near_singular=True))
    L = np.asarray(pallas_cholesky_blocked(A, block_tile=4, interpret=True))
    assert np.isfinite(L).all()
    rec = np.einsum("bik,bjk->bij", L, L)
    assert np.allclose(rec, np.asarray(A), atol=5e-4)


def test_cholesky_wrapper_grad_matches_xla():
    """custom_vjp backward of ops.chol.cholesky == autodiff through
    jnp.linalg.cholesky."""
    from george_tpu.ops.chol import cholesky

    rng = np.random.default_rng(6)
    A = jnp.asarray(_spd_batch(rng, 3, 32, dtype=np.float64))

    def loss_ours(M):
        L = cholesky(M)
        return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1))) + (
            0.01 * jnp.sum(L**2)
        )

    def loss_xla(M):
        L = jnp.linalg.cholesky(M)
        return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1))) + (
            0.01 * jnp.sum(L**2)
        )

    g1 = np.asarray(jax.grad(loss_ours)(A))
    g2 = np.asarray(jax.grad(loss_xla)(A))
    assert np.allclose(g1, g2, atol=1e-9)


def test_pallas_dia_matvec_interpret():
    """Pallas DIA matvec (interpret mode) matches the XLA shifted-slice
    formulation to machine precision, for vector and multi-RHS, with
    ragged final row blocks."""
    from george_tpu.ops.dia import dia_matvec_pallas
    from george_tpu.solvers.sparse import dia_apply

    rng = np.random.default_rng(0)
    n, D = 700, 11
    offsets = tuple(range(-5, 6))
    vals = rng.standard_normal((n, D))
    for j, d in enumerate(offsets):
        idx = np.arange(n) + d
        vals[(idx < 0) | (idx >= n), j] = 0.0
    diag = rng.uniform(1, 2, n)
    valsj, diagj = jnp.asarray(vals), jnp.asarray(diag)

    for rhs_shape in ((n,), (n, 4)):
        y = jnp.asarray(rng.standard_normal(rhs_shape))
        ref = np.asarray(dia_apply(valsj, np.asarray(offsets), diagj, y))
        out = np.asarray(dia_matvec_pallas(
            valsj, offsets, diagj, y, block_rows=256, interpret=True
        ))
        assert np.allclose(ref, out, rtol=1e-12, atol=1e-12)


def test_ds_inv_logdet_matches_f64():
    """Double-single Gauss-Jordan (``ops/ds.py``) matches the f64
    reference on batches of small ill-conditioned matrices — the SMW
    core shapes/conditions it exists for (kappa up to 1e7 measured at
    N=1e6, ``hodlr._core_inv_slogdet``)."""
    from george_tpu.ops.ds import ds_inv_logdet, ds_inv_logdet_ref

    rng = np.random.default_rng(3)
    for m, kappa in ((24, 1e7), (48, 1e5), (6, 1e2)):
        p = 32
        U, _ = np.linalg.qr(rng.standard_normal((p, m, m)))
        V, _ = np.linalg.qr(rng.standard_normal((p, m, m)))
        s = np.logspace(0, -np.log10(kappa), m)
        A = (U * s[None, None, :] @ np.swapaxes(V, -1, -2)).astype(
            np.float32
        )
        inv_ds, ld_ds, sg_ds = jax.jit(ds_inv_logdet)(jnp.asarray(A))
        inv64, ld64, sg64 = ds_inv_logdet_ref(A)
        scale = np.abs(inv64).max(axis=(-2, -1), keepdims=True)
        assert np.max(np.abs(np.asarray(inv_ds) - inv64) / scale) < 1e-5
        assert np.max(np.abs(np.asarray(ld_ds) - ld64)) < 1e-3
        assert np.all(np.asarray(sg_ds) == sg64)


def test_ds_core_path_parity_small():
    """Forcing the DS core path (GEORGE_TPU_CORE_DS=1) through a full
    f32 HODLR factorization reproduces the plain-f32 log-likelihood on a
    shallow tree — the gate flips implementation, not semantics."""
    import os

    from george_tpu import kernels as K
    from george_tpu.solvers.hodlr import (
        build_structure, hodlr_factor, hodlr_solve,
    )

    rng = np.random.default_rng(11)
    n = 600
    x = np.sort(rng.uniform(0, 40, n))[:, None].astype(np.float32)
    kernel = 1.1 * K.ExpSquaredKernel(2.0)
    theta = jnp.asarray(kernel.parameter_vector, dtype=jnp.float32)
    st = build_structure(n, min_size=64, rank=16, seed=42, x_sorted=x)
    xpad = np.concatenate([x, np.repeat(x[-1:], st.n_pad - n, axis=0)])
    valid = np.zeros(st.n_pad, bool)
    valid[:n] = True
    dp = np.ones(st.n_pad, np.float32)
    rp = rng.standard_normal(st.n_pad).astype(np.float32)
    args = (kernel.pair_fn, theta, jnp.asarray(xpad, jnp.float32),
            jnp.asarray(valid), jnp.asarray(dp), st)

    def ll():
        f, ld = hodlr_factor(*args)
        z = hodlr_solve(f, st, jnp.asarray(rp))
        return float(jnp.dot(jnp.asarray(rp), z)), float(ld)

    os.environ.pop("GEORGE_TPU_CORE_DS", None)
    q0, ld0 = ll()
    os.environ["GEORGE_TPU_CORE_DS"] = "1"
    try:
        q1, ld1 = ll()
    finally:
        del os.environ["GEORGE_TPU_CORE_DS"]
    assert abs(q1 - q0) / abs(q0) < 1e-4
    assert abs(ld1 - ld0) / max(abs(ld0), 1.0) < 1e-4
