# -*- coding: utf-8 -*-
"""Decompose the N=1e6 smooth-bench log-likelihood into parts, on chip
or on CPU (f32/f64): raw logdet, gated-correction terms (trE, trE2,
rho2), corrected logdet, refined quadratic form.

Round-5 context: the min_size=256 on-chip anchor sits at ~5.0e-3 while
the CPU-f32 predictor for the same config measures 4.0e-4 — this
pinpoints which half moved and whether the logdet-correction gate is
engaging on-chip.

Usage::

    python benchmarks/diag_1e6_parts.py [n] [min_size]       # on-chip
    GEORGE_TPU_BENCH_CPU=1 [GEORGE_TPU_X64=1] python ...     # CPU
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("GEORGE_TPU_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
        if os.environ.get("GEORGE_TPU_X64") == "1":
            jax.config.update("jax_enable_x64", True)
    from george_tpu.utils import expose_host_cpu
    expose_host_cpu()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import bench as benchmod
    from george_tpu.solvers.hodlr import (
        build_structure, select_aca_pivots, hodlr_factor, _solve_t,
        _matvec_factors_t, hodlr_solve, hodlr_matvec_factors,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    min_size = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    use_f64 = jax.config.jax_enable_x64
    dtype = np.float64 if use_f64 else np.float32
    kernel, x, y, yerr2, rank = benchmod._dataset("smooth", n, dtype)
    st = build_structure(n, min_size=min_size, rank=rank, seed=42,
                         x_sorted=x)
    layout = os.environ.get("GEORGE_TPU_LAYOUT")
    if layout == "row":
        st.transposed = False
    elif layout == "t":
        st.transposed = True
    if os.environ.get("GEORGE_TPU_NO_GROUPING") == "1":
        import george_tpu.solvers.hodlr as _h
        _h._ANCESTOR_UPDATE_BYTES = 1 << 60
    xpad = np.concatenate([x, np.repeat(x[-1:], st.n_pad - n, axis=0)]
                          ).astype(dtype)
    valid = np.zeros(st.n_pad, dtype=bool)
    valid[:n] = True
    piv_npz = os.environ.get("GEORGE_TPU_PIVOTS_NPZ")
    if piv_npz and os.path.exists(piv_npz):
        # transplant pivots selected by another backend (attribution:
        # does on-chip ACA pivot arithmetic pick worse skeletons?)
        data = np.load(piv_npz)
        for li, lev in enumerate(st.levels):
            lev["row_piv"] = data["row_%d" % li]
            lev["col_piv"] = data["col_%d" % li]
        st._build_flat()
        print("# loaded pivots from", piv_npz, file=sys.stderr)
    else:
        select_aca_pivots(kernel.pair_fn,
                          np.asarray(kernel.parameter_vector,
                                     dtype=dtype),
                          xpad, valid, st)
        if piv_npz:
            np.savez(piv_npz, **{
                "row_%d" % li: lev["row_piv"]
                for li, lev in enumerate(st.levels)
            }, **{
                "col_%d" % li: lev["col_piv"]
                for li, lev in enumerate(st.levels)
            })
            print("# saved pivots to", piv_npz, file=sys.stderr)
    diag_pad = np.ones(st.n_pad, dtype=dtype)
    diag_pad[:n] = yerr2
    r_pad = np.zeros(st.n_pad, dtype=dtype)
    r_pad[:n] = y
    pair = kernel.pair_fn
    xj, vj, dj, rj = map(jnp.asarray, (xpad, valid, diag_pad, r_pad))
    theta = jnp.asarray(kernel.parameter_vector, dtype=dtype)
    key = jax.random.PRNGKey(0)

    fac_jit = jax.jit(
        lambda th, x_, v_, d_: hodlr_factor(pair, th, x_, v_, d_, st))

    def parts_fn(th, x_, v_, d_, r_, key_, factors, logdet):
        num_probes = 8
        probes = jax.random.rademacher(
            key_, (num_probes, st.n_pad), dtype=r_.dtype) * v_[None, :]
        rhs = jnp.concatenate([r_[None, :], probes], axis=0)
        if st.transposed:
            slv = lambda V: _solve_t(factors, st, V)      # noqa: E731
            mvf = lambda V: _matvec_factors_t(            # noqa: E731
                factors, st, V)
        else:
            slv = lambda V: hodlr_solve(factors, st, V.T).T  # noqa: E731
            mvf = lambda V: hodlr_matvec_factors(            # noqa: E731
                factors, st, V.T).T
        sol0 = slv(rhs)
        R0 = rhs - mvf(sol0)
        trE = -jnp.mean(jnp.sum(probes * R0[1:], axis=1))
        rho2 = jnp.mean(jnp.sum(R0[1:] ** 2, axis=1)
                        / jnp.maximum(jnp.sum(probes ** 2, axis=1), 1.0))
        D = slv(R0)
        KD = mvf(D)
        trE2 = jnp.mean(jnp.sum(probes * (R0 - KD)[1:], axis=1))
        w = jnp.sum(R0 * KD, axis=1) / jnp.maximum(
            jnp.sum(KD * KD, axis=1), jnp.finfo(rhs.dtype).tiny)
        sol = sol0 + w[:, None] * D
        quad0 = jnp.dot(r_, sol0[0])
        quad1 = jnp.dot(r_, sol[0])
        ld_corr = logdet + jnp.where(rho2 < 0.25, trE - 0.5 * trE2, 0.0)
        return (quad0, quad1, logdet, ld_corr, trE, trE2, rho2)

    parts_jit = jax.jit(parts_fn)
    fac = fac_jit(theta, xj, vj, dj)
    out_v = parts_jit(theta, xj, vj, dj, rj, key, fac[0], fac[1])
    names = ["quad0", "quad1", "logdet_raw", "logdet_corr", "trE",
             "trE2", "rho2"]
    rec = {k: float(v) for k, v in zip(names, out_v)}
    rec.update({"backend": jax.default_backend(), "x64": bool(use_f64),
                "n": n, "min_size": min_size, "L": st.L})
    rec["ll_corr"] = -0.5 * (rec["quad1"] + rec["logdet_corr"]
                             + n * float(np.log(2 * np.pi)))
    rec["ll_raw"] = -0.5 * (rec["quad0"] + rec["logdet_raw"]
                            + n * float(np.log(2 * np.pi)))
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
