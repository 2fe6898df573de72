# -*- coding: utf-8 -*-
"""Diagnose the N=1e6 truth-anchor failure: sweep skeleton rank on this
backend and report ll error vs the recorded CPU-f64 truth.

Usage::

    GEORGE_TPU_BENCH_CPU=1 python benchmarks/diag_1e6.py 12 24   # CPU f64
    python benchmarks/diag_1e6.py 12 24 48                       # on-chip
"""
import os
import sys
import time

import numpy as np

TRUTH = -217929.3465


def main():
    import jax

    if os.environ.get("GEORGE_TPU_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
        if os.environ.get("DIAG_F32") != "1":
            jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as benchmod

    n = 1_000_000
    use_f64 = jax.default_backend() == "cpu" and jax.config.jax_enable_x64
    dtype = np.float64 if use_f64 else np.float32
    kernel, x, y, yerr2, _ = benchmod._dataset("smooth", n, dtype)

    from george_tpu.solvers.hodlr import (
        build_structure, select_aca_pivots, hodlr_factor, hodlr_solve,
        hodlr_solve_refined,
    )
    refine = int(os.environ.get("DIAG_REFINE", "0"))

    ranks = [int(a) for a in sys.argv[1:]] or [12]
    for rank in ranks:
        st = build_structure(n, min_size=128, rank=rank, seed=42,
                             x_sorted=x)
        xpad = np.concatenate(
            [x, np.repeat(x[-1:], st.n_pad - n, axis=0)]).astype(dtype)
        valid = np.zeros(st.n_pad, dtype=bool)
        valid[:n] = True
        select_aca_pivots(
            kernel.pair_fn,
            np.asarray(kernel.parameter_vector, dtype=dtype),
            xpad, valid, st,
        )
        diag_pad = np.ones(st.n_pad, dtype=dtype)
        diag_pad[:n] = yerr2
        r_pad = np.zeros(st.n_pad, dtype=dtype)
        r_pad[:n] = y
        theta = jnp.asarray(kernel.parameter_vector, dtype=dtype)
        xj, vj, dj, rj = map(jnp.asarray, (xpad, valid, diag_pad, r_pad))

        @jax.jit
        def parts(th):
            factors, logdet = hodlr_factor(
                kernel.pair_fn, th, xj, vj, dj, st)
            if refine:
                z = hodlr_solve_refined(
                    kernel.pair_fn, th, xj, vj, dj, st, factors, rj,
                    steps=refine,
                )
            else:
                z = hodlr_solve(factors, st, rj)
            return jnp.dot(rj, z), logdet

        t0 = time.time()
        quad, logdet = map(float, parts(theta))
        dt = time.time() - t0
        ll = -0.5 * (quad + logdet + n * np.log(2.0 * np.pi))
        print(
            "backend=%s rank=%d ll=%.4f rel_err=%.3e quad=%.4f "
            "logdet=%.4f (compile+run %.1fs)"
            % (jax.default_backend(), rank, ll,
               abs(ll - TRUTH) / abs(TRUTH), quad, logdet, dt),
            flush=True,
        )


if __name__ == "__main__":
    main()
