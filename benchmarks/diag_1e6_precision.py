# -*- coding: utf-8 -*-
"""Bisect the N=1e6 f32 log-likelihood error between factor CONSTRUCTION
and factor APPLICATION (solve), on the CPU where f64 truth is available.

Variants (pivots fixed from an f64 ACA selection so only arithmetic
precision moves):

  f64/f64  — truth
  f64/f32  — f64-built factors cast to f32, f32 solve   (application err)
  f32/f64  — f32-built factors cast to f64, f64 solve   (construction err)
  f32/f32  — the on-chip configuration

Usage::

    GEORGE_TPU_BENCH_CPU=1 python benchmarks/diag_1e6_precision.py [n]
"""
import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as benchmod

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    kernel, x, y, yerr2, rank = benchmod._dataset("smooth", n, np.float64)

    from george_tpu.solvers.hodlr import (
        build_structure, select_aca_pivots, hodlr_factor, hodlr_solve,
    )

    st = build_structure(n, min_size=128, rank=12, seed=42, x_sorted=x)
    xpad = np.concatenate([x, np.repeat(x[-1:], st.n_pad - n, axis=0)])
    valid = np.zeros(st.n_pad, dtype=bool)
    valid[:n] = True
    select_aca_pivots(
        kernel.pair_fn, np.asarray(kernel.parameter_vector),
        xpad, valid, st,
    )
    diag_pad = np.ones(st.n_pad)
    diag_pad[:n] = yerr2
    r_pad = np.zeros(st.n_pad)
    r_pad[:n] = y
    theta = np.asarray(kernel.parameter_vector)

    def cast(tree, dt):
        return jax.tree.map(lambda a: jnp.asarray(a, dtype=dt), tree)

    def run(build_dt, solve_dt):
        t0 = time.time()
        thj = jnp.asarray(theta, dtype=build_dt)
        xj = jnp.asarray(xpad, dtype=build_dt)
        vj = jnp.asarray(valid)
        dj = jnp.asarray(diag_pad, dtype=build_dt)

        @jax.jit
        def build(th):
            return hodlr_factor(kernel.pair_fn, th, xj, vj, dj, st)

        factors, logdet = build(thj)
        factors = cast(factors, solve_dt)
        rj = jnp.asarray(r_pad, dtype=solve_dt)
        z = hodlr_solve(factors, st, rj)
        quad = float(jnp.dot(rj, z))
        ld = float(logdet)
        ll = -0.5 * (quad + ld + n * np.log(2 * np.pi))
        print(
            "build=%s solve=%s quad=%.4f logdet=%.4f ll=%.4f (%.0fs)"
            % (build_dt, solve_dt, quad, ld, ll, time.time() - t0),
            flush=True,
        )
        return quad, ld, ll

    for bdt, sdt in (
        ("float64", "float64"),
        ("float64", "float32"),
        ("float32", "float64"),
        ("float32", "float32"),
    ):
        run(bdt, sdt)


if __name__ == "__main__":
    main()
