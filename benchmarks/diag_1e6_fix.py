# -*- coding: utf-8 -*-
"""Validate the round-4 N=1e6 f32 fix on the CPU against the f64 truth.

The on-chip N=1e6 bench FAILED its 5e-3 anchor (9.1e-3 relative) with
quad-only refinement: the f32 BUILD biases the logdet by ~-1.17e3 nats
(per-level decomposition: ``diag_logdet_levels.py``). The fix is a
first-order trace correction of the computed logdet from the refinement
residuals (see ``hodlr_loglike_and_grad_hutchinson``), plus
assembly-free refinement matvecs (``hodlr_matvec_factors``).

This harness runs the f32 path end-to-end on the CPU and reports the
log-likelihood error against the recorded f64 truth for:

  refine=0      the raw f32 cascade (expected ~1e-2 off)
  refine=1      refinement + logdet trace correction (the fix)

Usage::

    GEORGE_TPU_BENCH_CPU=1 python benchmarks/diag_1e6_fix.py [n]
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
    from george_tpu.solvers.hodlr import (
        build_structure, select_aca_pivots,
        hodlr_loglike_and_grad_hutchinson,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    truth = {100_000: -23484.7706, 1_000_000: -217929.3465}.get(n)
    kernel, x, y, yerr2, rank = benchmod._dataset("smooth", n, np.float32)

    st = build_structure(n, min_size=128, rank=rank, seed=42, x_sorted=x)
    xpad64 = np.concatenate([x, np.repeat(x[-1:], st.n_pad - n, axis=0)])
    valid = np.zeros(st.n_pad, dtype=bool)
    valid[:n] = True
    # f64 pivots (theta-independent of arithmetic precision concerns)
    select_aca_pivots(
        kernel.pair_fn, np.asarray(kernel.parameter_vector),
        xpad64, valid, st,
    )
    diag_pad = np.ones(st.n_pad)
    diag_pad[:n] = yerr2
    r_pad = np.zeros(st.n_pad)
    r_pad[:n] = y

    pair = kernel.pair_fn
    for refine in (0, 1):
        dt = jnp.float32
        th = jnp.asarray(kernel.parameter_vector, dtype=dt)
        xj = jnp.asarray(xpad64, dtype=dt)
        vj = jnp.asarray(valid)
        dj = jnp.asarray(diag_pad, dtype=dt)
        rj = jnp.asarray(r_pad, dtype=dt)
        key = jax.random.PRNGKey(0)

        @jax.jit
        def vag(t):
            return hodlr_loglike_and_grad_hutchinson(
                pair, t, xj, vj, dj, rj, st, key,
                num_probes=8, n_real=n, refine_steps=refine,
            )

        t0 = time.time()
        ll, g = vag(th)
        ll = float(ll)
        dtime = time.time() - t0
        rel = abs(ll - truth) / abs(truth) if truth else float("nan")
        print(
            "refine=%d  ll=%.4f  rel_err=%.3e  (truth %.4f)  [%.0fs]"
            % (refine, ll, rel, truth or float("nan"), dtime),
            flush=True,
        )
        print("  grad[:4] =", np.asarray(g)[:4], flush=True)


if __name__ == "__main__":
    main()
