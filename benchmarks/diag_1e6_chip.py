# -*- coding: utf-8 -*-
"""On-chip decomposition of the N=1e6 f32 log-likelihood error.

The bench anchor at N=1e6 fails (9.15e-3 relative) even with the
round-4 logdet trace correction in place. The CPU-f32 ladder
(``diag_logdet_levels.py``) showed the logdet bias lives in the SMW core
*entries* (T-factor contamination), but CPU f32 and TPU f32 round
differently (the chip was ~10x better on the factors-matvec parity), so
only an on-chip decomposition can say where the remaining error is:

  * quad (refined / unrefined) vs the f64 CPU truth component
  * logdet raw and trace-corrected (trE, trE2, gate rho2) vs truth
  * factors-operator vs fresh-assembly operator discrepancy
  * fresh-assembly residual of the refined solution

Mirrors ``bench.py``'s exact 1e6 configuration (min_size=128, rank=12,
ACA pivots, 8 probes, PRNGKey(0)).

Usage (TPU)::

    python benchmarks/diag_1e6_chip.py [n]
"""
import os
import sys
import time

import numpy as np


def main():
    import jax

    if os.environ.get("GEORGE_TPU_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as benchmod
    from george_tpu.solvers.hodlr import (
        build_structure, select_aca_pivots, hodlr_factor, hodlr_solve,
        hodlr_matvec, hodlr_matvec_factors,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dtype = np.float32
    kernel, x, y, yerr2, rank = benchmod._dataset("smooth", n, dtype)
    st = build_structure(n, min_size=128, rank=rank, seed=42, x_sorted=x)
    xpad = np.concatenate(
        [x, np.repeat(x[-1:], st.n_pad - n, axis=0)]
    ).astype(dtype)
    valid = np.zeros(st.n_pad, dtype=bool)
    valid[:n] = True
    select_aca_pivots(
        kernel.pair_fn, np.asarray(kernel.parameter_vector, dtype=dtype),
        xpad, valid, st,
    )
    diag_pad = np.ones(st.n_pad, dtype=dtype)
    diag_pad[:n] = yerr2
    r_pad = np.zeros(st.n_pad, dtype=dtype)
    r_pad[:n] = y

    pair = kernel.pair_fn
    xj, vj = jnp.asarray(xpad), jnp.asarray(valid)
    dj, rj = jnp.asarray(diag_pad), jnp.asarray(r_pad)
    theta = jnp.asarray(kernel.parameter_vector, dtype=dtype)
    key = jax.random.PRNGKey(0)
    P = 8

    t0 = time.time()
    factors, logdet = jax.jit(
        lambda th: hodlr_factor(pair, th, xj, vj, dj, st)
    )(theta)
    jax.block_until_ready(logdet)
    print("factor: logdet=%.4f  (%.0fs)" % (float(logdet), time.time() - t0),
          flush=True)

    probes = jax.random.rademacher(key, (st.n_pad, P), dtype=rj.dtype)
    probes = probes * vj[:, None]
    rhs = jnp.concatenate([rj[:, None], probes], axis=1)

    solve_j = jax.jit(lambda f, X: hodlr_solve(f, st, X))
    mvfact_j = jax.jit(lambda f, X: hodlr_matvec_factors(f, st, X))
    mvfresh_j = jax.jit(lambda th, X: hodlr_matvec(
        pair, th, xj, vj, dj, st, X, include_diag=True))

    t0 = time.time()
    sol0 = solve_j(factors, rhs)
    jax.block_until_ready(sol0)
    print("solve0 (%.0fs)" % (time.time() - t0), flush=True)
    quad0 = float(jnp.dot(rj, sol0[:, 0]))

    # residual against the FACTORS operator (what refinement targets)
    Kf_sol0 = mvfact_j(factors, sol0)
    R0 = rhs - Kf_sol0
    rho_fact = np.asarray(
        jnp.linalg.norm(R0, axis=0) / jnp.linalg.norm(rhs, axis=0)
    )
    trE = -float(jnp.mean(jnp.sum(probes * R0[:, 1:], axis=0)))
    rho2 = float(jnp.mean(
        jnp.sum(R0[:, 1:] ** 2, axis=0)
        / jnp.maximum(jnp.sum(probes ** 2, axis=0), 1.0)
    ))
    print("factors-op residuals |Kf z - b|/|b|: r=%.3e probes mean=%.3e"
          % (rho_fact[0], rho_fact[1:].mean()), flush=True)
    print("rho2=%.4e (gate %s)  trE=%.4f"
          % (rho2, "OPEN" if rho2 < 0.25 else "CLOSED", trE), flush=True)

    # residual against the FRESH operator (the real compressed kernel)
    t0 = time.time()
    Kfr_sol0 = mvfresh_j(theta, sol0)
    jax.block_until_ready(Kfr_sol0)
    print("fresh matvec (%.0fs)" % (time.time() - t0), flush=True)
    Rfr = rhs - Kfr_sol0
    rho_fresh = np.asarray(
        jnp.linalg.norm(Rfr, axis=0) / jnp.linalg.norm(rhs, axis=0)
    )
    # operator discrepancy on the solution columns
    op_disc = np.asarray(
        jnp.linalg.norm(Kf_sol0 - Kfr_sol0, axis=0)
        / jnp.linalg.norm(Kfr_sol0, axis=0)
    )
    print("fresh-op residuals: r=%.3e probes mean=%.3e"
          % (rho_fresh[0], rho_fresh[1:].mean()), flush=True)
    print("factors-vs-fresh operator discrepancy: r-col=%.3e probes=%.3e"
          % (op_disc[0], op_disc[1:].mean()), flush=True)

    # one refinement step (factors operator) + second-order trace term
    D = solve_j(factors, R0)
    KD = mvfact_j(factors, D)
    trE2 = float(jnp.mean(jnp.sum(probes * (R0 - KD)[:, 1:], axis=0)))
    w = jnp.sum(R0 * KD, axis=0) / jnp.maximum(
        jnp.sum(KD * KD, axis=0), jnp.finfo(rhs.dtype).tiny
    )
    sol1 = sol0 + w[None, :] * D
    quad1 = float(jnp.dot(rj, sol1[:, 0]))
    R1 = rhs - mvfact_j(factors, sol1)
    print("after 1 refine step (factors-op): residual r=%.3e  trE2=%.4f"
          % (float(jnp.linalg.norm(R1[:, 0]) / jnp.linalg.norm(rj)), trE2),
          flush=True)
    # and its residual against the fresh operator
    R1fr = rj[:, None] - mvfresh_j(theta, sol1[:, :1])
    print("refined solution vs fresh op: residual r=%.3e"
          % float(jnp.linalg.norm(R1fr[:, 0]) / jnp.linalg.norm(rj)),
          flush=True)

    ld_corr = float(logdet) + (trE - 0.5 * trE2 if rho2 < 0.25 else 0.0)
    cst = n * np.log(2 * np.pi)
    for tag, q, ld in (
        ("refine=0 raw  ", quad0, float(logdet)),
        ("refine=1 corr ", quad1, ld_corr),
    ):
        ll = -0.5 * (q + ld + cst)
        print("%s quad=%.4f logdet=%.4f ll=%.4f" % (tag, q, ld, ll),
              flush=True)
    print("truth ll=-217929.3465 (CPU f64); component truths from "
          "diag_1e6_truth if recorded", flush=True)


if __name__ == "__main__":
    main()
