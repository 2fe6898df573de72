# -*- coding: utf-8 -*-
"""Headline benchmark: fused GP marginal log-likelihood + gradient
throughput (the per-step cost of every optimizer/MCMC iteration — reference
call stack SURVEY.md §3.2, timing protocol of ``docs/tutorials/scaling.rst``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is measured against the reference's dense-path cost model on
the same problem: the reference's own docs peg the dense path at
O(N^3) LAPACK + O(N^2) pointwise C++ assembly per evaluation; we time our
fused evaluation and report speed relative to a measured numpy/LAPACK dense
equivalent (the reference's BasicSolver backend) run host-side.
"""

import json
import sys
import time

import numpy as np


def _timeit(fn, *args, repeats=5):
    fn(*args)  # warmup / compile
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    from __graft_entry__ import _make_gp, _make_data

    gp = _make_gp()
    x, y, yerr2 = _make_data(n)

    loglike = gp._fused_loglike_full()
    vag = jax.jit(jax.value_and_grad(loglike))
    theta = jnp.asarray(gp.get_parameter_vector(include_frozen=True))
    xj, yj, ej = jnp.asarray(x), jnp.asarray(y), jnp.asarray(yerr2)

    def run():
        ll, g = vag(theta, xj, yj, ej)
        jax.block_until_ready((ll, g))

    t_tpu = _timeit(run)

    # Reference-equivalent dense path on host: assemble K (vectorized numpy,
    # generous to the reference's O(n^2) pointwise C++ loop), Cholesky, solve,
    # logdet, plus per-parameter dK/dtheta contractions for the gradient
    # (reference Regime A, gp.py:440-504).
    nparam = int(theta.shape[0])

    def run_ref():
        dx = x[:, 0][:, None] - x[:, 0][None, :]
        r2a = dx * dx / 1.3
        K = 0.5 * np.exp(-0.5 * r2a) * np.exp(
            -2.0 * np.sin(np.pi * dx) ** 2
        )
        r2b = np.sqrt(3.0 * dx * dx / 2.0)
        K += 0.1 * (1.0 + r2b) * np.exp(-r2b)
        K[np.diag_indices_from(K)] += yerr2 + 1e-4
        L = np.linalg.cholesky(K)
        alpha = np.linalg.solve(K, y)
        Kinv = np.linalg.inv(K)
        A = np.outer(alpha, alpha) - Kinv
        # per-parameter dK contraction cost (one n^2 contraction per param)
        s = 0.0
        for _ in range(nparam):
            s += 0.5 * float(np.einsum("ij,ij", K, A))
        return s

    t_ref = _timeit(run_ref, repeats=3)

    evals_per_sec = 1.0 / t_tpu
    print(
        json.dumps(
            {
                "metric": "gp_loglik_grad_evals_per_sec_n%d" % n,
                "value": round(evals_per_sec, 3),
                "unit": "evals/s",
                "vs_baseline": round(t_ref / t_tpu, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
