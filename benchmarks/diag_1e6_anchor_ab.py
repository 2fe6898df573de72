# -*- coding: utf-8 -*-
"""On-chip A/B of the N=1e6 anchor levers (round-5: the shipping
min_size=256 config sits at ~5.0e-3 against a 5e-3 anchor — knife-edge).

Factors once per (ds,) setting, then measures the log-likelihood error
against the CPU-f64 truth for each (refine_steps, num_probes) rest
configuration, plus the DS-core build (VERDICT round-4 #6: one banked
on-chip A/B for ops/ds.py at depth).

Usage::

    python benchmarks/diag_1e6_anchor_ab.py [n] [min_size]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from george_tpu.utils import expose_host_cpu
    expose_host_cpu()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    min_size = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import bench as benchmod
    from george_tpu.solvers.hodlr import (
        build_structure, select_aca_pivots, hodlr_factor,
        hodlr_loglike_and_grad_hutchinson,
    )

    truth, tol = benchmod._TRUTH[("smooth", n)]
    dtype = np.float32
    kernel, x, y, yerr2, rank = benchmod._dataset("smooth", n, dtype)
    st = build_structure(n, min_size=min_size, rank=rank, seed=42,
                         x_sorted=x)
    xpad = np.concatenate([x, np.repeat(x[-1:], st.n_pad - n, axis=0)]
                          ).astype(dtype)
    valid = np.zeros(st.n_pad, dtype=bool)
    valid[:n] = True
    select_aca_pivots(kernel.pair_fn,
                      np.asarray(kernel.parameter_vector, dtype=dtype),
                      xpad, valid, st)
    diag_pad = np.ones(st.n_pad, dtype=dtype)
    diag_pad[:n] = yerr2
    r_pad = np.zeros(st.n_pad, dtype=dtype)
    r_pad[:n] = y
    pair = kernel.pair_fn
    xj, vj, dj, rj = map(jnp.asarray, (xpad, valid, diag_pad, r_pad))
    theta = jnp.asarray(kernel.parameter_vector, dtype=dtype)
    key = jax.random.PRNGKey(0)

    def rest_fn(th, x_, v_, d_, r_, key_, factors, logdet, probes,
                refine):
        return hodlr_loglike_and_grad_hutchinson(
            pair, th, x_, v_, d_, r_, st, key_,
            num_probes=probes, n_real=n, refine_steps=refine,
            factors_logdet=(factors, logdet),
        )

    rest_jit = jax.jit(rest_fn, static_argnums=(8, 9))

    for ds in (None, "1"):
        os.environ.pop("GEORGE_TPU_CORE_DS", None)
        if ds is not None:
            os.environ["GEORGE_TPU_CORE_DS"] = ds
        # fresh jit per env setting: _core_inv_slogdet reads it at trace
        fac_jit = jax.jit(
            lambda th, x_, v_, d_: hodlr_factor(pair, th, x_, v_, d_,
                                                st))
        fac = fac_jit(theta, xj, vj, dj)
        jax.block_until_ready(fac)
        combos = ([(1, 8), (2, 8), (1, 32)] if ds is None
                  else [(1, 8)])
        for refine, probes in combos:
            r2 = jax.jit(rest_fn, static_argnums=(8, 9))
            ll, _ = r2(theta, xj, vj, dj, rj, key, fac[0], fac[1],
                       probes, refine)
            ll = float(ll)
            rel = abs(ll - truth) / abs(truth)
            print(json.dumps({
                "ds": ds, "refine": refine, "probes": probes,
                "ll": ll, "rel_err": float("%.4g" % rel),
                "pass_5e-3": rel < tol,
            }), flush=True)
        del fac


if __name__ == "__main__":
    main()
