# -*- coding: utf-8 -*-
"""On-chip A/B of the banded (DIA) sparse matvec: XLA shifted-slice form
(``sparse.dia_apply``) vs the Pallas VMEM-resident kernel
(``ops/dia.py``), plus the end-to-end effect on a CG solve through
``SparseSolver`` (the decision input for making
``GEORGE_TPU_PALLAS_DIA=1`` the default on TPU).

Timing rule (session memory): every timed region ends with a host
scalar fetch — ``block_until_ready`` alone under-reports over the
serving tunnel.

Usage::

    python benchmarks/bench_dia.py [--n 200000] [--reps 30]

``GEORGE_TPU_BENCH_CPU=1`` forces the CPU backend in float64 (for smoke
runs — the environment pins ``JAX_PLATFORMS=axon``, which env vars
cannot override; only an in-process config update before first device
use can).
"""

import argparse
import json
import os
import time

import numpy as np


def _fetch_time(fn, reps):
    fn()  # compile + warm
    t0 = time.time()
    acc = 0.0
    for _ in range(reps):
        acc += fn()  # each call ends in float(...): a host fetch
    dt = (time.time() - t0) / reps
    return dt, acc


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=200000)
    parser.add_argument("--reps", type=int, default=30)
    parser.add_argument("--rc", type=float, default=2.0)
    args = parser.parse_args()

    import jax

    if os.environ.get("GEORGE_TPU_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from george_tpu.solvers.sparse import (
        banded_offsets, banded_ell_tables, dia_apply, ell_values, cg_solve,
    )
    from george_tpu.ops.dia import dia_matvec_pallas
    from george_tpu import kernels
    from george_tpu.neighbors import radius_neighbors_csr

    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    n = args.n
    x = np.sort(rng.uniform(0, n / 50.0, n))
    k = kernels.WendlandC2Kernel(
        log_rc=np.log(args.rc),
        kernel_base=kernels.ExpSquaredKernel(metric=1.0),
    )
    nbr_idx, row_ptr = radius_neighbors_csr(x[:, None], args.rc)
    band = banded_offsets(nbr_idx, row_ptr)
    assert band is not None, "dataset is not banded"
    offsets, lo, hi = band
    nbr, mask = banded_ell_tables(offsets, lo, hi, n)
    dtype = np.float32 if backend == "tpu" else np.float64
    xj = jnp.asarray(x[:, None], dtype=dtype)
    theta = jnp.asarray(k.parameter_vector, dtype=dtype)
    vals = jax.jit(ell_values, static_argnums=0)(
        k.pair_fn, theta, xj, jnp.asarray(nbr), jnp.asarray(mask)
    )
    vals = jax.block_until_ready(vals)
    diag = jnp.asarray(0.01 * np.ones(n), dtype=dtype)
    y = jnp.asarray(rng.standard_normal(n), dtype=dtype)
    off_tuple = tuple(int(d) for d in offsets)

    interp = backend != "tpu"  # CPU smoke runs use interpret mode
    xla_mv = jax.jit(lambda v: dia_apply(vals, offsets, diag, v))
    pal_mv = jax.jit(
        lambda v: dia_matvec_pallas(
            vals, off_tuple, diag, v, interpret=interp
        )
    )

    out_x = np.asarray(xla_mv(y))
    out_p = np.asarray(pal_mv(y))
    par = float(np.max(np.abs(out_x - out_p)) / np.max(np.abs(out_x)))

    t_xla, _ = _fetch_time(lambda: float(xla_mv(y)[0]), args.reps)
    t_pal, _ = _fetch_time(lambda: float(pal_mv(y)[0]), args.reps)

    # end-to-end CG (the consumer): 64 iterations' worth of matvecs
    pdiag = vals[jnp.arange(n), int(np.argmax(offsets == 0))] + diag

    def cg_of(mv):
        solve = jax.jit(
            lambda rhs: cg_solve(mv, rhs, pdiag, tol=1e-6, maxiter=64)[0]
        )
        return lambda: float(solve(y)[0])

    t_cgx, _ = _fetch_time(cg_of(xla_mv), 5)
    t_cgp, _ = _fetch_time(cg_of(pal_mv), 5)

    print(json.dumps({
        "metric": "dia_matvec_pallas_speedup",
        "backend": backend,
        "n": n,
        "band_width": len(off_tuple),
        "parity_rel": par,
        "t_matvec_xla_ms": 1e3 * t_xla,
        "t_matvec_pallas_ms": 1e3 * t_pal,
        "matvec_speedup": t_xla / t_pal,
        "t_cg64_xla_ms": 1e3 * t_cgx,
        "t_cg64_pallas_ms": 1e3 * t_cgp,
        "cg_speedup": t_cgx / t_cgp,
    }))

    # -- direct (block-tridiagonal Cholesky) vs iterative (CG + SLQ):
    # fused likelihood + gradient, the quantity samplers/optimizers pay
    from george_tpu import GP
    from george_tpu.solvers import SparseSolver

    y = np.sin(x) + 0.1 * rng.standard_normal(n)
    out = {"metric": "banded_direct_vs_iterative", "backend": backend,
           "n": n}
    for mode, kw in (("direct", {}), ("iterative", dict(direct=False))):
        try:
            gp = GP(k, solver=SparseSolver, **kw)
            t0 = time.time()
            gp.compute(x, 0.1)
            out["t_compute_%s_s" % mode] = time.time() - t0
            if mode == "direct" and gp.solver._direct_loglike is None:
                out["direct_taken"] = False
                continue
            lp = gp.log_prob_fn(x, y, yerr=0.1, gate_prior=False)
            vg = jax.jit(jax.value_and_grad(lp))
            th = jnp.asarray(gp.get_parameter_vector(), dtype=dtype)
            v, g = vg(th)
            float(v)  # compile + host fetch
            reps = 10 if backend == "tpu" else 2
            t_eval, _ = _fetch_time(lambda: float(vg(th)[0]), reps)
            out["t_loglik_grad_%s_ms" % mode] = 1e3 * t_eval
            out["ll_%s" % mode] = float(v)
        except Exception as e:  # one mode's failure must not lose the other
            out["error_%s" % mode] = str(e)[:200]
    if "t_loglik_grad_direct_ms" in out and \
            "t_loglik_grad_iterative_ms" in out:
        out["direct_speedup"] = (
            out["t_loglik_grad_iterative_ms"]
            / out["t_loglik_grad_direct_ms"]
        )
        out["ll_abs_diff"] = abs(out["ll_direct"] - out["ll_iterative"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
