# -*- coding: utf-8 -*-
"""Decompose the 2-D H-matrix log-likelihood error at n=16000 (CPU f64).

Round-4/5 context: the strong-admissibility likelihood sits ~7e-2
relative off the dense truth at n=16000 even in f64 (800 nats), and the
round-5 depth-aware rank did not move it. This splits the error into

  matvec   — ||K_hm v - K v|| / ||K v||: pure compression quality;
  quad     — y^T K_hm^{-1} y vs dense y^T K^{-1} y: CG + compression;
  logdet   — base + SLQ correction vs dense slogdet: SLQ bias/noise.

Usage::

    GEORGE_TPU_BENCH_CPU=1 python benchmarks/diag_hmatrix_decomp.py \
        [--n 16000] [--rank 16] [--growth auto]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=16000)
    parser.add_argument("--rank", type=int, default=16)
    parser.add_argument("--min-size", type=int, default=64)
    parser.add_argument("--growth", default="auto")
    parser.add_argument("--eta", type=float, default=1.0)
    parser.add_argument("--nystrom", default="auto")
    parser.add_argument("--steps", type=int, default=12)
    parser.add_argument("--probes", type=int, default=16)
    args = parser.parse_args()

    import jax

    if os.environ.get("GEORGE_TPU_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    from george_tpu import GP, kernels
    from george_tpu.solvers import HMatrixSolver

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from bench_hmatrix import _dataset

    growth = args.growth if args.growth == "auto" else float(args.growth)
    nystrom = (args.nystrom if args.nystrom == "auto"
               else int(args.nystrom))
    n = args.n
    x, y, yerr = _dataset(n, np.random.default_rng(3))
    kernel = 1.0 * kernels.ExpSquaredKernel([1.5, 1.5], ndim=2)

    gp = GP(1.0 * kernels.ExpSquaredKernel([1.5, 1.5], ndim=2),
            solver=HMatrixSolver, min_size=args.min_size, rank=args.rank,
            eta=args.eta, rank_growth=growth,
            nystrom_rank=nystrom, num_steps=args.steps,
            num_probes=args.probes)
    gp.compute(x, yerr=yerr)
    sol = gp.solver
    hs = sol._hs
    out = {"n": n, "rank": args.rank, "growth": hs.rank_growth,
           "eta": args.eta,
           "nystrom": getattr(sol, "nystrom_rank_effective",
                              sol.nystrom_rank),
           "steps": args.steps, "probes": args.probes,
           "depth_ranks": [int(lev["c"]) for lev in hs.far],
           "n_far": hs.n_far, "n_near": hs.n_near, "L": hs.L, "m": hs.m}

    # dense truth
    K = kernel.get_value(x) + np.diag(yerr ** 2)
    sign, ld_true = np.linalg.slogdet(K)
    z = np.linalg.solve(K, y)
    quad_true = float(y @ z)
    ll_true = -0.5 * (quad_true + ld_true + n * np.log(2 * np.pi))
    out["ll_true"] = round(ll_true, 3)

    # 1. pure compression: matvec residual on a few random vectors
    rng = np.random.default_rng(0)
    V = rng.standard_normal((n, 4))
    KV_true = K @ V
    KV_hm = np.stack([np.asarray(sol.apply_forward(V[:, j]))
                      for j in range(V.shape[1])], axis=1)
    out["matvec_rel"] = float(np.linalg.norm(KV_hm - KV_true)
                              / np.linalg.norm(KV_true))

    # 2. quad term through the solver (CG + compression)
    quad_hm = float(sol.dot_solve(y))
    out["cg_iters"] = getattr(sol, "last_cg_iters", None)
    out["quad_true"] = round(quad_true, 3)
    out["quad_hm"] = round(quad_hm, 3)
    out["quad_rel"] = float(abs(quad_hm - quad_true) / abs(quad_true))

    # 2b. quad with the TRUE matrix solved by the same CG/preconditioner
    # is not separable cheaply; instead: residual of the CG solution
    zh = np.asarray(sol.apply_inverse(y.copy()))
    out["solve_residual_rel"] = float(
        np.linalg.norm(K @ zh - y) / np.linalg.norm(y))

    # 3. logdet: solver's (base + SLQ) vs dense truth
    out["ld_true"] = round(float(ld_true), 3)
    out["ld_hm"] = round(float(sol.log_determinant), 3)
    out["ld_err_nats"] = round(float(sol.log_determinant - ld_true), 3)
    ll_hm = float(gp.log_likelihood(y))
    out["ll_hm"] = round(ll_hm, 3)
    out["ll_rel"] = float(abs(ll_hm - ll_true) / abs(ll_true))
    out["quad_err_nats"] = round(0.5 * abs(quad_hm - quad_true), 3)
    out["ld_err_half_nats"] = round(0.5 * abs(
        float(sol.log_determinant) - ld_true), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
