# -*- coding: utf-8 -*-
"""Reproduce the bench_nuts configuration with PER-CHAIN divergence
stats, on CPU f64 or on the chip, to separate posterior geometry from
f32 arithmetic in the on-chip divergence fraction.

Round-4 context: the CPU n=64 proxy study measured divergence_frac
0.024 (dense mass + median step clip + prior); the first on-chip
n=512 run recorded 0.2475. This script answers which ingredient moved.

Usage::

    GEORGE_TPU_BENCH_CPU=1 python benchmarks/diag_nuts_divergence.py [--n 512]
    python benchmarks/diag_nuts_divergence.py --n 512          # on-chip
"""
import argparse
import json
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=512)
    parser.add_argument("--chains", type=int, default=8)
    parser.add_argument("--warmup", type=int, default=200)
    parser.add_argument("--samples", type=int, default=200)
    parser.add_argument("--max-depth", type=int, default=8)
    parser.add_argument("--segment", type=int, default=8)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--target-accept", type=float, default=0.8)
    parser.add_argument("--prior-scale", type=float, default=3.0)
    args = parser.parse_args()

    import jax

    if os.environ.get("GEORGE_TPU_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from george_tpu import GP, kernels
    from george_tpu.sampling import sample_nuts

    rng = np.random.default_rng(0)
    n = args.n
    x = np.sort(rng.uniform(0.0, 30.0, n))
    y = np.sin(x) * np.exp(-0.05 * x) + 0.1 * rng.standard_normal(n)

    kernel = 0.5 * kernels.ExpSquaredKernel(1.3) * kernels.ExpSine2Kernel(
        gamma=2.0, log_period=0.0
    ) + 0.1 * kernels.Matern32Kernel(2.0)
    gp = GP(kernel, white_noise=np.log(1e-4), fit_white_noise=True)
    gp.compute(x, 0.1)
    center = jnp.asarray(gp.get_parameter_vector())

    def log_prior(th):
        return -0.5 * jnp.sum(((th - center) / args.prior_scale) ** 2)

    log_prob = gp.log_prob_fn(x, y, 0.1, gate_prior=False,
                              log_prior=log_prior)
    ndim = len(gp)
    p0 = gp.get_parameter_vector()[None, :] + 1e-3 * rng.standard_normal(
        (args.chains, ndim)
    )

    samples, stats = sample_nuts(
        jax.random.PRNGKey(args.seed), log_prob, jnp.asarray(p0),
        num_warmup=args.warmup, num_samples=args.samples,
        max_depth=args.max_depth, segment_size=args.segment,
        target_accept=args.target_accept, dense_mass=True,
    )
    div = np.asarray(stats["diverging"], dtype=np.float64)
    acc = np.asarray(stats["accept"], dtype=np.float64)
    dep = np.asarray(stats["depth"], dtype=np.float64)
    samples = np.asarray(samples)
    # axis 0 = draws, axis 1 = chains (sample_* stacks draws first)
    per_chain_div = div.mean(axis=0)
    per_chain_acc = acc.mean(axis=0)
    per_chain_dep = dep.mean(axis=0)
    # movement per chain: std of the first parameter across draws
    move = samples[..., 0].std(axis=0)
    print(json.dumps({
        "metric": "nuts_divergence_diag",
        "backend": jax.default_backend(),
        "n": n, "chains": args.chains, "seed": args.seed,
        "target_accept": args.target_accept,
        "prior_scale": args.prior_scale,
        "divergence_frac": round(float(div.mean()), 4),
        "per_chain_div": [round(float(v), 3) for v in per_chain_div],
        "per_chain_accept": [round(float(v), 3) for v in per_chain_acc],
        "per_chain_depth": [round(float(v), 2) for v in per_chain_dep],
        "per_chain_move_p0": [round(float(v), 4) for v in move],
    }), flush=True)


if __name__ == "__main__":
    main()
