# -*- coding: utf-8 -*-
"""CPU-f32 predictor for the N=1e6 bench anchor (smooth variant).

Replays bench.py's exact large-N path (min_size=512, Hutchinson gradient,
refine_steps) on the CPU backend in float32 and reports the relative
log-likelihood error against the rank-64 f64 truth anchor, for a set of
candidate configurations. This is the cheap testbed for the depth-limited
f32 cascade (VERDICT round-3 Missing #2): one factorization + solves per
config instead of the bench's 49 timed evaluations.

Usage::

    python benchmarks/diag_1e6_cpu_f32.py [n] [config ...]

Configs are NAME=ENVVALUE tokens applied per run, e.g. ``ds=1`` sets
GEORGE_TPU_CORE_DS=1; ``refine=2`` overrides refine_steps; ``min=256``
overrides min_size. Default sweep: shipping config, ds=1, refine=2.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRUTH_1E6 = -217929.3465  # bench.py _TRUTH, rank-64 f64 HODLR


def run_config(n, min_size, refine, ds, rank=12):
    os.environ.pop("GEORGE_TPU_CORE_DS", None)
    if ds is not None:
        os.environ["GEORGE_TPU_CORE_DS"] = str(ds)
    from bench import _dataset
    from george_tpu.solvers.hodlr import (
        build_structure, select_aca_pivots,
        hodlr_loglike_and_grad_hutchinson,
    )

    dtype = np.float32
    kernel, x, y, yerr2, rank_ds = _dataset("smooth", n, dtype)
    st = build_structure(n, min_size=min_size, rank=rank_ds, seed=42,
                         x_sorted=x)
    xpad = np.concatenate(
        [x, np.repeat(x[-1:], st.n_pad - n, axis=0)]
    ).astype(dtype)
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

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    ll, grad = jax.jit(
        lambda th: hodlr_loglike_and_grad_hutchinson(
            kernel.pair_fn, th, jnp.asarray(xpad), jnp.asarray(valid),
            jnp.asarray(diag_pad), jnp.asarray(r_pad), st, key,
            num_probes=8, n_real=n, refine_steps=refine,
        )
    )(jnp.asarray(kernel.parameter_vector, dtype=dtype))
    ll = float(ll)
    rel = abs(ll - TRUTH_1E6) / abs(TRUTH_1E6)
    rec = {
        "n": n, "min_size": min_size, "L": st.L, "refine": refine,
        "ds": ds, "ll": ll, "rel_err": rel,
        "pass_5e-3": rel < 5e-3, "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n = 1_000_000
    args = sys.argv[1:]
    if args and args[0].isdigit():
        n = int(args[0])
        args = args[1:]
    if args:
        cfg = dict(a.split("=", 1) for a in args)
        run_config(
            n,
            min_size=int(cfg.get("min", 512)),
            refine=int(cfg.get("refine", 1)),
            ds=cfg.get("ds"),
        )
        return
    # default sweep: shipping config, then the two candidate levers
    run_config(n, min_size=512, refine=1, ds=None)
    run_config(n, min_size=512, refine=1, ds="1")
    run_config(n, min_size=512, refine=2, ds="1")


if __name__ == "__main__":
    main()
