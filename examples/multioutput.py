# -*- coding: utf-8 -*-
"""Multi-output GP with the linear coregionalization (LCM) kernel — the
GPTune fork's flagship addition (reference ``kernels.h:2355-2645``).

Two correlated tasks observe shifted/scaled versions of one latent
function; the LCM kernel transfers strength between them. The task id
rides in the last input coordinate.

Run on CPU: ``python examples/multioutput.py [n_at_scale]``

The second part runs the same model AT SCALE (default n=10,000 across
two tasks) through the hierarchical solver — the workload the fork
built its ButterflyPACK backend for (reference ``basic.py:80-118``).
"""

import sys

import numpy as np

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

from george_tpu import GP, kernels
from george_tpu.sampling import minimize


def main():
    rng = np.random.default_rng(7)
    n_per = 40
    xs = np.sort(rng.uniform(0, 10, n_per))
    latent = np.sin(xs)
    y0 = 1.0 * latent + 0.05 * rng.standard_normal(n_per)
    y1 = 0.6 * latent + 0.3 + 0.05 * rng.standard_normal(n_per)

    # inputs: (coordinate, task id)
    x = np.concatenate(
        [
            np.stack([xs, np.zeros(n_per)], axis=1),
            np.stack([xs, np.ones(n_per)], axis=1),
        ]
    )
    y = np.concatenate([y0, y1 - 0.3])   # remove task-1 offset for brevity

    kernel = kernels.LCMKernel(
        logBK=np.log([1.0, 0.6, 0.1, 0.1]),   # B (T x Q) then K (T x Q)
        children=[kernels.ExpSquaredKernel(metric=1.0)],
        T=2, Q=1, ndim=1,
    )
    gp = GP(kernel)
    gp.compute(x, 0.05)
    print("initial log-likelihood: {0:.2f}".format(gp.log_likelihood(y)))
    minimize(gp, y)
    print("fitted  log-likelihood: {0:.2f}".format(gp.log_likelihood(y)))

    # predict task 1 from both tasks' data
    t = np.linspace(0, 10, 100)
    t1 = np.stack([t, np.ones_like(t)], axis=1)
    mu1, var1 = gp.predict(y, t1, return_var=True)
    rmse = np.sqrt(np.mean((mu1 - 0.6 * np.sin(t)) ** 2))
    print("task-1 prediction RMSE vs truth: {0:.4f}".format(rmse))
    assert rmse < 0.15
    # cross-task transfer: task-1 posterior tighter than its noise-only
    # baseline thanks to shared structure
    assert np.median(np.sqrt(var1)) < 0.2

    at_scale(int(sys.argv[1]) if len(sys.argv) > 1 else 10000)


def at_scale(n_total):
    """The same multi-task model at scale through the hierarchical
    solver — the fork's reason to exist (its ButterflyPACK backend
    compresses exactly this task-modulated covariance, reference
    ``basic.py:80-118``). The solver orders on the spatial axes only
    (``LCMKernel.sort_axes``), so the coarse off-diagonal blocks stay
    low-rank with tasks interleaved."""
    import time

    from george_tpu.solvers import HODLRSolver

    rng = np.random.default_rng(11)
    n_per = n_total // 2
    xs = np.sort(rng.uniform(0, 200.0, n_per))
    latent = np.sin(0.3 * xs)
    y0 = 1.0 * latent + 0.1 * rng.standard_normal(n_per)
    y1 = 0.6 * latent + 0.1 * rng.standard_normal(n_per)
    x = np.concatenate(
        [
            np.stack([xs, np.zeros(n_per)], axis=1),
            np.stack([xs, np.ones(n_per)], axis=1),
        ]
    )
    y = np.concatenate([y0, y1])

    kernel = kernels.LCMKernel(
        logBK=np.log([1.0, 0.6, 0.05, 0.05]),
        children=[kernels.ExpSquaredKernel(metric=10.0)],
        T=2, Q=1, ndim=1,
    )
    # rank 48: the densely-sampled very-smooth covariance here is
    # ill-conditioned, and prediction amplifies solve error (rank 24
    # predicts at RMSE 0.099, rank 48 at 0.010)
    gp = GP(kernel, solver=HODLRSolver, min_size=128, rank=48)
    t0 = time.perf_counter()
    gp.compute(x, 0.1)
    ll = gp.log_likelihood(y)
    dt = time.perf_counter() - t0
    print(
        "at-scale n={0}: hierarchical LCM log-likelihood {1:.2f} "
        "({2:.1f} s compute+eval)".format(n_total, ll, dt)
    )
    assert np.isfinite(ll)

    # cross-task prediction: task 1 at held-out points, learned from
    # both tasks
    t = np.linspace(5, 195, 200)
    t1 = np.stack([t, np.ones_like(t)], axis=1)
    mu1 = gp.predict(y, t1, return_cov=False)
    rmse = float(np.sqrt(np.mean((mu1 - 0.6 * np.sin(0.3 * t)) ** 2)))
    print("at-scale task-1 prediction RMSE vs truth: {0:.4f}".format(rmse))
    assert rmse < 0.05


if __name__ == "__main__":
    main()
