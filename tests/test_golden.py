# -*- coding: utf-8 -*-
"""Cross-implementation anchors.

The reference publishes exactly one numeric output: the marginal
log-likelihood of the N=100 subset of the scaling tutorial's dataset,
``133.946394912`` for BOTH the exact and the HODLR solver
(``/root/reference/docs/tutorials/scaling.rst:52-91``). These tests pin
this framework to that number, and to the BASELINE.md accuracy config
"HODLR vs exact agree to 1e-6 at N=1e4, quasi-periodic 1-D data".
"""

import numpy as np

from george_tpu import GP, kernels
from george_tpu.solvers import HODLRSolver

REF_LL = 133.946394912  # scaling.rst parsed-literal cells (3 decimals kept)


def _scaling_dataset():
    # the tutorial's exact data recipe (legacy RandomState is stable
    # across numpy versions, so this is bit-reproducible)
    np.random.seed(1234)
    x = np.sort(np.random.uniform(0, 10, 50000))
    yerr = 0.1 * np.ones_like(x)
    y = np.sin(x)
    return x, y, yerr


def test_golden_loglike_basic():
    x, y, yerr = _scaling_dataset()
    kernel = np.var(y) * kernels.ExpSquaredKernel(1.0)
    gp = GP(kernel)
    gp.compute(x[:100], yerr[:100])
    assert abs(gp.log_likelihood(y[:100]) - REF_LL) < 1e-7


def test_golden_loglike_hodlr():
    x, y, yerr = _scaling_dataset()
    kernel = np.var(y) * kernels.ExpSquaredKernel(1.0)
    # N=100 < 2*min_size collapses to one dense leaf — identical to the
    # reference's behavior at this size (tol here only labels the run)
    gp = GP(kernel, solver=HODLRSolver, seed=42)
    gp.compute(x[:100], yerr[:100])
    assert abs(gp.log_likelihood(y[:100]) - REF_LL) < 1e-7


def test_golden_loglike_hodlr_compressed():
    """Same anchor at N=2000 (deep enough for real compression): HODLR
    tracks the exact solver on the tutorial's dataset."""
    x, y, yerr = _scaling_dataset()
    n = 2000
    kernel = np.var(y) * kernels.ExpSquaredKernel(1.0)
    gp_b = GP(kernel)
    gp_b.compute(x[:n], yerr[:n])
    ll_b = gp_b.log_likelihood(y[:n])
    gp_h = GP(np.var(y) * kernels.ExpSquaredKernel(1.0),
              solver=HODLRSolver, seed=42, min_size=64, rank=48)
    gp_h.compute(x[:n], yerr[:n])
    ll_h = gp_h.log_likelihood(y[:n])
    assert abs(ll_h - ll_b) / abs(ll_b) < 1e-6


def test_baseline_config3_hodlr_1e6_at_1e4_quasiperiodic():
    """BASELINE.md row 3: HODLR and exact log-likelihood agree to 1e-6
    (relative) at N=1e4 on quasi-periodic 1-D data, in f64."""
    rng = np.random.default_rng(42)
    n = 10_000
    x = np.sort(rng.uniform(0, 100.0, n))[:, None]
    yerr = 0.25 * np.ones(n)
    # quasi-periodic signal: periodic envelope times a slow drift
    y = (np.sin(2 * np.pi * x[:, 0] / 3.7)
         * np.cos(0.13 * x[:, 0])
         + 0.25 * rng.standard_normal(n))
    kernel = 1.0 * kernels.ExpSquaredKernel(20.0) * kernels.ExpSine2Kernel(
        gamma=1.0, log_period=np.log(3.7)
    )

    # exact reference: dense Cholesky on the host (BasicSolver at N=1e4
    # is the same computation; go straight to numpy to keep it simple)
    K = kernel.get_value(x)
    K[np.diag_indices_from(K)] += yerr ** 2
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(K, y)
    ll_exact = -0.5 * (
        y @ alpha
        + 2.0 * np.sum(np.log(np.diag(L)))
        + n * np.log(2 * np.pi)
    )

    gp_h = GP(1.0 * kernels.ExpSquaredKernel(20.0)
              * kernels.ExpSine2Kernel(gamma=1.0, log_period=np.log(3.7)),
              solver=HODLRSolver, min_size=128, rank=64, seed=42)
    gp_h.compute(x, yerr)
    ll_h = gp_h.log_likelihood(y)
    assert abs(ll_h - ll_exact) / abs(ll_exact) < 1e-6
