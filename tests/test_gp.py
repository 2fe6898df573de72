# -*- coding: utf-8 -*-
"""End-to-end GP tests (patterned on reference ``tests/test_gp.py``)."""

import numpy as np
import pytest

import george_tpu as gt
from george_tpu import GP, kernels


def _data(n=50, seed=1234):
    rng = np.random.RandomState(seed)
    x = np.sort(rng.rand(n)) * 10
    yerr = 0.1 + 0.05 * rng.rand(n)
    y = np.sin(x) + yerr * rng.randn(n)
    return x, y, yerr


def _fd_gradient(gp, y, eps=1.0e-6):
    v = gp.get_parameter_vector()
    g = np.zeros_like(v)
    for i in range(len(v)):
        vp = v.copy()
        vp[i] += eps
        gp.set_parameter_vector(vp)
        lp = gp.log_likelihood(y)
        vm = v.copy()
        vm[i] -= eps
        gp.set_parameter_vector(vm)
        lm = gp.log_likelihood(y)
        g[i] = 0.5 * (lp - lm) / eps
    gp.set_parameter_vector(v)
    return g


@pytest.mark.parametrize("fit_white_noise", [False, True])
def test_gradient(fit_white_noise):
    x, y, yerr = _data()
    kernel = 1.0 * kernels.ExpSquaredKernel(metric=1.0) + kernels.Matern32Kernel(
        metric=2.0
    )
    gp = GP(
        kernel,
        mean=0.1,
        fit_mean=True,
        white_noise=np.log(0.02),
        fit_white_noise=fit_white_noise,
    )
    gp.compute(x, yerr)
    g = gp.grad_log_likelihood(y)
    gfd = _fd_gradient(gp, y)
    assert np.allclose(g, gfd, rtol=1e-4, atol=1e-6)


def test_prediction_vs_explicit_solve():
    x, y, yerr = _data()
    kernel = kernels.ExpSquaredKernel(metric=1.0)
    gp = GP(kernel)
    gp.compute(x, yerr)
    t = np.linspace(0, 10, 17)
    mu, cov = gp.predict(y, t)

    X = np.atleast_2d(x).T
    T = np.atleast_2d(t).T
    K = kernel.get_value(X)
    K[np.diag_indices_from(K)] += yerr**2 + gt.TINY
    Ks = kernel.get_value(T, X)
    mu_ref = Ks @ np.linalg.solve(K, y)
    cov_ref = kernel.get_value(T) - Ks @ np.linalg.solve(K, Ks.T)
    assert np.allclose(mu, mu_ref)
    assert np.allclose(cov, cov_ref, atol=1e-8)

    mu2, var = gp.predict(y, t, return_var=True)
    assert np.allclose(mu2, mu_ref)
    assert np.allclose(var, np.diag(cov_ref), atol=1e-8)


def test_alpha_cache_invalidation():
    x, y, yerr = _data()
    kernel = kernels.ExpSquaredKernel(metric=1.0)
    gp = GP(kernel)
    gp.compute(x, yerr)

    gp.predict(y, x[:3], cache=True)
    a1 = gp._alpha.copy()

    # Same y: cache reused.
    gp.predict(y, x[:3], cache=True)
    assert np.allclose(gp._alpha, a1)

    # New y: cache invalidated.
    y2 = y + 1.0
    gp.predict(y2, x[:3], cache=True)
    assert not np.allclose(gp._alpha, a1)

    # New parameters: refactorization and fresh alpha.
    gp.set_parameter_vector(gp.get_parameter_vector() + 0.1)
    gp.predict(y2, x[:3], cache=True)
    K = kernel.get_value(np.atleast_2d(x).T)
    K[np.diag_indices_from(K)] += yerr**2 + gt.TINY
    assert np.allclose(gp._alpha, np.linalg.solve(K, y2))


def test_apply_inverse():
    x, y, yerr = _data()
    kernel = kernels.ExpSquaredKernel(metric=1.0)
    gp = GP(kernel)
    gp.compute(x, yerr)

    K = kernel.get_value(np.atleast_2d(x).T)
    K[np.diag_indices_from(K)] += yerr**2 + gt.TINY

    b = gp.apply_inverse(y)
    assert np.allclose(b, np.linalg.solve(K, y))

    Y = np.vstack([y, 2 * y]).T
    B = gp.apply_inverse(Y)
    assert np.allclose(B, np.linalg.solve(K, Y))


def test_predict_scalar_batch_consistency():
    x, y, yerr = _data()
    gp = GP(kernels.ExpSquaredKernel(metric=1.0))
    gp.compute(x, yerr)
    t = np.linspace(0, 10, 5)
    mu_b, var_b = gp.predict(y, t, return_var=True)
    for i, ti in enumerate(t):
        mu_s, var_s = gp.predict(y, np.array([ti]), return_var=True)
        assert np.allclose(mu_s[0], mu_b[i])
        assert np.allclose(var_s[0], var_b[i])


def test_quiet_failure_modes():
    x, y, yerr = _data(20)
    gp = GP(kernels.ConstantKernel(log_constant=0.0))
    gp.compute(x, yerr)
    assert np.isfinite(gp.log_likelihood(y))
    # Push into a numerically catastrophic region (overflowing amplitude so
    # the refactorization fails): quiet mode maps the failure to -inf / 0.
    gp.set_parameter_vector(np.array([800.0]))
    assert gp.log_likelihood(y, quiet=True) == -np.inf
    assert np.all(gp.grad_log_likelihood(y, quiet=True) == 0.0)
    with pytest.raises((ValueError, np.linalg.LinAlgError)):
        gp.log_likelihood(y, quiet=False)


def test_trivial_gp_and_empty_kernel():
    x, y, yerr = _data()
    gp = GP()
    gp.compute(x, yerr)
    var = yerr**2 + gt.TINY
    ll_ref = -0.5 * np.sum(
        y**2 / var + np.log(var) + np.log(2 * np.pi)
    )
    assert np.allclose(gp.log_likelihood(y), ll_ref)


def test_nll_and_prior_gate():
    x, y, yerr = _data()
    gp = GP(
        kernels.ExpSquaredKernel(
            metric=1.0, metric_bounds=[(-1.0, 1.0)]
        )
    )
    gp.compute(x, yerr)
    v = gp.get_parameter_vector()
    assert np.isfinite(gp.nll(v, y))
    assert np.allclose(gp.grad_nll(v, y), -gp.grad_log_likelihood(y))
    assert gp.nll(np.array([5.0]), y) == np.inf
    assert np.all(gp.grad_nll(np.array([5.0]), y) == 0.0)


def test_mean_and_wn_models():
    x, y, yerr = _data()

    gp = GP(
        kernels.ExpSquaredKernel(metric=1.0),
        mean=2.5,
        fit_mean=True,
        white_noise=np.log(0.01),
        fit_white_noise=True,
    )
    gp.compute(x, yerr)
    names = gp.get_parameter_names()
    assert "mean:value" in names
    assert "white_noise:value" in names
    g = gp.grad_log_likelihood(y)
    gfd = _fd_gradient(gp, y)
    assert np.allclose(g, gfd, rtol=1e-4, atol=1e-6)


def test_host_mean_model_fallback():
    """A numpy-only mean model exercises the host-gradient fallback path."""
    from george_tpu.modeling import Model

    class NumpyMean(Model):
        parameter_names = ("a", "b")

        def get_value(self, x):
            return self.a * np.asarray(x) + self.b

        def compute_gradient(self, x):
            x = np.asarray(x)
            return np.vstack([x, np.ones_like(x)])

    x, y, yerr = _data()
    gp = GP(
        kernels.ExpSquaredKernel(metric=1.0),
        mean=NumpyMean(0.1, 0.2),
        fit_mean=True,
    )
    gp.compute(x, yerr)
    assert not gp._traceable
    g = gp.grad_log_likelihood(y)
    gfd = _fd_gradient(gp, y)
    assert np.allclose(g, gfd, rtol=1e-4, atol=1e-6)


def test_lcm_multi_output_gp():
    rng = np.random.RandomState(0)
    n = 30
    xs = rng.rand(n, 1) * 5
    tasks = rng.randint(0, 2, (n, 1)).astype(float)
    x = np.concatenate([xs, tasks], axis=1)
    y = np.sin(xs[:, 0]) + 0.1 * tasks[:, 0]
    kernel = kernels.LCMKernel(
        logBK=np.log([1.0, 0.7, 0.3, 0.2]),
        children=[kernels.ExpSquaredKernel(metric=1.0)],
        T=2,
        Q=1,
        ndim=1,
    )
    gp = GP(kernel)
    gp.compute(x, 0.1)
    g = gp.grad_log_likelihood(y)
    gfd = _fd_gradient(gp, y)
    assert np.allclose(g, gfd, rtol=1e-4, atol=1e-5)


def test_predict_kernel_override_mixture_separation():
    """Per-component prediction via the ``kernel=`` override — the
    mixture-of-GPs separation pattern (reference ``gp.py:624-628``,
    ``docs/tutorials/mixture.rst``): component means add up to the full
    posterior mean."""
    rng = np.random.RandomState(1)
    x = np.sort(rng.uniform(0, 10, 80))
    y = np.sin(x) + 0.05 * rng.randn(80)
    k1 = 0.8 * kernels.ExpSquaredKernel(3.0)
    k2 = 0.3 * kernels.ExpSquaredKernel(0.1)
    gp = GP(k1 + k2)
    gp.compute(x, 0.05)

    t = np.linspace(0, 10, 60)
    mu_full = gp.predict(y, t, return_cov=False)
    mu1 = gp.predict(y, t, return_cov=False, kernel=k1)
    mu2 = gp.predict(y, t, return_cov=False, kernel=k2)
    mean_t = np.zeros_like(t)
    assert np.allclose(mu1 + mu2 - mean_t, mu_full, atol=1e-8)
    # the smooth component carries most of the sine signal
    assert np.sqrt(np.mean((mu1 - np.sin(t)) ** 2)) < 0.3


def test_log_prob_fn_rejects_mismatched_x_on_fused_path():
    """With a computed fused-likelihood solver, log_prob_fn must refuse an
    x that differs from the computed inputs (the factorization is built on
    the cached points; a different x would silently score the wrong
    data)."""
    from george_tpu.solvers import HODLRSolver

    rng = np.random.default_rng(21)
    x = np.sort(rng.uniform(0, 10, 128))
    y = np.sin(x)
    gp = GP(1.2 * kernels.ExpSquaredKernel(2.0), solver=HODLRSolver)
    gp.compute(x, 0.1)
    # matching x is fine
    gp.log_prob_fn(x, y, 0.1)
    with pytest.raises(ValueError):
        gp.log_prob_fn(x + 0.5, y, 0.1)
