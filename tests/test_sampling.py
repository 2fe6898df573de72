# -*- coding: utf-8 -*-
"""Sampling engine tests: ensemble correctness on closed-form targets and
GP posterior consistency (reference pattern: ``docs/tutorials/hyper.rst``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from george_tpu import GP, kernels
from george_tpu.sampling import EnsembleSampler


def test_ensemble_gaussian_moments():
    """Stretch-move sampler recovers mean/cov of a correlated Gaussian."""
    cov = np.array([[2.0, 0.8], [0.8, 1.0]])
    icov = np.linalg.inv(cov)
    mu = np.array([1.0, -0.5])

    def log_prob(theta):
        d = theta - mu
        return -0.5 * d @ jnp.asarray(icov) @ d

    nw = 64
    sampler = EnsembleSampler(nw, 2, log_prob)
    rng = np.random.default_rng(1)
    p0 = mu + rng.standard_normal((nw, 2))
    sampler.run_mcmc(p0, 1500, seed=2)

    flat = sampler.flatchain[nw * 500:]
    assert np.allclose(flat.mean(axis=0), mu, atol=0.12)
    assert np.allclose(np.cov(flat.T), cov, atol=0.3)
    assert 0.2 < sampler.acceptance_fraction.mean() < 0.9


def test_log_prob_fn_matches_log_likelihood():
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 10, 40))
    y = np.sin(x) + 0.1 * rng.standard_normal(40)
    yerr = 0.1

    gp = GP(1.2 * kernels.Matern32Kernel(1.5), fit_white_noise=False)
    gp.compute(x, yerr)
    ll0 = gp.log_likelihood(y)

    f = gp.log_prob_fn(x, y, yerr)
    assert np.isclose(float(f(jnp.asarray(gp.get_parameter_vector()))), ll0)

    # at a different parameter vector too
    v = gp.get_parameter_vector() + 0.3
    lp = float(f(jnp.asarray(v)))
    gp.set_parameter_vector(v)
    assert np.isclose(lp, gp.log_likelihood(y))


def test_log_prob_fn_smooth_prior():
    """``log_prior=`` adds a traceable smooth prior to the closure — the
    sampler-facing way to make the GP posterior proper (gradient-based
    samplers want this instead of the hard bounds gate)."""
    rng = np.random.default_rng(11)
    x = np.sort(rng.uniform(0, 10, 30))
    y = np.sin(x) + 0.1 * rng.standard_normal(30)

    gp = GP(1.2 * kernels.Matern32Kernel(1.5))
    gp.compute(x, 0.1)
    center = jnp.asarray(gp.get_parameter_vector())
    prior = lambda th: -0.5 * jnp.sum(((th - center) / 2.0) ** 2)

    f0 = gp.log_prob_fn(x, y, 0.1, gate_prior=False)
    f1 = gp.log_prob_fn(x, y, 0.1, gate_prior=False, log_prior=prior)

    v = np.asarray(center) + 0.7
    vj = jnp.asarray(v)
    assert np.isclose(
        float(f1(vj)), float(f0(vj)) + float(prior(vj)), rtol=1e-6
    )
    # the composed closure stays differentiable
    g = jax.grad(f1)(vj)
    assert np.all(np.isfinite(np.asarray(g)))


def test_log_prob_fn_bounds_gate():
    rng = np.random.default_rng(4)
    x = np.sort(rng.uniform(0, 10, 20))
    y = np.sin(x)

    k = kernels.ExpSquaredKernel(
        1.0, metric_bounds=[(-2.0, 2.0)]
    )
    gp = GP(2.0 * k)
    gp.compute(x, 0.1)
    f = gp.log_prob_fn(x, y, 0.1)
    v = gp.get_parameter_vector()
    assert np.isfinite(float(f(jnp.asarray(v))))
    v_out = v.copy()
    v_out[-1] = 5.0  # outside metric bounds
    assert float(f(jnp.asarray(v_out))) == -np.inf


def test_log_prob_fn_respects_frozen():
    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(0, 10, 25))
    y = np.sin(x)
    gp = GP(1.2 * kernels.ExpSquaredKernel(1.5))
    gp.compute(x, 0.1)
    gp.freeze_parameter("kernel:k2:metric:log_M_0_0")
    f = gp.log_prob_fn(x, y, 0.1)
    v = gp.get_parameter_vector()  # active only
    assert v.shape == (1,)
    lp = float(f(jnp.asarray(v)))
    assert np.isclose(lp, gp.log_likelihood(y))


def test_gp_posterior_ensemble_smoke():
    """Short GP hyperparameter MCMC: finite, moving, plausible."""
    rng = np.random.default_rng(6)
    x = np.sort(rng.uniform(0, 10, 50))
    y = np.sin(x) + 0.1 * rng.standard_normal(50)

    gp = GP(0.5 * kernels.ExpSquaredKernel(1.0))
    gp.compute(x, 0.1)
    log_prob = gp.log_prob_fn(x, y, 0.1)

    nw, ndim = 16, len(gp)
    sampler = EnsembleSampler(nw, ndim, log_prob)
    p0 = gp.get_parameter_vector() + 1e-3 * rng.standard_normal((nw, ndim))
    final, logp = sampler.run_mcmc(p0, 200, seed=7)
    assert np.all(np.isfinite(logp))
    assert sampler.chain.shape == (nw, 200, ndim)
    # posterior should not have collapsed
    assert sampler.flatchain[nw * 100:].std(axis=0).min() > 1e-3


def test_graft_entry_single_chip():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    ll, grad = jax.jit(fn)(*args)
    assert np.isfinite(float(ll))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >= 2 devices")
    dryrun_multichip(n)
