# -*- coding: utf-8 -*-
"""ADVI tests: exact recovery on a diagonal Gaussian, GP posterior sanity."""

import numpy as np

import jax
import jax.numpy as jnp

from george_tpu import GP, kernels
from george_tpu.sampling import ADVI, minimize


def test_advi_recovers_gaussian():
    mu_t = jnp.asarray([1.0, -2.0, 0.5])
    sigma_t = jnp.asarray([0.5, 1.5, 0.2])

    def log_prob(theta):
        return -0.5 * jnp.sum(((theta - mu_t) / sigma_t) ** 2)

    advi = ADVI(log_prob, num_steps=2000, learning_rate=0.05)
    mu, sigma = advi.fit(np.zeros(3), seed=0)
    assert np.allclose(mu, np.asarray(mu_t), atol=0.1)
    assert np.allclose(sigma, np.asarray(sigma_t), rtol=0.25)
    s = advi.sample(2000, seed=1)
    assert np.allclose(s.mean(0), np.asarray(mu_t), atol=0.15)


def test_advi_gp_posterior_matches_map():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 60))
    y = np.sin(x) + 0.1 * rng.standard_normal(60)
    gp = GP(0.5 * kernels.ExpSquaredKernel(1.0))
    gp.compute(x, 0.1)
    res = minimize(gp, y)
    theta_map = res.x

    gp2 = GP(0.5 * kernels.ExpSquaredKernel(1.0))
    gp2.compute(x, 0.1)
    f = gp2.log_prob_fn(x, y, 0.1, gate_prior=False)
    advi = ADVI(f, num_steps=1500, learning_rate=0.05)
    mu, sigma = advi.fit(gp2.get_parameter_vector(), seed=2)
    # VI mode should sit near the MAP (log-concave-ish posterior)
    assert np.allclose(mu, theta_map, atol=0.3)
    assert np.all(sigma > 1e-3) and np.all(sigma < 2.0)


def test_minimize_improves_likelihood():
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0, 10, 80))
    y = np.sin(x) + 0.1 * rng.standard_normal(80)
    gp = GP(np.var(y) * kernels.Matern52Kernel(3.0))
    gp.compute(x, 0.1)
    ll0 = gp.log_likelihood(y)
    res = minimize(gp, y)
    assert res.success or res.status in (0, 2)
    assert gp.log_likelihood(y) >= ll0


def test_advi_fullrank_recovers_correlated_gaussian():
    """Full-rank ADVI recovers a correlated covariance exactly (Gaussian
    target => the ELBO optimum IS the target); mean-field structurally
    cannot represent the off-diagonal."""
    rng = np.random.default_rng(5)
    A = rng.standard_normal((3, 3))
    cov_t = A @ A.T + 0.2 * np.eye(3)
    mu_t = np.array([0.5, -1.0, 2.0])
    prec = jnp.asarray(np.linalg.inv(cov_t))
    mu_j = jnp.asarray(mu_t)

    def log_prob(theta):
        d = theta - mu_j
        return -0.5 * d @ (prec @ d)

    advi = ADVI(log_prob, num_steps=4000, learning_rate=0.05,
                full_rank=True)
    mu, sigma = advi.fit(np.zeros(3), seed=0)
    assert np.allclose(mu, mu_t, atol=0.1)
    cov = advi.covariance
    assert np.allclose(cov, cov_t, atol=0.25 * np.abs(cov_t).max())
    # the off-diagonal structure is really there
    corr_t = cov_t[0, 1] / np.sqrt(cov_t[0, 0] * cov_t[1, 1])
    corr = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
    assert abs(corr - corr_t) < 0.15
    s = advi.sample(4000, seed=1)
    assert np.allclose(np.cov(s.T), cov_t, atol=0.3 * np.abs(cov_t).max())
