# -*- coding: utf-8 -*-
"""NUTS/HMC tests: closed-form target moments, adaptation sanity, and a
short GP-posterior smoke run (statistical parity with the reference's
emcee-based pattern is asserted as moment agreement, SURVEY.md §7)."""

import numpy as np

import jax
import jax.numpy as jnp

from george_tpu import GP, kernels
from george_tpu.sampling.hmc import sample_nuts, sample_hmc, NUTS


def test_nuts_gaussian_moments():
    cov = np.array([[2.0, 0.8], [0.8, 1.0]])
    icov = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -0.5])

    def log_prob(theta):
        d = theta - mu
        return -0.5 * d @ icov @ d

    p0 = np.random.default_rng(0).standard_normal((8, 2))
    samples, stats = sample_nuts(
        jax.random.PRNGKey(0), log_prob, p0, num_warmup=400,
        num_samples=800,
    )
    flat = np.asarray(samples).reshape(-1, 2)
    assert np.allclose(flat.mean(0), np.asarray(mu), atol=0.1)
    assert np.allclose(np.cov(flat.T), cov, atol=0.3)
    assert float(np.mean(stats["diverging"])) < 0.01
    assert 0.6 < float(np.mean(stats["accept"])) <= 1.0


def test_nuts_mass_adaptation_scales():
    d = 6
    scales = np.exp(np.linspace(-1.0, 1.0, d))

    def log_prob(theta):
        return -0.5 * jnp.sum((theta / jnp.asarray(scales)) ** 2)

    p0 = np.random.default_rng(1).standard_normal((8, d))
    samples, stats = sample_nuts(
        jax.random.PRNGKey(1), log_prob, p0, num_warmup=500,
        num_samples=600,
    )
    flat = np.asarray(samples).reshape(-1, d)
    assert np.allclose(flat.std(0) / scales, 1.0, atol=0.2)
    # adapted inverse mass approximates the marginal variances
    ratio = np.asarray(stats["inv_mass"]) / scales ** 2
    assert np.all(ratio > 0.5) and np.all(ratio < 2.0)


def test_nuts_depth_reaches_max_on_straight_trajectory():
    """Regression for the backward-subtree U-turn orientation bug: with a
    step size far too small to curve the trajectory, every doubling must
    succeed and the tree must reach ``max_depth`` (a direction-dependent
    check spuriously truncates backward subtrees at their first odd
    leaf)."""
    from george_tpu.sampling.hmc import nuts_transition

    def log_prob(theta):
        return -0.5 * jnp.sum(theta ** 2)

    vag = jax.value_and_grad(log_prob)
    dim, eps, max_depth = 4, 0.01, 8
    q0 = jnp.zeros(dim) + 0.1
    lp0, g0 = vag(q0)
    inv_mass = jnp.ones(dim)

    keys = jax.random.split(jax.random.PRNGKey(7), 16)
    step = jax.jit(jax.vmap(
        lambda k: nuts_transition(
            k, q0, lp0, g0, vag, eps, inv_mass, max_depth=max_depth
        )[4]
    ))
    depths = np.asarray(step(keys))
    # 256 leapfrog steps of 0.01 cover ~2.6 rad of the period-2pi orbit —
    # no U-turn is geometrically possible, so every transition must hit
    # the depth cap.
    assert np.all(depths == max_depth), depths


def test_hmc_gaussian():
    def log_prob(theta):
        return -0.5 * jnp.sum(theta ** 2)

    p0 = np.random.default_rng(2).standard_normal((4, 3))
    samples, stats = sample_hmc(
        jax.random.PRNGKey(2), log_prob, p0, num_warmup=300,
        num_samples=600, num_leapfrog=16,
    )
    flat = np.asarray(samples).reshape(-1, 3)
    assert np.allclose(flat.mean(0), 0.0, atol=0.12)
    assert np.allclose(flat.std(0), 1.0, atol=0.15)


def test_nuts_gp_posterior_smoke():
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 10, 50))
    y = np.sin(x) + 0.1 * rng.standard_normal(50)
    gp = GP(0.5 * kernels.ExpSquaredKernel(1.0))
    gp.compute(x, 0.1)
    log_prob = gp.log_prob_fn(x, y, 0.1, gate_prior=False)

    sampler = NUTS(log_prob, num_warmup=200, max_depth=8)
    p0 = gp.get_parameter_vector()[None, :] + 1e-2 * rng.standard_normal(
        (4, len(gp))
    )
    samples = sampler.run(p0, 200, seed=4)
    assert samples.shape == (200, 4, len(gp))
    assert np.all(np.isfinite(samples))
    flat = samples.reshape(-1, len(gp))
    # posterior concentrated but not collapsed
    assert np.all(flat.std(0) > 1e-3)
    assert np.all(flat.std(0) < 5.0)


def test_nuts_vs_ensemble_gp_posterior_moments():
    """Cross-engine statistical parity on a GP hyperparameter posterior:
    NUTS and the ensemble sampler agree on moments within MC error — the
    BASELINE config #4 pattern (sampled posterior vs the reference's emcee
    pipeline) checked engine-vs-engine."""
    from george_tpu.sampling import EnsembleSampler

    rng = np.random.default_rng(11)
    x = np.sort(rng.uniform(0, 10, 60))
    y = np.sin(x) + 0.1 * rng.standard_normal(60)
    gp = GP(0.5 * kernels.ExpSquaredKernel(1.0))
    gp.compute(x, 0.1)
    log_prob = gp.log_prob_fn(x, y, 0.1, gate_prior=False)
    ndim = len(gp)
    p0 = gp.get_parameter_vector()

    samples, _ = sample_nuts(
        jax.random.PRNGKey(0), log_prob,
        p0[None, :] + 1e-2 * rng.standard_normal((6, ndim)),
        num_warmup=300, num_samples=500, max_depth=8,
    )
    flat_nuts = np.asarray(samples).reshape(-1, ndim)

    nw = 32
    sampler = EnsembleSampler(nw, ndim, log_prob)
    sampler.run_mcmc(
        p0[None, :] + 1e-2 * rng.standard_normal((nw, ndim)), 1200, seed=1
    )
    flat_ens = sampler.flatchain[nw * 600:]

    assert np.allclose(flat_nuts.mean(0), flat_ens.mean(0), atol=0.15)
    assert np.allclose(flat_nuts.std(0), flat_ens.std(0), rtol=0.35)


def test_nuts_dense_mass_correlated_gaussian():
    """Dense mass adaptation whitens a correlated, scale-disparate
    Gaussian: shallower trees and tighter covariance recovery than the
    diagonal mass on the same budget."""
    rng = np.random.default_rng(7)
    A = rng.standard_normal((5, 5))
    cov = A @ A.T + 0.1 * np.eye(5)
    cov[0, 0] *= 100.0
    prec = jnp.asarray(np.linalg.inv(cov))
    log_prob = lambda q: -0.5 * q @ (prec @ q)
    p0 = jnp.asarray(rng.standard_normal((8, 5)))

    out = {}
    for dense in (False, True):
        samples, stats = sample_nuts(
            jax.random.PRNGKey(0), log_prob, p0,
            num_warmup=300, num_samples=300, dense_mass=dense,
        )
        flat = np.asarray(samples).reshape(-1, 5)
        err = np.abs(np.cov(flat.T) - cov).max() / np.abs(cov).max()
        out[dense] = (float(np.mean(stats["depth"])), err)

    depth_diag, err_diag = out[False]
    depth_dense, err_dense = out[True]
    # dense mass recovers the full covariance and whitens the target
    # (shallower trees); the covariance errors themselves are MC-noisy,
    # so only the dense one is bounded
    assert err_dense < 0.08
    assert depth_dense <= depth_diag


def test_nuts_step_size_clip_tames_rogue_chain():
    """The post-warmup cross-chain median clip bounds every chain's step
    size within [med/clip^2, med*clip] and restarts collapsed chains at
    the median (a rogue per-chain step size is the measured cause of
    0.3+ divergence fractions on GP posteriors)."""
    from george_tpu.sampling.hmc import _robust_final_eps

    le = jnp.log(jnp.asarray([0.007, 0.0071, 0.0069, 0.08, 1e-6]))
    eps = np.asarray(_robust_final_eps(le, 2.0))
    med = 0.007
    assert np.isclose(eps[3], med * 2.0, rtol=0.05)       # capped
    assert np.isclose(eps[4], med / 4.0, rtol=0.05)       # floored
    assert np.allclose(eps[:3], [0.007, 0.0071, 0.0069], rtol=1e-5)

    # non-finite estimates restart at the median
    le = jnp.asarray([np.log(0.01), -np.inf, np.nan])
    eps = np.asarray(_robust_final_eps(le, 2.0))
    assert np.isclose(eps[1], 0.01, rtol=1e-5)
    assert np.isclose(eps[2], 0.01, rtol=1e-5)


def test_samplers_match_quadrature_truth():
    """External oracle: both sampler engines must match a dense-grid
    QUADRATURE truth (not merely each other) on a 2-parameter GP
    hyperparameter posterior — mutual agreement can hide a shared bias.
    Truth moments come from trapezoid integration of exp(log_prob) on a
    wide grid; samplers must land within combined MC + quadrature error."""
    from george_tpu.sampling import EnsembleSampler

    rng = np.random.default_rng(21)
    x = np.sort(rng.uniform(0, 10, 50))
    y = np.sin(x) + 0.15 * rng.standard_normal(50)
    gp = GP(0.5 * kernels.ExpSquaredKernel(1.0))
    gp.compute(x, 0.15)
    ndim = len(gp)
    assert ndim == 2
    center = jnp.asarray(gp.get_parameter_vector())

    def log_prior(th):
        return -0.5 * jnp.sum(((th - center) / 1.0) ** 2)

    log_prob = gp.log_prob_fn(x, y, 0.15, gate_prior=False,
                              log_prior=log_prior)

    # --- quadrature truth on a wide grid (trapezoid; the sd=1 prior is
    # what pins the amplitude plateau, so the +-6 grid captures the tail)
    g0 = np.linspace(float(center[0]) - 6.0, float(center[0]) + 6.0, 193)
    g1 = np.linspace(float(center[1]) - 6.0, float(center[1]) + 6.0, 193)
    G0, G1 = np.meshgrid(g0, g1, indexing="ij")
    pts = jnp.asarray(np.stack([G0.ravel(), G1.ravel()], axis=1))
    lp = np.asarray(jax.jit(jax.vmap(log_prob))(pts)).reshape(G0.shape)
    w = np.exp(lp - lp.max())
    Z = np.trapezoid(np.trapezoid(w, g1, axis=1), g0)
    m0 = np.trapezoid(np.trapezoid(w * G0, g1, axis=1), g0) / Z
    m1 = np.trapezoid(np.trapezoid(w * G1, g1, axis=1), g0) / Z
    v0 = np.trapezoid(np.trapezoid(w * (G0 - m0) ** 2, g1, axis=1), g0) / Z
    v1 = np.trapezoid(np.trapezoid(w * (G1 - m1) ** 2, g1, axis=1), g0) / Z
    mean_q = np.array([m0, m1])
    sd_q = np.sqrt([v0, v1])
    # boundary mass is negligible (grid wide enough)
    assert w[0].max() < 1e-8 and w[-1].max() < 1e-8
    assert w[:, 0].max() < 1e-8 and w[:, -1].max() < 1e-8

    # --- NUTS
    p0 = np.asarray(center)[None, :] + 1e-2 * rng.standard_normal((6, ndim))
    samples, _ = sample_nuts(
        jax.random.PRNGKey(2), log_prob, jnp.asarray(p0),
        num_warmup=300, num_samples=500, max_depth=8,
    )
    flat = np.asarray(samples).reshape(-1, ndim)
    n_eff = flat.shape[0] / 10.0  # conservative ESS guess
    tol = 4.0 * sd_q / np.sqrt(n_eff)
    assert np.all(np.abs(flat.mean(0) - mean_q) < tol), (
        flat.mean(0), mean_q, tol)
    assert np.allclose(flat.std(0), sd_q, rtol=0.25)

    # --- ensemble
    nw = 32
    sampler = EnsembleSampler(nw, ndim, log_prob)
    sampler.run_mcmc(
        np.asarray(center)[None, :] + 1e-2 * rng.standard_normal((nw, ndim)),
        1000, seed=3,
    )
    flat_e = sampler.flatchain[nw * 500:]
    n_eff_e = flat_e.shape[0] / 40.0  # ensemble chains mix slower
    tol_e = 4.0 * sd_q / np.sqrt(n_eff_e)
    assert np.all(np.abs(flat_e.mean(0) - mean_q) < tol_e), (
        flat_e.mean(0), mean_q, tol_e)
    assert np.allclose(flat_e.std(0), sd_q, rtol=0.25)
