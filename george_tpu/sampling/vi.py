# -*- coding: utf-8 -*-
"""Variational inference (ADVI) over the fused GP likelihood.

The cheap alternative to MCMC for hyperparameter posteriors (SURVEY.md §7
step 5): a Gaussian approximation fitted by stochastic reparameterized
ELBO ascent — mean-field (diagonal) or **full-rank** (dense Cholesky
covariance; GP hyperparameter posteriors are strongly correlated along
amplitude/length-scale degeneracies, where mean-field badly
underestimates variance — same geometry that motivates the dense NUTS
mass matrix in ``hmc.py``). The whole fit is one jitted ``lax.scan``; the
Monte-Carlo ELBO samples are a batch axis, so the per-step cost is one
batched likelihood evaluation — and the fit itself can be ``vmap``-ed for
multi-start.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["fit_advi", "fit_advi_fullrank", "advi_sample", "ADVI"]


def _adam_scan(vag, params0, keys, num_steps, learning_rate, dtype):
    """Shared Adam-with-cosine-decay ascent loop over a key stream."""
    b1, b2, adam_eps = 0.9, 0.999, 1e-8

    def body(carry, inputs):
        params, m, v = carry
        i, key = inputs
        val, g = vag(params, key)
        g = jax.tree_util.tree_map(
            lambda x: jnp.where(jnp.isfinite(x), x, 0.0), g
        )
        m = jax.tree_util.tree_map(
            lambda mm, gg: b1 * mm + (1 - b1) * gg, m, g
        )
        v = jax.tree_util.tree_map(
            lambda vv, gg: b2 * vv + (1 - b2) * gg * gg, v, g
        )
        t = i + 1.0
        # cosine decay to 5% of the base rate tames MC gradient noise at
        # the ELBO plateau
        lr = learning_rate * (
            0.05 + 0.95 * 0.5 * (1.0 + jnp.cos(jnp.pi * i / num_steps))
        )
        params = jax.tree_util.tree_map(
            lambda p, mm, vv: p
            + lr
            * (mm / (1 - b1 ** t))
            / (jnp.sqrt(vv / (1 - b2 ** t)) + adam_eps),
            params, m, v,
        )
        return (params, m, v), val

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params0)
    steps = jnp.arange(num_steps, dtype=dtype)
    (params, _, _), trace = jax.lax.scan(
        body, (params0, zeros, zeros), (steps, keys)
    )
    return params, trace


@partial(
    jax.jit,
    static_argnames=("log_prob_fn", "num_steps", "num_samples",
                     "learning_rate"),
)
def fit_advi(key, log_prob_fn, theta0, num_steps=1000, num_samples=8,
             learning_rate=0.02):
    """Fit ``q(theta) = N(mu, diag(exp(2 log_sigma)))`` to the posterior.

    Returns ``(mu, log_sigma, elbo_trace)``.
    """
    theta0 = jnp.asarray(theta0)
    dim = theta0.shape[0]
    dtype = theta0.dtype
    batched_lp = jax.vmap(log_prob_fn)

    def elbo(params, key):
        mu, log_sigma = params
        eps = jax.random.normal(key, (num_samples, dim), dtype)
        theta = mu[None, :] + jnp.exp(log_sigma)[None, :] * eps
        lp = batched_lp(theta)
        lp = jnp.where(jnp.isfinite(lp), lp, -1e30)
        entropy = jnp.sum(log_sigma) + 0.5 * dim * (
            1.0 + jnp.log(2.0 * jnp.pi)
        )
        return jnp.mean(lp) + entropy

    vag = jax.value_and_grad(elbo)
    params0 = (theta0, -2.0 * jnp.ones(dim, dtype))
    keys = jax.random.split(key, num_steps)
    params, trace = _adam_scan(
        vag, params0, keys, num_steps, learning_rate, dtype
    )
    mu, log_sigma = params
    return mu, log_sigma, trace


@partial(
    jax.jit,
    static_argnames=("log_prob_fn", "num_steps", "num_samples",
                     "learning_rate"),
)
def fit_advi_fullrank(key, log_prob_fn, theta0, num_steps=1000,
                      num_samples=8, learning_rate=0.02):
    """Fit ``q(theta) = N(mu, L L^T)`` with a dense lower-triangular
    ``L`` (log-parameterized diagonal).

    Returns ``(mu, L, elbo_trace)``. Entropy of the reparameterized
    Gaussian is ``sum(log diag L) + const``, so the ELBO stays exact in
    the Cholesky parameterization.
    """
    theta0 = jnp.asarray(theta0)
    dim = theta0.shape[0]
    dtype = theta0.dtype
    batched_lp = jax.vmap(log_prob_fn)
    tril_mask = jnp.tril(jnp.ones((dim, dim), dtype), -1)

    def chol_of(params):
        _, log_d, W = params
        return tril_mask * W + jnp.diag(jnp.exp(log_d))

    def elbo(params, key):
        mu = params[0]
        L = chol_of(params)
        eps = jax.random.normal(key, (num_samples, dim), dtype)
        theta = mu[None, :] + eps @ L.T
        lp = batched_lp(theta)
        lp = jnp.where(jnp.isfinite(lp), lp, -1e30)
        entropy = jnp.sum(params[1]) + 0.5 * dim * (
            1.0 + jnp.log(2.0 * jnp.pi)
        )
        return jnp.mean(lp) + entropy

    vag = jax.value_and_grad(elbo)
    params0 = (
        theta0,
        -2.0 * jnp.ones(dim, dtype),
        jnp.zeros((dim, dim), dtype),
    )
    keys = jax.random.split(key, num_steps)
    params, trace = _adam_scan(
        vag, params0, keys, num_steps, learning_rate, dtype
    )
    return params[0], chol_of(params), trace


def advi_sample(key, mu, scale, num_samples):
    """Draw from the fitted posterior: ``scale`` is the mean-field
    ``log_sigma`` vector or the full-rank Cholesky factor ``L``."""
    eps = jax.random.normal(
        key, (int(num_samples), mu.shape[0]), mu.dtype
    )
    if jnp.ndim(scale) == 2:
        return mu[None, :] + eps @ scale.T
    return mu[None, :] + jnp.exp(scale)[None, :] * eps


class ADVI(object):
    """Stateful driver mirroring the sampler APIs.

    ``full_rank=True`` fits a dense-covariance Gaussian (Cholesky
    parameterization) — use it whenever the posterior correlations
    matter, which for GP hyperparameters is essentially always."""

    def __init__(self, log_prob_fn, num_steps=1000, num_samples=8,
                 learning_rate=0.02, full_rank=False):
        self.log_prob_fn = log_prob_fn
        self.num_steps = int(num_steps)
        self.num_samples = int(num_samples)
        self.learning_rate = float(learning_rate)
        self.full_rank = bool(full_rank)
        self.mu = None
        self.log_sigma = None
        self.chol = None
        self.elbo_trace = None

    def fit(self, theta0, seed=0):
        """Returns ``(mu, sigma)`` with ``sigma`` the per-parameter
        posterior standard deviations (marginal, for full-rank)."""
        fitter = fit_advi_fullrank if self.full_rank else fit_advi
        mu, scale, trace = fitter(
            jax.random.PRNGKey(seed), self.log_prob_fn,
            jnp.asarray(theta0), num_steps=self.num_steps,
            num_samples=self.num_samples,
            learning_rate=self.learning_rate,
        )
        self.mu = np.asarray(mu)
        self.elbo_trace = np.asarray(trace)
        if self.full_rank:
            self.chol = np.asarray(scale)
            sigma = np.sqrt(np.sum(self.chol ** 2, axis=1))
            self.log_sigma = np.log(sigma)
            return self.mu, sigma
        self.log_sigma = np.asarray(scale)
        return self.mu, np.exp(self.log_sigma)

    @property
    def covariance(self):
        """Fitted posterior covariance (diagonal for mean-field)."""
        if self.full_rank:
            return self.chol @ self.chol.T
        return np.diag(np.exp(2.0 * self.log_sigma))

    def sample(self, num_samples, seed=1):
        scale = self.chol if self.full_rank else self.log_sigma
        return np.asarray(
            advi_sample(
                jax.random.PRNGKey(seed), jnp.asarray(self.mu),
                jnp.asarray(scale), num_samples,
            )
        )
