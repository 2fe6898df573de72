# -*- coding: utf-8 -*-
"""Mean-field variational inference (ADVI) over the fused GP likelihood.

The cheap alternative to MCMC for hyperparameter posteriors (SURVEY.md §7
step 5): a diagonal-Gaussian approximation fitted by stochastic
reparameterized ELBO ascent. The whole fit is one jitted ``lax.scan``; the
Monte-Carlo ELBO samples are a batch axis, so the per-step cost is one
batched likelihood evaluation — and the fit itself can be ``vmap``-ed for
multi-start.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["fit_advi", "advi_sample", "ADVI"]


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

    params0 = (theta0, -2.0 * jnp.ones(dim, dtype))
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params0)
    keys = jax.random.split(key, num_steps)
    steps = jnp.arange(num_steps, dtype=dtype)
    (params, _, _), trace = jax.lax.scan(
        body, (params0, zeros, zeros), (steps, keys)
    )
    mu, log_sigma = params
    return mu, log_sigma, trace


def advi_sample(key, mu, log_sigma, num_samples):
    """Draw samples from the fitted mean-field posterior."""
    eps = jax.random.normal(
        key, (int(num_samples), mu.shape[0]), mu.dtype
    )
    return mu[None, :] + jnp.exp(log_sigma)[None, :] * eps


class ADVI(object):
    """Stateful driver mirroring the sampler APIs."""

    def __init__(self, log_prob_fn, num_steps=1000, num_samples=8,
                 learning_rate=0.02):
        self.log_prob_fn = log_prob_fn
        self.num_steps = int(num_steps)
        self.num_samples = int(num_samples)
        self.learning_rate = float(learning_rate)
        self.mu = None
        self.log_sigma = None
        self.elbo_trace = None

    def fit(self, theta0, seed=0):
        mu, log_sigma, trace = fit_advi(
            jax.random.PRNGKey(seed), self.log_prob_fn,
            jnp.asarray(theta0), num_steps=self.num_steps,
            num_samples=self.num_samples,
            learning_rate=self.learning_rate,
        )
        self.mu = np.asarray(mu)
        self.log_sigma = np.asarray(log_sigma)
        self.elbo_trace = np.asarray(trace)
        return self.mu, np.exp(self.log_sigma)

    def sample(self, num_samples, seed=1):
        return np.asarray(
            advi_sample(
                jax.random.PRNGKey(seed), jnp.asarray(self.mu),
                jnp.asarray(self.log_sigma), num_samples,
            )
        )
