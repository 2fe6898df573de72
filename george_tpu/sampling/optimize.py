# -*- coding: utf-8 -*-
"""MAP hyperparameter optimization (reference pattern:
``scipy.optimize.minimize`` on ``gp.nll``/``gp.grad_nll``,
``docs/tutorials/hyper.rst:126-155``).

Two drivers:

* :func:`minimize` — scipy L-BFGS-B on the *fused* value-and-grad (one
  device round-trip per line-search step, vs the reference's full host
  refactorization + Regime-A gradient per step);
* :func:`fit_adam` — fully on-device first-order fit: the whole
  optimization loop is one ``lax.scan``, usable under ``vmap`` for batched
  multi-start fits.
"""

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["minimize", "fit_adam"]


def minimize(gp, y, x=None, yerr=None, method="L-BFGS-B", bounds=None,
             **kwargs):
    """Optimize the GP's active parameters by maximum (penalized)
    likelihood. Updates ``gp`` in place and returns the scipy result.

    Uses the fused jitted value-and-grad when all component models are
    traceable, falling back to ``gp.nll``/``gp.grad_nll`` otherwise.
    """
    import scipy.optimize as op

    if not gp.computed:
        raise RuntimeError("You need to compute the model first")
    if x is None:
        x = gp._x
    y = np.asarray(y, dtype=np.float64)

    if gp._traceable:
        yerr_arg = np.sqrt(gp._yerr2) if yerr is None else yerr
        f = gp.log_prob_fn(x, y, yerr_arg, gate_prior=True)
        vag = jax.jit(jax.value_and_grad(f))

        def objective(vector):
            ll, g = vag(jnp.asarray(vector))
            ll = float(ll)
            if not np.isfinite(ll):
                return np.inf, np.zeros_like(vector)
            return -ll, -np.asarray(g, dtype=np.float64)

        jac = True
    else:
        def objective(vector):
            return gp.nll(vector, y), gp.grad_nll(vector, y)

        jac = True

    if bounds is None:
        raw = gp.get_parameter_bounds()
        if any(b != (None, None) for b in raw):
            bounds = raw

    result = op.minimize(
        objective, gp.get_parameter_vector(), jac=jac, method=method,
        bounds=bounds, **kwargs
    )
    gp.set_parameter_vector(result.x)
    return result


def fit_adam(log_prob_fn, theta0, num_steps=500, learning_rate=0.05,
             b1=0.9, b2=0.999, eps=1e-8):
    """On-device Adam ascent on ``log_prob_fn``; the loop is one
    ``lax.scan``. ``theta0`` may be a single vector or a batch (multi-start
    via ``vmap``). Returns ``(theta_opt, logp_trace)``."""
    theta0 = jnp.asarray(theta0)
    batched = theta0.ndim == 2
    vag = jax.value_and_grad(log_prob_fn)

    def single(theta0):
        def body(carry, i):
            theta, m, v = carry
            ll, g = vag(theta)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            mh = m / (1 - b1 ** (i + 1.0))
            vh = v / (1 - b2 ** (i + 1.0))
            theta = theta + learning_rate * mh / (jnp.sqrt(vh) + eps)
            return (theta, m, v), ll

        (theta, _, _), trace = jax.lax.scan(
            body,
            (theta0, jnp.zeros_like(theta0), jnp.zeros_like(theta0)),
            jnp.arange(num_steps, dtype=theta0.dtype),
        )
        return theta, trace

    fn = jax.jit(jax.vmap(single) if batched else single)
    return fn(theta0)
