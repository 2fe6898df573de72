# -*- coding: utf-8 -*-
"""Functional linear-algebra core shared by the solvers.

Pure, jittable building blocks. The stateful solver classes in this package
are thin wrappers that hold factorization state between the george-style
``compute`` / ``apply_inverse`` / ``log_determinant`` calls; everything here
composes under ``jit`` / ``grad`` / ``vmap`` for the fused likelihood path.
"""

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = [
    "as_points",
    "assemble_dense",
    "cholesky_factor",
    "chol_solve",
    "chol_logdet",
    "chol_dot_solve",
    "mahalanobis_loglike",
]


def as_points(x):
    """Normalize solver inputs to an ``(n, d)`` float64 coordinate array.

    A 1-D ``x`` means n scalar points (the reference's ``parse_samples``
    semantics, ``gp.py:224``) — NOT one n-dimensional point, which is
    what ``np.atleast_2d``'s ``(1, n)`` row would silently make it.
    """
    import numpy as np

    x = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2:
        raise ValueError(
            "Dimension mismatch: x must be (n,) or (n, d), got shape %s"
            % (x.shape,)
        )
    return x


def assemble_dense(pair_fn, theta, x1, x2):
    """Dense covariance matrix via the vmapped pair function."""
    return jax.vmap(
        lambda a: jax.vmap(lambda b: pair_fn(theta, a, b))(x2)
    )(x1)


def cholesky_factor(K, diag=None):
    """Lower Cholesky factor of ``K + diag`` (``diag`` is a vector)."""
    if diag is not None:
        K = K + jnp.diag(diag)
    return jnp.linalg.cholesky(K)


def chol_solve(L, y):
    """Solve ``(L L^T) x = y`` for one or many right-hand sides."""
    squeeze = y.ndim == 1
    if squeeze:
        y = y[:, None]
    z = solve_triangular(L, y, lower=True)
    x = solve_triangular(L, z, lower=True, trans=1)
    return x[:, 0] if squeeze else x


def chol_logdet(L):
    """``log |L L^T|`` from the factor diagonal."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def chol_dot_solve(L, y):
    """``y^T (L L^T)^{-1} y`` without forming the inverse."""
    z = solve_triangular(L, y, lower=True)
    return jnp.sum(z * z)


def mahalanobis_loglike(L, r):
    """Gaussian log-density terms from a Cholesky factor and residual."""
    n = r.shape[0]
    return -0.5 * (
        chol_dot_solve(L, r)
        + chol_logdet(L)
        + n * jnp.log(2.0 * jnp.pi)
    )
