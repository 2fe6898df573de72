# -*- coding: utf-8 -*-
"""Small host-side utilities (reference ``src/george/utils.py``)."""

import functools

import numpy as np

from .neighbors import nd_sort_samples  # noqa: F401  (re-export)

__all__ = [
    "multivariate_gaussian_samples",
    "nd_sort_samples",
    "numerical_gradient",
    "check_gradient",
    "full_precision_matmuls",
    "pinned_full_precision",
]


def full_precision_matmuls(fn):
    """Trace ``fn`` with every dot/einsum pinned to (near-)full f32
    precision.

    On TPU the MXU runs f32 matmuls in single bfloat16 passes by default
    (``Precision.DEFAULT``); the solvers' small contractions — Gram
    matrices for the ridge skeleton interpolation, SMW cores, ACA
    residual updates, CG/Lanczos recurrences, quadratic forms — are
    exactly the places where that 8-bit mantissa is catastrophic
    (measured: the N=1e5 hierarchical log-likelihood lands 9% off truth
    under DEFAULT and 9e-4 off under HIGHEST). Precision is baked into
    the jaxpr at trace time, so the policy sticks through
    jit/vmap/grad/checkpoint.

    The mode is overridable with ``GEORGE_TPU_MATMUL_PRECISION`` for
    experiments only — the lever is measured DEAD on a v5e: ``high``
    (3-pass bfloat16 compensation) with every conditioning-critical
    block pinned to ``highest`` via :func:`pinned_full_precision` (the
    ridge interpolation gram AND its projected solve, the SMW core
    assembly/inversion, the leaf factorization) still lands 1.51e-3 off
    the N=1e5 anchor AND times 18.5 evals/s vs 23.7 at ``highest``
    (round-4 on-chip pair) — at skeleton rank ~12 the sweeps are
    bandwidth/overhead-bound, not MXU-pass-bound. Without the
    interpolation-solve pin ``high`` is catastrophically wrong (5.5e-2).
    The env var is read at CALL (trace) time, so one process can trace
    and compare both modes."""
    import os

    import jax

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        mode = os.environ.get("GEORGE_TPU_MATMUL_PRECISION", "highest")
        with jax.default_matmul_precision(mode):
            return fn(*args, **kwargs)

    return wrapped


def pinned_full_precision(fn):
    """Like :func:`full_precision_matmuls` but NOT overridable: for the
    blocks whose conditioning makes anything below full f32 catastrophic
    (the ridge interpolation solves, SMW core assembly/inversion, leaf
    factorization) even when the experimental env knob relaxes the rest."""
    import jax

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


def multivariate_gaussian_samples(matrix, N, mean=None):
    """Samples from a multivariate Gaussian with covariance ``matrix``.

    Returns shape ``(k,)`` for ``N == 1`` else ``(N, k)`` (reference
    ``utils.py:11-33``).
    """
    if mean is None:
        mean = np.zeros(len(matrix))
    samples = np.random.multivariate_normal(mean, matrix, N)
    if N == 1:
        return samples[0]
    return samples


def numerical_gradient(f, x, dx=1.234e-6):
    g = np.empty_like(x, dtype=float)
    for i in range(len(g)):
        x[i] += dx
        fp = f(x)
        x[i] -= 2 * dx
        fm = f(x)
        x[i] += dx
        g[i] = 0.5 * (fp - fm) / dx
    return g


def check_gradient(obj, *args, **kwargs):
    """Centered-FD validation of a model's ``get_gradient`` (reference
    ``utils.py:71-92``)."""
    eps = kwargs.pop("eps", 1.23e-5)

    grad0 = obj.get_gradient(*args, **kwargs)
    vector = obj.get_parameter_vector()
    for i, v in enumerate(vector):
        vector[i] = v + eps
        obj.set_parameter_vector(vector)
        p = obj.get_value(*args, **kwargs)

        vector[i] = v - eps
        obj.set_parameter_vector(vector)
        m = obj.get_value(*args, **kwargs)

        vector[i] = v
        obj.set_parameter_vector(vector)

        grad = 0.5 * (p - m) / eps
        assert np.allclose(grad0[i], grad), (
            "grad computation failed for '{0}' ({1})".format(
                obj.get_parameter_names()[i], i
            )
        )


def expose_host_cpu():
    """Add a host ``cpu`` backend alongside the accelerator (must run
    before any backend initializes; no-op afterwards or when already
    present). Setup-time numerics that are precision-sensitive — the
    ACA pivot walk in ``solvers.hodlr.select_aca_pivots`` — then run in
    host arithmetic while the compute path keeps the accelerator
    (measured: chip-selected pivots cost 10x in factored-inverse
    residual at N=1e6; round 5)."""
    import jax

    try:
        plats = jax.config.jax_platforms
        if plats and "cpu" not in plats:
            jax.config.update("jax_platforms", plats + ",cpu")
        return True
    except Exception:
        return False
