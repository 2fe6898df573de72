# -*- coding: utf-8 -*-
"""Solver tests against dense numpy oracles (patterned on reference
``tests/test_solvers.py``)."""

import numpy as np
import pytest

from george_tpu import kernels
from george_tpu.solvers import BasicSolver, TrivialSolver


def test_trivial_closed_form():
    rng = np.random.RandomState(42)
    x = rng.rand(20, 1)
    yerr = 0.1 + 0.2 * rng.rand(20)
    s = TrivialSolver()
    s.compute(x, yerr)
    assert s.computed
    assert np.allclose(s.log_determinant, np.sum(np.log(yerr**2)))
    y = rng.randn(20)
    assert np.allclose(s.apply_inverse(y), y / yerr**2)
    assert np.allclose(s.dot_solve(y), np.sum(y**2 / yerr**2))


def _oracle(kernel, x, yerr):
    K = kernel.get_value(x)
    K[np.diag_indices_from(K)] += yerr**2
    return K


@pytest.mark.parametrize(
    "kernel",
    [
        kernels.ExpSquaredKernel(metric=1.0),
        0.5 * kernels.Matern32Kernel(metric=2.0)
        + kernels.ExpSine2Kernel(gamma=0.3, log_period=0.5),
    ],
)
def test_basic_vs_numpy(kernel):
    rng = np.random.RandomState(42)
    x = np.sort(rng.rand(60))[:, None] * 8
    yerr = 0.1 + 0.1 * rng.rand(60)
    solver = BasicSolver(kernel)
    solver.compute(x, yerr)

    K = _oracle(kernel, x, yerr)
    sign, logdet = np.linalg.slogdet(K)
    assert sign > 0
    assert np.allclose(solver.log_determinant, logdet)

    y = rng.randn(60)
    assert np.allclose(solver.apply_inverse(y), np.linalg.solve(K, y))
    assert np.allclose(solver.dot_solve(y), y @ np.linalg.solve(K, y))

    # multi-RHS
    Y = rng.randn(60, 3)
    assert np.allclose(solver.apply_inverse(Y), np.linalg.solve(K, Y))

    # full inverse reconstruction
    assert np.allclose(solver.get_inverse(), np.linalg.inv(K), atol=1e-8)

    # apply_sqrt: rows are samples s = z L^T, so cov(s) = R^T R = K
    R = solver.apply_sqrt(np.eye(60))
    assert np.allclose(R.T @ R, K)

    # apply_forward: matvec with K and with dK/dtheta
    assert np.allclose(solver.apply_forward(y, 0), K @ y)
    Kg = kernel.get_gradient(x, include_frozen=True)
    for i in range(Kg.shape[2]):
        assert np.allclose(
            solver.apply_forward(y, i + 1), Kg[:, :, i] @ y
        )


def test_basic_not_positive_definite():
    # A rank-deficient covariance with no jitter must raise LinAlgError.
    k = kernels.ConstantKernel(log_constant=0.0)
    solver = BasicSolver(k)
    x = np.zeros((5, 1))
    with pytest.raises(np.linalg.LinAlgError):
        solver.compute(x, 0.0)
