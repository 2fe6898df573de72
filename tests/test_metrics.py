# -*- coding: utf-8 -*-
"""Metric tests: brute-force oracle over the three metric types (patterned on
reference ``tests/test_metrics.py``)."""

import numpy as np
import pytest

from george_tpu import kernels
from george_tpu.metrics import Metric, Subspace


def _brute_r2(metric_matrix, axes, x1, x2):
    d = (x1 - x2)[axes]
    return d @ np.linalg.solve(metric_matrix, d)


@pytest.mark.parametrize("seed", [42, 7])
def test_isotropic_metric(seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(10, 3)
    k = kernels.ExpSquaredKernel(metric=1.7, ndim=3)
    K = k.get_value(x)
    M = 1.7 * np.eye(3)
    ref = np.array(
        [
            [np.exp(-0.5 * _brute_r2(M, np.arange(3), a, b)) for b in x]
            for a in x
        ]
    )
    assert np.allclose(K, ref)


def test_axis_aligned_metric():
    rng = np.random.RandomState(1)
    x = rng.randn(8, 3)
    diag = np.array([0.5, 1.5, 2.5])
    k = kernels.ExpSquaredKernel(metric=diag, ndim=3)
    M = np.diag(diag)
    ref = np.array(
        [
            [np.exp(-0.5 * _brute_r2(M, np.arange(3), a, b)) for b in x]
            for a in x
        ]
    )
    assert np.allclose(k.get_value(x), ref)


def test_general_metric():
    rng = np.random.RandomState(2)
    x = rng.randn(8, 2)
    M = np.array([[2.0, 0.3], [0.3, 0.7]])
    k = kernels.ExpSquaredKernel(metric=M, ndim=2)
    ref = np.array(
        [
            [np.exp(-0.5 * _brute_r2(M, np.arange(2), a, b)) for b in x]
            for a in x
        ]
    )
    assert np.allclose(k.get_value(x), ref)
    # parameterization round-trips through log-Cholesky
    m = Metric(M, ndim=2)
    assert np.allclose(m.to_matrix(), M)


def test_axes_subspace():
    rng = np.random.RandomState(3)
    x = rng.randn(8, 3)
    k = kernels.ExpSquaredKernel(metric=2.0, ndim=3, axes=[0, 2])
    M = 2.0 * np.eye(2)
    ref = np.array(
        [
            [
                np.exp(-0.5 * _brute_r2(M, np.arange(2), a[[0, 2]], b[[0, 2]]))
                for b in x
            ]
            for a in x
        ]
    )
    assert np.allclose(k.get_value(x), ref)


def test_invalid_metrics():
    with pytest.raises(ValueError):
        Metric(-1.0, ndim=2)
    with pytest.raises(ValueError):
        Metric([1.0, -1.0], ndim=2)
    with pytest.raises(ValueError):
        Metric([1.0, 1.0, 1.0], ndim=2)
    with pytest.raises(ValueError):
        Metric(np.ones((2, 3)), ndim=2)
    with pytest.raises(ValueError):
        Metric(1.0)
    with pytest.raises(ValueError):
        Subspace(2, axes=[0, 5])


def test_metric_copy_constructor():
    m = Metric([1.0, 2.0], ndim=2)
    m2 = Metric(m, ndim=2)
    assert m2.metric_type == 1
    assert np.allclose(m2.get_parameter_vector(), m.get_parameter_vector())
