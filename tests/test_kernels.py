# -*- coding: utf-8 -*-
"""Kernel-zoo tests: FD oracles for hyperparameter and input gradients across
30+ instances (patterned on reference ``tests/test_kernels.py:19-128``)."""

import numpy as np
import pytest

from george_tpu import kernels


def _instances():
    ks = [
        kernels.ConstantKernel(log_constant=0.1),
        kernels.DotProductKernel(),
        kernels.CosineKernel(log_period=1.0),
        kernels.ExpSine2Kernel(gamma=0.4, log_period=1.0),
        kernels.LocalGaussianKernel(location=0.5, log_width=0.1),
        kernels.LinearKernel(log_gamma2=0.3, order=2),
        kernels.PolynomialKernel(log_sigma2=0.2, order=2),
        kernels.EmptyKernel(),
    ]
    # stationary kernels over metric variations
    for cls in [
        kernels.ExpSquaredKernel,
        kernels.ExpKernel,
        kernels.Matern32Kernel,
        kernels.Matern52Kernel,
    ]:
        ks.append(cls(metric=1.0, ndim=1))
        ks.append(cls(metric=0.5, ndim=2))
        ks.append(cls(metric=[0.5, 1.5], ndim=2))
        ks.append(
            cls(metric=np.array([[1.0, 0.2], [0.2, 2.0]]), ndim=2)
        )
        ks.append(cls(metric=1.0, ndim=3, axes=[0, 2]))
    ks.append(kernels.RationalQuadraticKernel(log_alpha=0.3, metric=1.2))
    ks.append(
        kernels.RationalQuadraticKernel(
            log_alpha=0.3, metric=[0.5, 2.0], ndim=2
        )
    )
    # composition
    ks.append(
        kernels.ExpSquaredKernel(metric=1.0)
        + kernels.Matern32Kernel(metric=2.0)
    )
    ks.append(
        kernels.ExpSquaredKernel(metric=1.0)
        * kernels.ExpSine2Kernel(gamma=0.3, log_period=0.5)
    )
    ks.append(3.0 * kernels.Matern52Kernel(metric=0.7))
    ks.append(1.0 + kernels.ExpKernel(metric=1.3))
    # block
    ks.append(
        kernels.ExpSquaredKernel(metric=1.0, block=[(-0.2, 0.7)])
    )
    # compact support + multi-output
    ks.append(
        kernels.WendlandC2Kernel(
            log_rc=np.log(1.0),
            kernel_base=kernels.ExpSquaredKernel(metric=0.5),
            ndim=1,
        )
    )
    ks.append(
        kernels.LCMKernel(
            logBK=np.log([1.0, 2.0, 0.5, 0.4]),
            children=[kernels.ExpSquaredKernel(metric=1.0)],
            T=2,
            Q=1,
            ndim=1,
        )
    )
    return ks


KERNELS = _instances()


def _points(kernel, n=6, seed=123):
    rng = np.random.RandomState(seed)
    if kernel.kernel_type == 13:
        x = rng.randn(n, kernel.ndim)
        t = rng.randint(0, kernel.T, (n, 1)).astype(float)
        return np.concatenate([x, t], axis=1)
    return rng.randn(n, kernel.ndim)


@pytest.mark.parametrize(
    "kernel", KERNELS, ids=[repr(k)[:60] for k in KERNELS]
)
def test_hyper_gradient(kernel):
    x = _points(kernel)
    kernel.test_gradient(x, atol=1e-7)


@pytest.mark.parametrize(
    "kernel",
    [k for k in KERNELS if k.kernel_type not in (13,)],
    ids=[repr(k)[:60] for k in KERNELS if k.kernel_type not in (13,)],
)
def test_input_gradients(kernel):
    # Distinct x1/x2 avoid the coincident-point kink of |r| kernels.
    x1 = _points(kernel, n=5, seed=1)
    x2 = _points(kernel, n=4, seed=2)
    kernel.test_x1_gradient(x1, x2=x2)
    kernel.test_x2_gradient(x1, x2=x2)


def test_values_match_closed_form():
    rng = np.random.RandomState(0)
    x = rng.randn(7, 1)
    d = x[:, None, 0] - x[None, :, 0]
    checks = [
        (kernels.ExpSquaredKernel(metric=1.0), np.exp(-0.5 * d**2)),
        (kernels.ExpKernel(metric=1.0), np.exp(-np.abs(d))),
        (
            kernels.Matern32Kernel(metric=1.0),
            (1 + np.sqrt(3) * np.abs(d)) * np.exp(-np.sqrt(3) * np.abs(d)),
        ),
        (
            kernels.CosineKernel(log_period=0.0),
            np.cos(2 * np.pi * d),
        ),
        (kernels.DotProductKernel(), x[:, 0:1] * x[None, :, 0]),
    ]
    for k, ref in checks:
        assert np.allclose(k.get_value(x), ref), repr(k)


def test_composition_values():
    rng = np.random.RandomState(0)
    x = rng.randn(6, 1)
    k1 = kernels.ExpSquaredKernel(metric=1.0)
    k2 = kernels.Matern32Kernel(metric=2.0)
    assert np.allclose(
        (k1 + k2).get_value(x), k1.get_value(x) + k2.get_value(x)
    )
    assert np.allclose(
        (k1 * k2).get_value(x), k1.get_value(x) * k2.get_value(x)
    )
    assert np.allclose((2.0 * k1).get_value(x), 2.0 * k1.get_value(x))
    assert np.allclose((1.0 + k1).get_value(x), 1.0 + k1.get_value(x))


def test_invalid_metric_spec():
    with pytest.raises(ValueError):
        kernels.ExpSquaredKernel(metric="invalid", ndim=2)
    with pytest.raises(ValueError):
        kernels.ExpSquaredKernel(metric=[1.0], ndim=2)
    with pytest.raises(ValueError):
        kernels.Sum(
            kernels.ExpSquaredKernel(metric=1.0, ndim=1),
            kernels.ExpSquaredKernel(metric=1.0, ndim=2),
        )


def test_diag_consistency():
    rng = np.random.RandomState(0)
    x = rng.randn(6, 1)
    k = kernels.ExpSquaredKernel(metric=1.0) * kernels.ExpSine2Kernel(
        gamma=0.3, log_period=0.5
    )
    assert np.allclose(k.get_value(x, diag=True), np.diag(k.get_value(x)))


def test_sparse_matches_dense():
    rng = np.random.RandomState(5)
    x = np.sort(rng.rand(40))[:, None] * 10
    k = kernels.WendlandC2Kernel(
        log_rc=np.log(1.5),
        kernel_base=kernels.Matern32Kernel(metric=1.0),
        ndim=1,
    )
    dense = k.get_value(x)
    sparse = k.get_value(x, nns=True)
    assert sparse.nnz < 40 * 40
    assert np.allclose(sparse.toarray(), dense)


def test_parameter_freeze_in_gradient():
    k = kernels.ExpSine2Kernel(gamma=0.4, log_period=1.0)
    x = np.random.RandomState(0).randn(5, 1)
    g_full = k.get_gradient(x)
    k.freeze_parameter("gamma")
    g_frozen = k.get_gradient(x)
    assert g_full.shape[2] == 2 and g_frozen.shape[2] == 1
    assert np.allclose(g_frozen[:, :, 0], g_full[:, :, 1])
