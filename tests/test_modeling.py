# -*- coding: utf-8 -*-
"""Modeling-protocol tests (patterned on reference ``tests/test_modeling.py``)."""

import numpy as np
import pytest

from george_tpu.modeling import Model, ModelSet, ConstantModel
from george_tpu.utils import check_gradient


class LinearModel(Model):
    parameter_names = ("m", "b")

    def get_value(self, x):
        return self.m * x + self.b

    def compute_gradient(self, x):
        return np.vstack((x, np.ones_like(x)))


def test_parameter_vector_roundtrip():
    m = LinearModel(0.5, 2.0)
    assert m.full_size == 2
    assert np.allclose(m.get_parameter_vector(), [0.5, 2.0])
    m.set_parameter_vector([1.5, -1.0])
    assert m.m == 1.5 and m.b == -1.0
    assert m.dirty


def test_kwargs_construction_and_missing():
    m = LinearModel(m=1.0, b=2.0)
    assert m.get_parameter_dict()["m"] == 1.0
    with pytest.raises(ValueError):
        LinearModel(m=1.0)
    with pytest.raises(ValueError):
        LinearModel(1.0)
    with pytest.raises(ValueError):
        LinearModel(1.0, 2.0, 3.0)


def test_gradient_fd_oracle():
    m = LinearModel(0.5, 2.0)
    x = np.linspace(-3, 3, 10)
    check_gradient(m, x)


def test_default_fd_gradient():
    class NoGrad(Model):
        parameter_names = ("a",)

        def get_value(self, x):
            return np.exp(self.a * x)

    m = NoGrad(0.3)
    x = np.linspace(0, 1, 5)
    g = m.get_gradient(x)
    assert np.allclose(g[0], x * np.exp(0.3 * x), rtol=1e-4)


def test_freeze_thaw_bookkeeping():
    m = LinearModel(0.5, 2.0)
    assert m.vector_size == 2
    m.freeze_parameter("m")
    assert m.vector_size == 1
    assert m.get_parameter_names() == ("b",)
    assert np.allclose(m.get_parameter_vector(), [2.0])
    m.set_parameter_vector([7.0])
    assert m.m == 0.5 and m.b == 7.0
    m.thaw_parameter("m")
    assert m.vector_size == 2
    m.freeze_all_parameters()
    assert m.vector_size == 0
    m.thaw_all_parameters()
    assert m.vector_size == 2


def test_bounds_log_prior():
    m = LinearModel(0.5, 2.0, bounds=dict(m=(0.0, 1.0)))
    assert np.isfinite(m.log_prior())
    m.m = 2.0
    assert np.isinf(m.log_prior())
    m.m = 0.5
    # list-style bounds
    m2 = LinearModel(0.5, 2.0, bounds=[(0.0, 1.0), (None, None)])
    assert np.isfinite(m2.log_prior())
    with pytest.raises(ValueError):
        LinearModel(2.0, 0.0, bounds=dict(m=(0.0, 1.0)))
    with pytest.raises(ValueError):
        LinearModel(0.5, 2.0, bounds=[(0.0, 1.0)])


def test_modelset_paths():
    ms = ModelSet(
        [("one", LinearModel(0.5, 2.0)), ("two", ConstantModel(3.0))]
    )
    names = ms.get_parameter_names()
    assert names == ("one:m", "one:b", "two:value")
    ms.set_parameter("one:m", 4.0)
    assert ms.models["one"].m == 4.0
    ms.freeze_parameter("two:value")
    assert ms.vector_size == 2
    assert np.allclose(ms.get_parameter_vector(), [4.0, 2.0])
    ms.set_parameter_vector([1.0, 1.5])
    assert np.allclose(
        ms.get_parameter_vector(include_frozen=True), [1.0, 1.5, 3.0]
    )


def test_getitem_setitem():
    m = LinearModel(0.5, 2.0)
    assert m["m"] == 0.5
    m["b"] = 9.0
    assert m.b == 9.0
    assert m[0] == 0.5
