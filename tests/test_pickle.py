# -*- coding: utf-8 -*-
"""Serialization round-trips (patterned on reference ``tests/test_pickle.py``)."""

import pickle

import numpy as np
import pytest

from george_tpu import GP, kernels
from george_tpu.solvers import BasicSolver


def _data(n=30, seed=42):
    rng = np.random.RandomState(seed)
    x = np.sort(rng.rand(n)) * 10
    yerr = 0.1 * np.ones(n)
    y = np.sin(x)
    return x, y, yerr


def test_kernel_pickle():
    k = 0.7 * kernels.ExpSquaredKernel(metric=1.5) + kernels.ExpSine2Kernel(
        gamma=0.3, log_period=0.5
    )
    k2 = pickle.loads(pickle.dumps(k))
    x = np.random.RandomState(0).randn(6, 1)
    assert np.allclose(k.get_value(x), k2.get_value(x))
    assert k.get_parameter_names() == k2.get_parameter_names()


@pytest.mark.parametrize("computed", [False, True])
def test_gp_pickle(computed):
    x, y, yerr = _data()
    gp = GP(kernels.ExpSquaredKernel(metric=1.0), solver=BasicSolver)
    if computed:
        gp.compute(x, yerr)
        ll = gp.log_likelihood(y)
    blob = pickle.dumps(gp)
    gp2 = pickle.loads(blob)
    if computed:
        # The dense factor pickles; the likelihood is reusable immediately.
        assert np.allclose(gp2.log_likelihood(y), ll)
    gp2.compute(x, yerr)
    gp.compute(x, yerr)
    assert np.allclose(gp2.log_likelihood(y), gp.log_likelihood(y))


def test_solver_pickle_after_device_state():
    """Every large-N solver pickles after compute() AND after the lazy
    jitted caches (apply_sqrt, mesh structures) have been populated."""
    import jax
    from jax.sharding import Mesh
    from george_tpu import kernels
    from george_tpu.solvers import SparseSolver, HODLRSolver, HMatrixSolver

    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(0, 10, 128))

    kw = kernels.WendlandC2Kernel(
        log_rc=np.log(1.5), kernel_base=kernels.ExpSquaredKernel(metric=1.0)
    )
    sp = SparseSolver(kw)
    sp.compute(x, 0.1)
    sp.apply_sqrt(np.ones(128))        # populates _sqrt_batch
    sp2 = pickle.loads(pickle.dumps(sp))
    assert not sp2.computed

    k = kernels.ExpSquaredKernel(metric=1.0)
    hs = HODLRSolver(k, min_size=32, rank=8,
                     mesh=Mesh(np.array(jax.devices()[:8]), ("data",)))
    hs.compute(x, 0.1)
    hs.apply_sqrt(np.ones(128))        # populates _sym_factors/_sqrt_fn
    hs2 = pickle.loads(pickle.dumps(hs))
    assert not hs2.computed

    x2 = rng.uniform(0, 10, (128, 2))
    k2 = kernels.ExpSquaredKernel(metric=[1.0, 1.0], ndim=2)
    hm = HMatrixSolver(k2, min_size=32, rank=8)
    hm.compute(x2, 0.1)
    hm.apply_sqrt(np.ones(128))        # populates _sqrt_fns
    hm2 = pickle.loads(pickle.dumps(hm))
    assert not hm2.computed
