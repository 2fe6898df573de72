# -*- coding: utf-8 -*-
"""Reference-surface compatibility: the exact keyword sets george code
passes must construct and run (flag parity, SURVEY.md §5 config table)."""

import numpy as np
import pytest

from george_tpu import GP, kernels, BasicSolver, HODLRSolver, TrivialSolver


def _xy(n=150, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 10, n))
    y = np.sin(x) + 0.1 * rng.standard_normal(n)
    return x, y


def test_hodlr_reference_kwargs():
    """The reference HODLR kwarg set (``hodlr.py:43`` there) is accepted."""
    x, y = _xy()
    gp = GP(
        1.0 * kernels.ExpSquaredKernel(1.0),
        solver=HODLRSolver,
        min_size=100, tol=1e-8, tol_abs=1e-10, verbose=0, debug=0,
        compute_grad=0, sym=0, knn=25, seed=42,
    )
    gp.compute(x, 0.1)
    assert np.isfinite(gp.log_likelihood(y))
    assert np.all(np.isfinite(gp.grad_log_likelihood(y)))


def test_hodlr_compute_grad_flag_selects_hutchinson():
    """``compute_grad=1`` (the reference's matrix-free-gradient flag)
    activates the Hutchinson mode."""
    x, y = _xy()
    gp = GP(1.0 * kernels.ExpSquaredKernel(1.0), solver=HODLRSolver,
            compute_grad=1, num_probes=32)
    gp.compute(x, 0.1)
    assert gp.solver.matrix_free
    assert np.all(np.isfinite(gp.grad_log_likelihood(y)))


def test_trivial_solver_empty_kernel():
    """No kernel -> TrivialSolver, diagonal-only model (reference
    ``gp.py:126-131``)."""
    x, y = _xy(50)
    gp = GP()
    assert gp.solver_type is TrivialSolver
    gp.compute(x, 0.3)
    ll = gp.log_likelihood(y)
    # closed form: independent Gaussians
    expected = -0.5 * np.sum(
        y ** 2 / (0.09 + 1.25e-12) + np.log(2 * np.pi * (0.09 + 1.25e-12))
    )
    assert np.isclose(ll, expected, rtol=1e-6)


def test_deprecated_lnlikelihood_warns():
    x, y = _xy(40)
    gp = GP(kernels.ExpSquaredKernel(1.0))
    gp.compute(x, 0.1)
    with pytest.warns(DeprecationWarning):
        v = gp.lnlikelihood(y)
    assert np.isfinite(v)
    with pytest.warns(DeprecationWarning):
        g = gp.grad_lnlikelihood(y)
    assert np.all(np.isfinite(g))


def test_fit_adam_multistart():
    from george_tpu.sampling import fit_adam
    import jax.numpy as jnp

    def log_prob(theta):
        return -0.5 * jnp.sum((theta - jnp.asarray([1.0, -2.0])) ** 2)

    starts = np.random.default_rng(0).standard_normal((4, 2))
    thetas, trace = fit_adam(log_prob, starts, num_steps=300,
                             learning_rate=0.1)
    assert thetas.shape == (4, 2)
    assert np.allclose(np.asarray(thetas), [1.0, -2.0], atol=0.05)


def test_solver_get_full_parity():
    """``get_full`` reconstructions match across solvers (reference
    debug surface, ``basic.py:312`` / ``_hodlr.cpp``)."""
    x, y = _xy(120)
    k1 = 1.0 * kernels.ExpSquaredKernel(1.0)
    gp_b = GP(k1, solver=BasicSolver)
    gp_b.compute(x, 0.1)
    full_b = gp_b.solver.get_full()

    gp_h = GP(1.0 * kernels.ExpSquaredKernel(1.0), solver=HODLRSolver,
              min_size=64, rank=48)
    gp_h.compute(x, 0.1)
    full_h = gp_h.solver.get_full()
    assert np.allclose(full_b, full_h, atol=1e-6)


def test_base_kernel_classes_importable():
    """The reference exposes BaseXKernel Model stubs alongside each
    kernel class (``src/george/kernels.py:295-360``)."""
    from george_tpu.kernels import (  # noqa: F401
        BaseExpSquaredKernel,
        BaseMatern32Kernel,
        BaseConstantKernel,
        BaseLCMKernel,
        BaseWendlandC2Kernel,
    )
    from george_tpu.modeling import Model

    assert issubclass(BaseExpSquaredKernel, Model)
    assert BaseExpSquaredKernel().full_size == 0
    assert BaseConstantKernel(log_constant=0.5).full_size == 1


def test_neighbors_to_csr_roundtrip():
    """``Kernel.neighbors_to_csr`` flattens ragged BallTree-style output
    (reference ``kernels.py:107-123``) and the sparse path accepts it."""
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 10, 80))
    k = kernels.WendlandC2Kernel(
        log_rc=np.log(1.5), kernel_base=kernels.ExpSquaredKernel(metric=1.0)
    )
    ragged = [
        np.flatnonzero(np.abs(x - xi) < 1.5) for xi in x
    ]
    nbr_idx, row_ptr = k.neighbors_to_csr(np.array(ragged, dtype=object))
    assert row_ptr[0] == 0 and row_ptr[-1] == nbr_idx.size
    np.testing.assert_array_equal(np.diff(row_ptr),
                                  [len(r) for r in ragged])

    dense = k.get_value(x)
    sparse_tuple = k.get_value(x, nns=(nbr_idx, row_ptr)).toarray()
    sparse_ragged = k.get_value(
        x, nns=np.array(ragged, dtype=object)
    ).toarray()
    np.testing.assert_allclose(sparse_tuple, dense, atol=1e-12)
    np.testing.assert_allclose(sparse_ragged, dense, atol=1e-12)
