# -*- coding: utf-8 -*-
"""Multi-device tests on the virtual 8-device CPU mesh (the multi-host
test strategy the reference lacks — SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from george_tpu import GP, kernels
from george_tpu import parallel


needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)


@needs_devices
def test_sharded_nuts_gaussian():
    mesh = parallel.chain_mesh()
    ndev = mesh.devices.size

    def log_prob(theta):
        return -0.5 * jnp.sum(theta ** 2)

    nchains = 2 * ndev
    p0 = np.random.default_rng(0).standard_normal((nchains, 3))
    samples, stats = parallel.sharded_sample_nuts(
        mesh, jax.random.PRNGKey(0), log_prob, p0,
        num_warmup=200, num_samples=300, max_depth=6,
    )
    flat = np.asarray(samples).reshape(-1, 3)
    assert np.allclose(flat.mean(0), 0.0, atol=0.12)
    assert np.allclose(flat.std(0), 1.0, atol=0.15)


@needs_devices
def test_sharded_matches_unsharded_ensemble():
    """Sharded and unsharded ensemble runs are bitwise-identical — the
    sharding only changes placement, not semantics."""
    from george_tpu.sampling import run_ensemble

    mesh = parallel.chain_mesh()
    ndev = mesh.devices.size

    icov = jnp.asarray(np.linalg.inv(np.array([[2.0, 0.3], [0.3, 0.5]])))

    def log_prob(theta):
        return -0.5 * theta @ icov @ theta

    batched = jax.vmap(log_prob)
    nw = 4 * ndev
    p0 = jnp.asarray(np.random.default_rng(1).standard_normal((nw, 2)))

    chain_u, logp_u, _ = run_ensemble(
        jax.random.PRNGKey(2), p0, batched, 50
    )
    chain_s, logp_s, _ = parallel.sharded_run_ensemble(
        mesh, jax.random.PRNGKey(2), p0, batched, 50
    )
    assert np.allclose(np.asarray(chain_u), np.asarray(chain_s), atol=1e-12)
    assert np.allclose(np.asarray(logp_u), np.asarray(logp_s), atol=1e-12)


@needs_devices
def test_sharded_predict_matches_host():
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 10, 80))
    y = np.sin(x) + 0.1 * rng.standard_normal(80)
    gp = GP(1.0 * kernels.ExpSquaredKernel(1.0))
    gp.compute(x, 0.1)

    t = np.linspace(0, 10, 101)  # deliberately not divisible by 8
    mu_ref, var_ref = gp.predict(y, t, return_var=True)

    mesh = parallel.chain_mesh()
    mu, var = parallel.sharded_predict(mesh, gp, y, t)
    assert np.allclose(mu, mu_ref, atol=1e-8)
    assert np.allclose(var, var_ref, atol=1e-8)


@needs_devices
@pytest.mark.parametrize("solver_kwargs", [
    dict(),                                           # hierarchical
    dict(sym=True),                                   # symmetric cascade
])
def test_sharded_predict_hodlr(solver_kwargs):
    """sharded_predict through the hierarchical solver's device solve
    (both factorizations) matches gp.predict."""
    from george_tpu.solvers import HODLRSolver

    rng = np.random.default_rng(4)
    x = np.sort(rng.uniform(0, 20, 300))
    y = np.sin(x) + 0.1 * rng.standard_normal(300)
    gp = GP(1.0 * kernels.ExpSquaredKernel(1.5), solver=HODLRSolver,
            min_size=64, rank=48, **solver_kwargs)
    gp.compute(x, 0.1)

    t = np.linspace(0, 20, 101)
    mu_ref, var_ref = gp.predict(y, t, return_var=True)
    mesh = parallel.chain_mesh()
    mu, var = parallel.sharded_predict(mesh, gp, y, t)
    assert np.allclose(mu, mu_ref, atol=1e-6)
    assert np.allclose(var, var_ref, atol=1e-6)


@needs_devices
def test_sharded_predict_sparse():
    """sharded_predict through the compact-support sparse solver's CG
    apply matches gp.predict."""
    from george_tpu.solvers import SparseSolver
    from george_tpu.kernels import WendlandC2Kernel

    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(0, 30, 300))
    y = np.sin(0.5 * x) + 0.1 * rng.standard_normal(300)
    base = 1.0 * kernels.ExpSquaredKernel(2.0)
    gp = GP(WendlandC2Kernel(log_rc=np.log(4.0), kernel_base=base),
            solver=SparseSolver)
    gp.compute(x, 0.2)

    t = np.linspace(0, 30, 101)
    mu_ref, var_ref = gp.predict(y, t, return_var=True)
    mesh = parallel.chain_mesh()
    mu, var = parallel.sharded_predict(mesh, gp, y, t)
    assert np.allclose(mu, mu_ref, atol=1e-6)
    assert np.allclose(var, var_ref, atol=1e-6)


@needs_devices
def test_shard_chains_placement():
    mesh = parallel.chain_mesh()
    arr = np.zeros((4 * mesh.devices.size, 7))
    sharded = parallel.shard_chains(mesh, arr)
    assert sharded.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("chains", None)
        ),
        ndim=2,
    )


@needs_devices
def test_hodlr_mesh_sharded_gp():
    """The hierarchical solver distributes by input sharding alone: GSPMD
    partitions the level-batched factorization over a row-sharded mesh and
    the full GP (likelihood, gradient, prediction) matches the unsharded
    run — the multi-chip large-N configuration (BASELINE config #5 shape)."""
    from george_tpu import HODLRSolver

    rng = np.random.default_rng(21)
    n = 2000
    x = np.sort(rng.uniform(0, 60, n))
    y = np.sin(0.5 * x) + 0.3 * rng.standard_normal(n)

    gp0 = GP(1.0 * kernels.ExpSquaredKernel(4.0), solver=HODLRSolver,
             min_size=64, rank=24)
    gp0.compute(x, 0.3)
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    gp1 = GP(1.0 * kernels.ExpSquaredKernel(4.0), solver=HODLRSolver,
             min_size=64, rank=24, mesh=mesh)
    gp1.compute(x, 0.3)

    assert abs(gp0.log_likelihood(y) - gp1.log_likelihood(y)) < 1e-6
    assert np.allclose(
        gp0.grad_log_likelihood(y), gp1.grad_log_likelihood(y), atol=1e-6
    )
    t = np.linspace(0, 60, 50)
    mu0, v0 = gp0.predict(y, t, return_var=True)
    mu1, v1 = gp1.predict(y, t, return_var=True)
    assert np.allclose(mu0, mu1, atol=1e-8)
    assert np.allclose(v0, v1, atol=1e-8)


@needs_devices
def test_sharded_predict_hmatrix():
    """sharded_predict through the strong-admissibility solver's
    preconditioned-CG device solve matches gp.predict."""
    from george_tpu.solvers import HMatrixSolver

    rng = np.random.default_rng(6)
    x = rng.uniform(0, 10, (500, 2))
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(500)
    gp = GP(1.0 * kernels.ExpSquaredKernel([1.5, 1.5], ndim=2),
            solver=HMatrixSolver, min_size=64, rank=16, precond_rank=64)
    gp.compute(x, 0.1)

    t = rng.uniform(0, 10, (101, 2))
    mu_ref, var_ref = gp.predict(y, t, return_var=True)
    mesh = parallel.chain_mesh()
    mu, var = parallel.sharded_predict(mesh, gp, y, t)
    assert np.allclose(mu, mu_ref, atol=1e-6)
    assert np.allclose(var, var_ref, atol=1e-6)


@needs_devices
def test_sharded_dense_mass_nuts_matches_unsharded():
    """Dense-mass NUTS sharded over the chain mesh matches the
    unsharded run to reduction-reordering precision: the
    pooled-covariance einsum, the Cholesky refresh, and the median
    step-size clip all reduce over the sharded chain axis purely via
    collectives (psum partial-sum order is the only difference;
    measured drift ~5e-10 over 250 f64 steps)."""
    from george_tpu.sampling import sample_nuts

    mesh = parallel.chain_mesh()
    ndev = mesh.devices.size
    rng = np.random.default_rng(3)
    A = rng.standard_normal((4, 4))
    prec = jnp.asarray(np.linalg.inv(A @ A.T + 0.3 * np.eye(4)))

    def log_prob(q):
        return -0.5 * q @ (prec @ q)

    p0 = rng.standard_normal((2 * ndev, 4))
    s_ref, st_ref = sample_nuts(
        jax.random.PRNGKey(5), log_prob, jnp.asarray(p0),
        num_warmup=150, num_samples=100, max_depth=6, dense_mass=True,
    )
    s_sh, st_sh = parallel.sharded_sample_nuts(
        mesh, jax.random.PRNGKey(5), log_prob, p0,
        num_warmup=150, num_samples=100, max_depth=6, dense_mass=True,
    )
    assert np.allclose(np.asarray(s_ref), np.asarray(s_sh),
                       rtol=0.0, atol=1e-6)
    assert np.allclose(
        np.asarray(st_ref["step_size"]), np.asarray(st_sh["step_size"]),
        rtol=1e-9,
    )
    assert np.allclose(
        np.asarray(st_ref["inv_mass"]["sigma"]),
        np.asarray(st_sh["inv_mass"]["sigma"]), rtol=0.0, atol=1e-12,
    )
