# -*- coding: utf-8 -*-
"""Auxiliary subsystems: diagnostics timing/report, checkpoint round-trip,
sampler resume (the reference had neither — SURVEY.md §5)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from george_tpu import GP, kernels, diagnostics, checkpoint
from george_tpu.sampling import EnsembleSampler, run_ensemble


def test_timer_registry():
    diagnostics.reset()
    with diagnostics.timer("unit.test") as tm:
        tm.sync(jnp.ones(8) * 2)
    with diagnostics.timer("unit.test"):
        pass
    rep = diagnostics.report()
    assert rep["unit.test"]["count"] == 2
    assert rep["unit.test"]["total_s"] >= rep["unit.test"]["best_s"]
    diagnostics.reset()
    assert diagnostics.report() == {}


def test_hodlr_verbose_registers_span(capsys):
    from george_tpu import HODLRSolver

    diagnostics.reset()
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 200))[:, None]
    s = HODLRSolver(1.0 * kernels.ExpSquaredKernel(1.0), min_size=64,
                    rank=16, verbose=True)
    s.compute(x, 0.1 * np.ones(200))
    assert "hodlr.compute" in diagnostics.report()
    assert "hodlr.compute" in capsys.readouterr().out


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "walkers": np.random.default_rng(0).standard_normal((8, 3)),
        "log_probs": np.arange(8.0),
        "key": np.asarray(jax.random.PRNGKey(7)),
        "step": np.asarray(123, dtype=np.int64),
        "nested": {"a": np.ones(2), "b": [np.zeros(1), np.full(2, 5.0)]},
    }
    path = checkpoint.save(str(tmp_path / "ck"), state)
    restored = checkpoint.load(path)
    assert np.array_equal(restored["walkers"], state["walkers"])
    assert np.array_equal(restored["log_probs"], state["log_probs"])
    assert np.array_equal(restored["key"], state["key"])
    assert int(restored["step"]) == 123
    assert np.array_equal(restored["nested"]["a"], np.ones(2))
    assert np.array_equal(restored["nested"]["b"][1], np.full(2, 5.0))


def test_sampler_checkpoint_resume(tmp_path):
    """Stopping + resuming an ensemble run gives the same distribution of
    draws as a straight-through run (resume correctness smoke)."""
    icov = jnp.asarray(np.linalg.inv(np.array([[1.0, 0.3], [0.3, 2.0]])))

    def log_prob(theta):
        return -0.5 * theta @ icov @ theta

    batched = jax.vmap(log_prob)
    nw = 32
    rng = np.random.default_rng(1)
    p0 = jnp.asarray(rng.standard_normal((nw, 2)))

    # run 100 steps, checkpoint, resume for 100 more
    chain1, logp1, _ = run_ensemble(jax.random.PRNGKey(0), p0, batched, 100)
    state = checkpoint.sampler_state(
        chain1[-1], logp1[-1], jax.random.PRNGKey(42), step=100
    )
    path = checkpoint.save(str(tmp_path / "sampler"), state)
    restored = checkpoint.restore_sampler(path)
    assert int(restored["step"]) == 100
    chain2, logp2, _ = run_ensemble(
        jax.random.PRNGKey(int(restored["step"])),
        jnp.asarray(restored["walkers"]), batched, 400,
    )
    flat = np.asarray(chain2[200:]).reshape(-1, 2)
    assert np.abs(flat.mean(0)).max() < 0.2
    assert np.allclose(
        np.cov(flat.T), np.linalg.inv(np.asarray(icov)), atol=0.4
    )
