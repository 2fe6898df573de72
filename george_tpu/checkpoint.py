# -*- coding: utf-8 -*-
"""Checkpoint / resume for long-running inference.

The reference's only persistence is pickling (kernels via spec round-trip,
solvers dropping native state — ``tests/test_pickle.py``); there is no
training-state checkpointing (SURVEY.md §5). Here sampler runs are
resumable: a checkpoint captures walker/chain positions, log-probs, tuned
step size / mass matrix, and the PRNG key, as a plain pytree of arrays.

Orbax is used when available (async, multi-host safe); the fallback is a
self-contained ``.npz``. Both round-trip through :func:`save` /
:func:`load`.
"""

import os

import numpy as np

__all__ = ["save", "load", "sampler_state", "restore_sampler"]


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, prefix + str(k) + "/"))
    elif isinstance(tree, (list, tuple)):
        flat["__seq__" + prefix] = np.asarray(
            [len(tree)], dtype=np.int64
        )
        for i, v in enumerate(tree):
            flat.update(_flatten(v, prefix + str(i) + "/"))
    else:
        flat[prefix.rstrip("/")] = np.asarray(tree)
    return flat


def _unflatten(flat):
    # rebuild nested dicts; sequences are restored as lists
    root = {}
    seqs = set()
    for key in list(flat):
        if key.startswith("__seq__"):
            seqs.add(key[len("__seq__"):].rstrip("/"))
    for key, val in flat.items():
        if key.startswith("__seq__"):
            continue
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node, path=""):
        if isinstance(node, dict):
            fixed = {k: fix(v, path + k + "/") for k, v in node.items()}
            if path.rstrip("/") in seqs or (
                fixed and all(k.isdigit() for k in fixed)
                and path.rstrip("/") in seqs
            ):
                return [fixed[str(i)] for i in range(len(fixed))]
            return fixed
        return node

    return fix(root)


def save(path, state):
    """Persist a pytree-of-arrays checkpoint at ``path``."""
    state = _flatten(_to_numpy(state))
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, state, force=True)
        return path
    except Exception:
        path = path if path.endswith(".npz") else path + ".npz"
        np.savez(path, **state)
        return path


def load(path):
    """Load a checkpoint previously written by :func:`save`."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        flat = dict(ckptr.restore(path))
    else:
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
        with np.load(path, allow_pickle=False) as data:
            flat = {k: data[k] for k in data.files}
    return _unflatten(flat)


def _to_numpy(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_numpy(v) for v in tree]
    return np.asarray(tree)


def sampler_state(walkers, log_probs, key, step=0, step_size=None,
                  inv_mass=None, extras=None):
    """Canonical sampler checkpoint layout."""
    state = {
        "walkers": np.asarray(walkers),
        "log_probs": np.asarray(log_probs),
        "key": np.asarray(key),
        "step": np.asarray(step, dtype=np.int64),
    }
    if step_size is not None:
        state["step_size"] = np.asarray(step_size)
    if inv_mass is not None:
        state["inv_mass"] = np.asarray(inv_mass)
    if extras:
        state["extras"] = _to_numpy(extras)
    return state


def restore_sampler(path):
    """Load a sampler checkpoint; returns the state dict."""
    return load(path)
