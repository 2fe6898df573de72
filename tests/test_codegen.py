# -*- coding: utf-8 -*-
"""Codegen stability: regenerating from the YAML specs reproduces the
checked-in sources exactly.

This guards against the reference's central maintenance flaw: its
generated sources were hand-edited after generation, so re-running codegen
would destroy features (SURVEY.md §2.3 drift warning). Here regeneration
must always be a no-op."""

import os
import subprocess
import sys


def test_codegen_is_stable(tmp_path):
    import george_tpu.kernels.codegen as cg

    with open(cg.OUTPUT) as f:
        checked_in = f.read()

    out = tmp_path / "generated.py"
    cg.generate(output=str(out))

    with open(out) as f:
        regenerated = f.read()
    assert regenerated == checked_in


def test_codegen_cli_runs():
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "-m", "george_tpu.kernels.codegen", "--check"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
