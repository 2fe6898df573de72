# -*- coding: utf-8 -*-
"""The tutorial examples run end-to-end (the reference ships tutorial
parity tests, ``tests/test_tutorial.py``)."""

import runpy
import sys


def test_first_example():
    argv = sys.argv
    try:
        sys.argv = ["first.py"]
        runpy.run_path("examples/first.py", run_name="__main__")
    finally:
        sys.argv = argv


def test_scaling_example():
    argv = sys.argv
    try:
        sys.argv = ["scaling.py", "700"]
        runpy.run_path("examples/scaling.py", run_name="__main__")
    finally:
        sys.argv = argv


def test_multioutput_example():
    argv = sys.argv
    try:
        # the at-scale section defaults to n=10,000; keep the suite fast
        sys.argv = ["multioutput.py", "3000"]
        runpy.run_path("examples/multioutput.py", run_name="__main__")
    finally:
        sys.argv = argv


def test_model_example():
    """Non-linear mean model + GP noise (reference model.rst workflow)."""
    argv = sys.argv
    try:
        sys.argv = ["model.py"]
        runpy.run_path("examples/model.py", run_name="__main__")
    finally:
        sys.argv = argv


def test_mixture_example():
    """Mixture-of-GPs component separation (reference mixture.rst)."""
    argv = sys.argv
    try:
        sys.argv = ["mixture.py"]
        runpy.run_path("examples/mixture.py", run_name="__main__")
    finally:
        sys.argv = argv


def test_bayesopt_example():
    """The Bayesian-optimization surrogate loop converges to the global
    minimum (the example asserts location and evaluation budget)."""
    argv = sys.argv
    try:
        sys.argv = ["bayesopt.py"]
        runpy.run_path("examples/bayesopt.py", run_name="__main__")
    finally:
        sys.argv = argv


def test_hyper_example():
    """The full optimizer+sampler workflow example stays runnable."""
    argv = sys.argv
    try:
        sys.argv = ["hyper.py", "--smoke"]
        runpy.run_path("examples/hyper.py", run_name="__main__")
    finally:
        sys.argv = argv


def test_spatial_example():
    """2-D strong-admissibility workflow (examples/spatial.py)."""
    argv = sys.argv
    try:
        sys.argv = ["spatial.py", "1200"]
        runpy.run_path("examples/spatial.py", run_name="__main__")
    finally:
        sys.argv = argv
