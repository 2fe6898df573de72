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
        sys.argv = ["multioutput.py"]
        runpy.run_path("examples/multioutput.py", run_name="__main__")
    finally:
        sys.argv = argv
