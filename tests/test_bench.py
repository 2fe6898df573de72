# -*- coding: utf-8 -*-
"""Driver contract: bench.py prints exactly one valid JSON line and the
graft entry points stay importable."""

import io
import json
import runpy
import sys
from contextlib import redirect_stdout


def test_bench_emits_json_line():
    import os

    argv = sys.argv
    buf = io.StringIO()
    # run the measurement in-process (the default entry wraps it in a
    # watchdog subprocess with a CPU fallback for dead-accelerator runs)
    os.environ["GEORGE_TPU_BENCH_CHILD"] = "1"
    try:
        sys.argv = ["bench.py", "2000"]
        with redirect_stdout(buf):
            runpy.run_path("bench.py", run_name="__main__")
    finally:
        sys.argv = argv
        os.environ.pop("GEORGE_TPU_BENCH_CHILD", None)
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1
    record = json.loads(lines[0])
    # required driver contract keys, plus whatever provenance fields
    # the bench adds (precision tier, per-repeat spread, anchor error)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(record)
    assert record["value"] > 0
    assert record["unit"] == "evals/s"
    assert all(t > 0 for t in record.get("spread_s_per_eval", [1]))


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    assert callable(fn)
    assert isinstance(args, tuple)
    assert callable(g.dryrun_multichip)
