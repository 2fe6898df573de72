# -*- coding: utf-8 -*-
"""Assemble the round-4 evidence artifact (BENCH_extra_r04.json).

Collects the last JSON line of every ``benchmarks/results_r04/*.out``
(the on-chip measurement runs; *.out is gitignored as scratch, the
assembled artifact is the committed record) plus free-form notes, and
writes one JSON document keyed by run name.

Usage::

    python benchmarks/assemble_r04.py
"""

import glob
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(HERE, "results_r04")


def last_json_line(path):
    rec = None
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{"):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
    return rec


def main():
    runs = {}
    for path in sorted(glob.glob(os.path.join(OUT, "*.out"))):
        name = os.path.basename(path)[:-4]
        rec = last_json_line(path)
        if rec is not None:
            runs[name] = rec
    doc = {
        "round": 4,
        "hardware": "1x TPU v5e (serving tunnel)",
        "runs": runs,
    }
    dest = os.path.join(ROOT, "BENCH_extra_r04.json")
    with open(dest, "w") as fh:
        json.dump(doc, fh, indent=2, sort_keys=True)
        fh.write("\n")
    print("wrote", dest, "with", len(runs), "runs")


if __name__ == "__main__":
    main()
