"""The benchmark numbers in README.md / RESULTS.md are GENERATED from
committed artifacts (benchmarks/bench_last.json, benchmarks/scenarios/*) —
one source of truth. A stale hand-edited number fails this test; rerun
``python benchmarks/gen_results_table.py --write`` after refreshing the
artifacts."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_headline_and_scoreboard_in_sync():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks",
                                      "gen_results_table.py"), "--check"],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr + proc.stdout
