"""The driver-contract regression gate for bench.py.

BENCH_r04.json shipped with `parsed: null` because the enriched stdout
line outgrew the driver's tail capture (VERDICT r4 #2).  The r5 contract
is: stdout's LAST line is one compact JSON object, small enough to always
survive a tail capture, and the heavyweight attribution detail lives in a
sidecar file.  This test runs the real bench.py in a subprocess at toy
scale and pins both halves of that contract.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_stdout_last_line_is_compact_contract_json(tmp_path):
    detail_path = str(tmp_path / "detail.json")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_RMAT_SCALE="10",
        SPARK_GRAFT_RMAT_EF="4",
        SPARK_GRAFT_RMAT_SCALE_HI="11",
        SPARK_GRAFT_RMAT_EF_HI="4",
        SPARK_GRAFT_PR_ITERS="2",
        SPARK_GRAFT_LPA_SWEEPS="1",
        SPARK_GRAFT_BENCH_DETAIL=detail_path,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, "bench.py printed nothing to stdout"
    last = lines[-1]
    # the r4/r5 failure mode: the driver's stdout tail capture is 2000
    # chars (measured from the committed BENCH_r04/r05 `tail` fields) —
    # both the 8KB r4 line and the 4.3KB r5 line were truncated mid-key.
    # The line must fit the MEASURED consumer budget with headroom.
    assert len(last) < 1500, f"contract line too long: {len(last)} bytes"
    parsed = json.loads(last)
    for key in ("metric", "value", "unit", "queries",
                "reps", "sf", "total_sec", "hw_anchor_median"):
        assert key in parsed, f"missing contract key {key}"
    assert parsed["unit"] == "edges/sec"
    assert parsed["value"] > 0
    assert parsed["reps"] == 1
    assert parsed["queries"], "empty headline queries map"
    # tiering (VERDICT r5 #8): default per-round run is the core tier
    assert parsed["tier"] == "core"
    # detail sidecar: full attribution moved OUT of stdout, not dropped
    with open(detail_path) as fh:
        detail = json.load(fh)
    for key in ("protocol", "runs", "median", "min", "hw_anchor",
                "throughput"):
        assert key in detail, f"missing detail key {key}"
    # the stdout map is a strict headline subset of the sidecar's full map
    assert set(parsed["queries"]) <= set(detail["median"])
    for q, med in parsed["queries"].items():
        assert detail["median"][q] == med
    assert set(detail["min"]) == set(detail["median"])
    # r6 headline-scale change (PROTOCOL.md): the judged `value` is the
    # scale-hi measurement; the scale-18 continuity pair stays in the
    # sidecar alongside it
    assert "pagerank_rmat_hi" in parsed["queries"]
    assert "lpa_sync_rmat_hi" in parsed["queries"]
    hi = detail["throughput"]["rmat_hi"]
    assert hi["scale"] == 11
    # bench.py rounds the mean of the UNROUNDED pr/lpa pair; the sidecar
    # carries the pair rounded to 0.1. Recomputing from the rounded pair can
    # land on the other side of a half-ulp boundary (r6: 12363.7 vs 12363.8),
    # so assert to the rounding granularity instead of exact equality
    # (VERDICT r6 wrong #1 — double-rounding flake).
    assert abs(parsed["value"] - (hi["pr_eps"] + hi["lpa_eps"]) / 2.0) <= 0.1
    for cont_key in ("pagerank_eps_s18", "lpa_eps_s18"):
        assert detail["throughput"][cont_key] > 0
