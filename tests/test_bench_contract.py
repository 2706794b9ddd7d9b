"""Bench output-contract pins (the BENCH_r07 "parsed": null class):
the driver tail-captures the final ~2000 chars of stdout, so the
compact headline MUST be the last line, parse as JSON on its own, and
carry the totals a truncated capture needs. Runs bench.py end-to-end
as a subprocess on a two-entry allowlist at sf0.001."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_headline_last_and_payload_parses(tmp_path):
    out = tmp_path / "bench_out.json"
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_BENCH_RUNS": "1",
        "SPARK_GRAFT_BENCH_ONLY": "bench_control,topk_orders",
        # never clobber the committed round artifact bench_last.json
        "SPARK_GRAFT_BENCH_OUT": str(out),
    }
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=str(tmp_path),  # defensive: with SPARK_GRAFT_BENCH_OUT set the
        # artifact lands at the redirected path; a tmp cwd just ensures an
        # accidental RELATIVE write could never touch the repo
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [ln for ln in res.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 3, res.stdout
    first, payload_line, last = lines
    # the LAST line is the headline — it's what survives tail capture
    head = json.loads(last)
    assert head["metric"] == "catalog_total_runtime_headline"
    assert head == json.loads(first)  # human copy up top, identical
    assert head["n_queries"] == 2
    assert head["n_succeeded"] == 2
    assert head["failed_count"] == 0
    # a tail capture of the last 2000 chars must contain the whole
    # headline line — pin the size headroom explicitly
    assert len(last) < 1000
    payload = json.loads(payload_line)
    assert payload["metric"] == "catalog_total_runtime"
    assert set(payload["queries"]) == {"bench_control", "topk_orders"}
    assert payload["failed"] == []
    # a SPARK_GRAFT_BENCH_ONLY run must self-identify as partial in BOTH
    # records (round-8 ADVICE): a filtered artifact can never be mistaken
    # for a full-catalog run. The real per-round run never sets the env
    # var, so its records carry no "filtered" key at all.
    assert head["filtered"] is True
    assert payload["filtered"] is True
    assert abs(head["value"] - payload["value"]) < 1e-9
    # the full payload persists to the (redirected) artifact path
    with open(out) as f:
        disk = json.load(f)
    assert disk["queries"] == payload["queries"]
