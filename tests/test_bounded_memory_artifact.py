"""Gate on the committed bounded-memory artifact (round-12, VERDICT
r11 item 5): the 10 heaviest catalog entries completed at sf0.1 under
a PINNED-SMALL single-JVM heap (scripts/bounded_memory_probe.py),
proving no engine-side data-sized driver materialization hides in any
of their plans and that the shuffle/agg paths spill rather than OOM
when execution memory is tight. Deterministic: reads committed JSON,
runs no Spark. If a future round re-probes and commits a failure, this
test names it until the offending site is fixed or the exception is
documented here AND in SCALE.md."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parse_heap_mb(heap: str) -> float:
    h = heap.strip().lower()
    if h.endswith("g"):
        return float(h[:-1]) * 1024
    if h.endswith("m"):
        return float(h[:-1])
    raise ValueError(heap)


def test_bounded_memory_artifact_is_green_and_actually_pinned():
    path = os.path.join(REPO, "BOUNDED_MEMORY.json")
    assert os.path.exists(path), (
        "bounded-memory artifact missing (scripts/bounded_memory_probe.py output)"
    )
    with open(path) as f:
        data = json.load(f)
    # the pin must be genuinely small — a 16g 'pin' proves nothing
    assert _parse_heap_mb(data["heap"]) <= 2048, data["heap"]
    assert data["sf_dir"].rstrip("/").endswith("sf0.1"), data["sf_dir"]
    assert not data["failed"], f"entries failed under the heap pin: {data['failed']}"
    entries = data["entries"]
    assert len(entries) >= 10, f"probe coverage shrank to {len(entries)}"
    assert all(rec.get("ok") for rec in entries.values()), entries


def test_bounded_memory_sf1_artifact_is_green_and_actually_pinned():
    """Third-decade memory gate (round 12): the same 10 entries at the
    scratch sf1 dataset — 10× the sf0.1 probe's data — under a 3 g
    local[32] pin (96 MB/slot), shuffle regime pinned, fresh JVM per
    entry. This is the first BINDING spill test: the sf0.1 probe's
    1 g heap is ~40× its 24 MB dataset, while 3 g vs sf1's ~2.5 GB of
    in-memory working sets forces the agg/join paths through real
    spill cycles. 1 g at 32 slots is BELOW Spark's own
    per-concurrent-task unmanaged floor at this scale (the OOM stacks
    land inside the spill machinery's fixed MB-sized I/O buffers while
    the managed agg path is correctly spilling), proven by the control
    recorded in the artifact: the heaviest entry at the same 1 g heap
    and identical 32-wide plan completes when only 8 tasks run at
    once. The binding term is per-task fixed overhead x concurrency —
    which a real cluster sizes for — not data-sized state. 2 g at 32
    slots is a knife edge (the same entry passes or OOMs run-to-run
    on GC timing), so the committed gate pins the smallest ROBUST
    heap."""
    path = os.path.join(REPO, "BOUNDED_MEMORY_SF1.json")
    assert os.path.exists(path), "sf1 bounded-memory artifact missing"
    with open(path) as f:
        data = json.load(f)
    assert _parse_heap_mb(data["heap"]) <= 3072, data["heap"]
    assert data.get("cores", 32) == 32, data.get("cores")
    assert data["sf_dir"].rstrip("/").endswith("sf1"), data["sf_dir"]
    assert not data["failed"], f"entries failed under the heap pin: {data['failed']}"
    entries = data["entries"]
    assert len(entries) >= 10, f"probe coverage shrank to {len(entries)}"
    assert all(rec.get("ok") for rec in entries.values()), entries
    # the concurrency control that pins the 1 g failure on the per-task
    # floor rather than on data-sized state must stay in the artifact
    ctl = data.get("low_heap_control")
    assert ctl and ctl["heap"] == "1g" and ctl["cores"] < 32 and ctl["ok"], ctl
