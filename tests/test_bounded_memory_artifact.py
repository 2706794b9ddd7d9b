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
