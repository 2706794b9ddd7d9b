"""Generate CATALOG.md: the authoritative entry-by-entry inventory of
the query catalog, straight from the registry (so it can never drift
from the code). Run: python scripts/gen_catalog.py
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pim_etl_spark.catalog import QUERIES, ORACLES, load_catalog  # noqa: E402


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text.split(stop)[0] + "."
    return text[:180]


def main() -> int:
    load_catalog()
    rows = []
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        module = fn.__module__.replace("pim_etl_spark.", "")
        check = "oracle" if name in ORACLES else "rows-only + pytest"
        doc = first_sentence(inspect.getdoc(fn))
        rows.append((name, module, check, doc))

    n_oracled = sum(1 for r in rows if r[2] == "oracle")
    out = [
        "# CATALOG — driver-checked query inventory",
        "",
        "Auto-generated from the registry by `scripts/gen_catalog.py`;",
        "regenerate after adding entries. Every `oracle` row is executed",
        "against its DuckDB twin by `tests/test_oracle_parity.py`",
        "(sf0.001 locally, sf0.01 in the driver gate); `rows-only` rows",
        "are engine-specific by design (seeded hashing) and pytest-pinned.",
        "",
        f"**{len(rows)} entries — {n_oracled} oracled, "
        f"{len(rows) - n_oracled} rows-only.**",
        "",
        "| entry | module | check | summary |",
        "|---|---|---|---|",
    ]
    for name, module, check, doc in rows:
        doc = doc.replace("|", "\\|")
        out.append(f"| `{name}` | {module} | {check} | {doc} |")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md"), "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"CATALOG.md: {len(rows)} entries ({n_oracled} oracled)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
