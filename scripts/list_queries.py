#!/usr/bin/env python
"""Regenerate docs/QUERIES.md — the full registry catalog (name, tags, oracle
coverage, one-line description) for navigation against SURVEY.md §2."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark_retention_pipeline_spark import registry

    registry._ensure_loaded()
    rows = []
    for name in sorted(registry._REGISTRY):
        q = registry._REGISTRY[name]
        doc = (q.fn.__doc__ or "").strip().split("\n")[0]
        check = "oracle" if q.oracle else "rows-only"
        rows.append(f"| `{name}` | {', '.join(q.tags)} | {check} | {doc} |")

    n_total = len(rows)
    n_oracle = sum(1 for n in registry._REGISTRY.values() if n.oracle)
    content = "\n".join(
        [
            "# Query catalog",
            "",
            f"{n_total} registered queries ({n_oracle} DuckDB-oracle-backed, "
            f"{n_total - n_oracle} rows-only). Regenerate: `python scripts/list_queries.py`.",
            "",
            "| name | tags | check | description |",
            "|---|---|---|---|",
            *rows,
            "",
        ]
    )
    with open("docs/QUERIES.md", "w") as f:
        f.write(content)
    print(f"wrote docs/QUERIES.md ({n_total} queries, {n_oracle} oracle-backed)")


if __name__ == "__main__":
    main()
