"""Generate CATALOG.md from the query registry — one row per catalog
entry: name, family (defining module), check mode, first docstring line.
Run: python tools/gen_catalog.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY  # noqa: E402

FAMILY = {
    "relational": "Relational core",
    "events": "Event time / sessions",
    "streaming_queries": "Structured Streaming",
    "text_llm": "Text / LLM-data pipeline",
    "ml": "Model scoring / web curation / privacy / graph",
    "connectors": "Format & custom connectors",
}


def first_line(doc: str) -> str:
    for line in doc.strip().splitlines():
        line = line.strip()
        if line:
            return line
    return ""


def main() -> None:
    rows = []
    for name, spec in sorted(REGISTRY.items()):
        module = spec.fn.__module__.rsplit(".", 1)[-1]
        family = FAMILY.get(module, module)
        check = "DuckDB hash" if spec.oracle else "rows-only"
        rows.append((family, name, check, first_line(spec.doc)))

    out = [
        "# Query catalog",
        "",
        "Auto-generated from the registry (`python tools/gen_catalog.py`).",
        f"{len(rows)} entries; every one runs through the driver's oracle gate",
        "(`tools/driver_sim.py`). 'DuckDB hash' = bit-exact value comparison;",
        "'rows-only' = non-SQL-expressible by contract (hashed/approximate/",
        "UDF-plane algorithms).",
        "",
    ]
    for family in dict.fromkeys(f for f, *_ in rows):
        members = [r for r in rows if r[0] == family]
        out.append(f"## {family} ({len(members)})")
        out.append("")
        out.append("| query | check | description |")
        out.append("|---|---|---|")
        for _, name, check, doc in members:
            out.append(f"| `{name}` | {check} | {doc} |")
        out.append("")

    (REPO / "CATALOG.md").write_text("\n".join(out))
    print(f"wrote CATALOG.md with {len(rows)} entries")


if __name__ == "__main__":
    main()
