"""Generate CATALOG.md from the query registry — one row per catalog
entry: name, family (defining module), check mode, first docstring line.
Run: python tools/gen_catalog.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY  # noqa: E402

FAMILY = {
    "relational": "Relational core",
    "events": "Event time / sessions",
    "streaming_queries": "Structured Streaming",
    "text_llm": "Text / LLM-data pipeline",
    "ml": "Model scoring / web curation / privacy / graph",
    "connectors": "Format & custom connectors",
}

# Every rows-only entry (no DuckDB oracle by contract) must name the pytest
# contract that carries its correctness burden (r8 verdict ask #5) — the
# non-oracle surface stays auditable at a glance. main() fails if a
# rows-only entry is missing here or its named test no longer exists.
PINNED_BY = {
    "agg_hll_sketch_mergeable": (
        "tests/test_hll_sketch.py::test_hll_merge_equals_direct_and_tracks_exact"
    ),
    "events_rolling_wau_hll": (
        "tests/test_hll_wau.py::test_hll_wau_within_tolerance_of_exact"
    ),
    "kmeans_clusters": (
        "tests/test_kmeans.py::test_kmeans_separates_obvious_clusters"
    ),
    "sim_ivf_kmeans_topk": (
        "tests/test_similarity_recall.py::test_ivf_kmeans_centroids_recall_ge_first_n"
    ),
    "streaming_stream_stream_left_join": (
        "tests/test_stream_stream_outer.py::test_left_outer_emission_rules"
    ),
}


def _check_pins(rows_only: set[str]) -> None:
    missing = sorted(rows_only - set(PINNED_BY))
    assert not missing, f"rows-only entries without a pinning test: {missing}"
    stale = sorted(set(PINNED_BY) - rows_only)
    assert not stale, f"PINNED_BY names non-rows-only entries: {stale}"
    for name, pin in PINNED_BY.items():
        path, test = pin.split("::")
        src = (REPO / path).read_text()
        assert f"def {test}(" in src, f"{name}: pinning test {pin} not found"


def first_line(doc: str) -> str:
    for line in doc.strip().splitlines():
        line = line.strip()
        if line:
            return line
    return ""


def main(check_orphans: bool = False) -> int:
    from certification import (
        PARITY_PINNED,
        WINDOW_SIZE,
        _oracle_backed_names,
        last_certified,
        orphans,
    )

    cert = last_certified(REPO)
    _check_pins({n for n, s in REGISTRY.items() if not s.oracle})
    rows = []
    for name, spec in sorted(REGISTRY.items()):
        module = spec.fn.__module__.rsplit(".", 1)[-1]
        family = FAMILY.get(module, module)
        if spec.oracle:
            check = "DuckDB hash"
        else:
            check = f"rows-only; pinned by `{PINNED_BY[name]}`"
        c = cert.get(name, {})
        drv = f"r{c['driver']}" if c.get("driver") else "—"
        lg = f"r{c['localgate']}" if c.get("localgate") else "—"
        if c.get("localgate_sec") is not None:
            lg += f" ({c['localgate_sec']:.2f}s)"
        rows.append((family, name, check, drv, lg, first_line(spec.doc)))

    n_drv = sum(1 for r in rows if r[3] != "—")
    # Rotation cadence + staleness floor as computed facts (r13 verdict
    # ask #5): at `slots` rotating slots/round over the non-pinned
    # oracle-backed pool, a full re-certification cycle takes
    # ceil(pool/slots) rounds; the oldest driver certification among
    # oracle-backed entries is the catalog's current staleness floor.
    import math

    oracle = _oracle_backed_names()
    pool = len(oracle - set(PARITY_PINNED))
    slots = WINDOW_SIZE - len(PARITY_PINNED)
    cadence = math.ceil(pool / slots)
    oldest = min(
        (cert[n]["driver"] for n in oracle if cert.get(n, {}).get("driver")),
        default=None,
    )
    out = [
        "# Query catalog",
        "",
        "Auto-generated from the registry (`python tools/gen_catalog.py`).",
        f"{len(rows)} entries; every one runs through the driver's oracle gate",
        "(`tools/driver_sim.py`). 'DuckDB hash' = bit-exact value comparison;",
        "'rows-only' = non-SQL-expressible by contract (hashed/approximate/",
        "UDF-plane algorithms) — each such entry names the pytest contract",
        "that carries its correctness burden instead (merge-equals-direct,",
        "recall floor, stream==batch; existence is re-checked at generation).",
        "",
        "'driver' = last round the DRIVER's sf0.01 window certified the entry",
        f"(rows+schema+hash green; {n_drv}/{len(rows)} ever); 'local gate' =",
        "last committed full-catalog run of the same harness",
        "(`LOCALGATE_r{N}.json`), with that run's wall-time. History is",
        "parsed from the committed round artifacts by `tools/certification.py`.",
        "",
        f"Rotation cadence: {slots} rotating slots/round over {pool}",
        f"non-pinned oracle-backed entries = full re-certification every",
        f"~{cadence} rounds; oldest driver certification currently in the",
        f"catalog: {'r%d' % oldest if oldest else 'n/a'} "
        f"({n_drv}/{len(rows)} ever certified).",
        "Scale knobs per family: see [DEPLOY.md](DEPLOY.md).",
        "",
    ]
    for family in dict.fromkeys(f for f, *_ in rows):
        members = [r for r in rows if r[0] == family]
        out.append(f"## {family} ({len(members)})")
        out.append("")
        out.append("| query | check | driver | local gate | description |")
        out.append("|---|---|---|---|---|")
        for _, name, check, drv, lg, doc in members:
            out.append(f"| `{name}` | {check} | {drv} | {lg} | {doc} |")
        out.append("")

    (REPO / "CATALOG.md").write_text("\n".join(out))
    print(f"wrote CATALOG.md with {len(rows)} entries ({n_drv} driver-certified)")

    orph = orphans(set(REGISTRY), REPO)
    if orph:
        print(
            f"WARNING: {len(orph)} entries in NO committed artifact "
            f"(run the full gate before round close): {orph}"
        )
        if check_orphans:
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(check_orphans="--check" in sys.argv))
