"""The r8 advice's certification-strictness contract, pinned: a driver
CORRECTNESS record whose hash check was skipped (``hash_match: None``)
counts as green ONLY for entries registered without an oracle (rows-only
contract). An oracle-bearing entry with a skipped hash is NOT
certification — before the fix, tools/certification.py would have
counted it, silently inflating the ever-certified set."""

from __future__ import annotations

import json
import sys
from pathlib import Path

from sparkstreamingrealtimedatawithkafka_spark.plans import REGISTRY, oracle_sql

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from certification import driver_history  # noqa: E402

_ORACLE_NAME = "q1_pricing_summary"  # registered WITH an oracle
_ROWS_ONLY_NAME = "kmeans_clusters"  # registered WITHOUT one


def _write_record(tmp_path: Path, hash_match) -> Path:
    rec = {
        name: {
            "err": None,
            "rows_match": True,
            "schema_match": True,
            "hash_match": hash_match,
        }
        for name in (_ORACLE_NAME, _ROWS_ONLY_NAME)
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rec))
    return tmp_path


def test_fixture_names_still_have_expected_contracts():
    osql = oracle_sql()
    assert _ORACLE_NAME in REGISTRY and _ORACLE_NAME in osql
    assert _ROWS_ONLY_NAME in REGISTRY and _ROWS_ONLY_NAME not in osql


def test_skipped_hash_counts_only_for_rows_only_entries(tmp_path):
    hist = driver_history(_write_record(tmp_path, hash_match=None))
    assert hist[_ROWS_ONLY_NAME][1] is True, (
        "rows-only contract: absent hash check is green"
    )
    assert hist[_ORACLE_NAME][1] is False, (
        "oracle-bearing entry with a skipped hash check must NOT count "
        "as driver-certified"
    )


def test_true_hash_counts_for_both(tmp_path):
    hist = driver_history(_write_record(tmp_path, hash_match=True))
    assert hist[_ORACLE_NAME][1] is True
    assert hist[_ROWS_ONLY_NAME][1] is True


def test_false_hash_counts_for_neither(tmp_path):
    hist = driver_history(_write_record(tmp_path, hash_match=False))
    assert hist[_ORACLE_NAME][1] is False
    assert hist[_ROWS_ONLY_NAME][1] is False
