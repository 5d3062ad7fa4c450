"""Exercise the HF extractor branch WITHOUT the model (r6 verdict ask #5):
inject a fake ``transformers.pipeline`` returning canned NER dicts and
assert the branch's logic — reference-parity pipeline config, the
PER/ORG/LOC/MISC whitelist filter on grouped entities
(spark_entity_counter.py:74-77), and the fail-soft ``[]`` contract on a
raising model (spark_entity_counter.py:79-81) — so the branch is no
longer dead code in CI."""

from __future__ import annotations

import sys
import types

import pandas as pd
import pytest

from sparkstreamingrealtimedatawithkafka_spark.functions import text as TX


class _FakeNer:
    """Stands in for the HF pipeline object: text -> grouped-entity dicts."""

    def __init__(self):
        self.calls = []

    def __call__(self, text):
        self.calls.append(text)
        if text == "boom":
            raise RuntimeError("model exploded")
        return [
            {"word": "Alice", "entity_group": "PER", "score": 0.99},
            {"word": "Acme", "entity_group": "ORG", "score": 0.98},
            {"word": "Paris", "entity_group": "LOC", "score": 0.97},
            {"word": "Widget", "entity_group": "MISC", "score": 0.96},
            # must be filtered: outside the whitelist / missing group
            {"word": "2024", "entity_group": "DATE", "score": 0.95},
            {"word": "??", "score": 0.10},
        ]


@pytest.fixture
def fake_transformers(monkeypatch):
    fake_ner = _FakeNer()
    captured = {}

    def pipeline(task, **kwargs):
        captured["task"] = task
        captured.update(kwargs)
        return fake_ner

    mod = types.ModuleType("transformers")
    mod.pipeline = pipeline
    monkeypatch.setitem(sys.modules, "transformers", mod)
    # the lazy singleton must rebuild against the injected module
    monkeypatch.setattr(TX, "_EXTRACTOR_SINGLETON", None)
    return fake_ner, captured


def test_hf_branch_config_and_whitelist(fake_transformers):
    fake_ner, captured = fake_transformers
    extract = TX._build_extractor()

    # Reference pipeline config, verbatim (spark_entity_counter.py:48-60).
    assert captured["task"] == "ner"
    assert captured["model"] == "dslim/bert-base-NER"
    assert captured["grouped_entities"] is True
    assert captured["device"] == "cpu"
    assert captured["aggregation_strategy"] == "simple"

    # Whitelist filter: PER/ORG/LOC/MISC survive, DATE and group-less drop.
    assert extract("Alice went to Paris") == ["Alice", "Acme", "Paris", "Widget"]
    assert fake_ner.calls[-1] == "Alice went to Paris"


def test_hf_branch_fail_soft_through_udf(fake_transformers):
    """Run the real pandas-UDF body with the fake-HF singleton: a raising
    model and a non-string input both yield [] (the reference's fail-soft
    contract), while good rows pass the whitelist."""
    udf_body = TX.extract_entities_udf.func
    out = udf_body(pd.Series(["fine text", "boom", None]))
    assert list(out) == [["Alice", "Acme", "Paris", "Widget"], [], []]


def test_dictionary_fallback_when_transformers_absent(monkeypatch):
    """Import failure (this sandbox's real state) must fall back to the
    deterministic dictionary extractor, never raise."""
    monkeypatch.setitem(sys.modules, "transformers", None)  # import -> error
    extract = TX._build_extractor()
    assert extract is TX._dictionary_extractor
