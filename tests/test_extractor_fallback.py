"""Coverage for the U2 extractor-plane contract (functions/text.py):
the lazy worker-singleton builder must fall back to the deterministic
dictionary extractor when the optional HF stack is absent or broken —
the reference's fail-soft posture (spark_entity_counter.py:45-60, 79-81)
generalized to a pluggable plane.
"""

from __future__ import annotations

import builtins
import sys

import pytest

from sparkstreamingrealtimedatawithkafka_spark.functions import text as TX


def test_build_extractor_falls_back_without_transformers(monkeypatch):
    """transformers is absent in this environment; the builder must return
    the dictionary extractor rather than raise."""
    assert "transformers" not in sys.modules  # env contract: no HF here
    extract = TX._build_extractor()
    assert extract is TX._dictionary_extractor


def test_build_extractor_falls_back_when_import_explodes(monkeypatch):
    """Even a transformers that *imports* but blows up at pipeline build
    time (missing model weights, no network) must fail soft."""

    class _BrokenPipelineModule:
        @staticmethod
        def pipeline(*args, **kwargs):
            raise RuntimeError("no model weights available")

    real_import = builtins.__import__

    def fake_import(name, *args, **kwargs):
        if name == "transformers":
            return _BrokenPipelineModule()
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    extract = TX._build_extractor()
    assert extract is TX._dictionary_extractor


def test_dictionary_extractor_contract():
    assert TX._dictionary_extractor("") == []
    assert TX._dictionary_extractor(None) == []
    # whitelisted entity tokens survive; others drop
    some_entity = next(
        (t for t, k in TX.ENTITY_TYPES.items() if k in {"PER", "ORG", "LOC", "MISC"}),
        None,
    )
    assert some_entity is not None
    out = TX._dictionary_extractor(f"the {some_entity} spoke")
    assert out == [some_entity]
