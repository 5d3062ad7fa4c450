"""Text-analysis column expressions and the pluggable entity extractor.

Everything here mirrors the reference's text path but Spark-first:

- The reference derives one ``text`` column and runs a pandas-UDF NER over it
  (/root/reference/app/spark_entity_counter.py:130-135). Its extractor is a
  lazily-initialized per-worker HF pipeline that fail-softs to ``[]``
  (spark_entity_counter.py:45-87). We keep that contract but make the
  extractor pluggable, with a deterministic dictionary extractor as the
  default so correctness is oracle-checkable; JVM-side column expressions are
  preferred wherever the semantics allow (no Python in the hot path).
- Tokenization, shingles, fingerprints, quality stats and language-ID are
  pure column expressions (whole-stage-codegen'd, no UDF), so Catalyst can
  prune/pushdown around them and they scale linearly with no Python workers.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Deterministic entity dictionary over the fixture vocabulary, typed like the
# reference's NER output (entity_group ∈ {PER, ORG, LOC, MISC} whitelist at
# spark_entity_counter.py:74-77).
ENTITY_TYPES: dict[str, str] = {
    "spark": "ORG",
    "customer": "PER",
    "table": "LOC",
    "stream": "MISC",
    "batch": "MISC",
    "query": "MISC",
    "window": "MISC",
    "join": "MISC",
    "vector": "MISC",
    "merge": "MISC",
}
ENTITY_TERMS: tuple[str, ...] = tuple(sorted(ENTITY_TYPES))

# Stopwords for quality scoring (fixture vocabulary's function words).
STOPWORDS: tuple[str, ...] = ("a", "the")


def tokenize(col: Column | str) -> Column:
    """Whitespace tokens, empty strings dropped (split('') → [''])."""
    arr = F.split(F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit("")), " ")
    return F.filter(arr, lambda t: t != F.lit(""))


def extract_entities(col: Column | str) -> Column:
    """Dictionary entity extraction as a pure column expression.

    One element per *mention* (duplicates preserved), matching the
    reference's per-occurrence NER output that feeds ``explode`` →
    ``groupBy().count()`` (spark_entity_counter.py:135-139).
    """
    return F.filter(tokenize(col), lambda t: t.isin(*ENTITY_TERMS))


def word_shingles(col: Column | str, n: int = 2) -> Column:
    """Word n-gram shingles, '_'-joined; [] when fewer than n tokens.

    Built as a chain of ``zip_with`` over shifted slices so the token array
    is evaluated O(n) times per row. (An earlier ``transform`` +
    ``element_at(toks, i)`` formulation re-evaluated the whole tokenize
    expression once per element — O(tokens²) per row, ~10× slower at sf0.1.)
    """
    toks = tokenize(col)
    width = F.size(toks) - F.lit(n - 1)
    acc = F.slice(toks, 1, width)
    for j in range(1, n):
        acc = F.zip_with(
            acc, F.slice(toks, j + 1, width), lambda x, y: F.concat(x, F.lit("_"), y)
        )
    # Guard: slice with negative length throws; emit [] for short docs.
    return F.when(F.size(toks) >= n, acc).otherwise(F.expr("array()").cast("array<string>"))


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of sorted distinct tokens.

    The batch analogue of the producer's LRU dedup key
    (/root/reference/app/news_producer.py:120-125), hardened to survive
    token reordering.
    """
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokenize(col))), " "))


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def stopword_ratio(col: Column | str) -> Column:
    toks = tokenize(col)
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(toks) > 0, stop.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def avg_token_len(col: Column | str) -> Column:
    toks = tokenize(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: long enough, not stopword-heavy.

    Deliberately integer/ratio-based so a SQL oracle can reproduce it
    bit-for-bit (no transcendental functions).
    """
    toks = token_count(col)
    length_part = F.least(toks.cast("double") / F.lit(50.0), F.lit(1.0))
    stop_part = F.lit(1.0) - stopword_ratio(col)
    return F.round((length_part + stop_part) / F.lit(2.0), 6)


# ---------------------------------------------------------------------------
# Pluggable pandas-UDF extractor plane (the U1/U2 parity path).
# ---------------------------------------------------------------------------

_EXTRACTOR_SINGLETON: Callable[[str], list[str]] | None = None


def _dictionary_extractor(text: str) -> list[str]:
    if not text:
        return []
    whitelist = {"PER", "ORG", "LOC", "MISC"}
    return [t for t in text.split(" ") if ENTITY_TYPES.get(t) in whitelist]


def _build_extractor() -> Callable[[str], list[str]]:
    """Lazy per-worker extractor, mirroring the reference's module-global
    pipeline singleton (spark_entity_counter.py:45-60). The HF path
    (dslim/bert-base-NER) is optional and never on the test path."""
    try:  # optional heavyweight model, absent in this environment
        from transformers import pipeline  # type: ignore

        ner = pipeline(
            "ner",
            model="dslim/bert-base-NER",
            grouped_entities=True,
            device="cpu",
            aggregation_strategy="simple",
        )
        whitelist = {"PER", "ORG", "LOC", "MISC"}

        def hf_extract(text: str) -> list[str]:
            out = ner(text)
            return [e["word"] for e in out if e.get("entity_group") in whitelist]

        return hf_extract
    except Exception:
        return _dictionary_extractor


@F.pandas_udf(ArrayType(StringType()))
def extract_entities_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized extractor with the reference's fail-soft contract:
    any per-document failure → ``[]`` (spark_entity_counter.py:79-81)."""
    global _EXTRACTOR_SINGLETON
    if _EXTRACTOR_SINGLETON is None:
        _EXTRACTOR_SINGLETON = _build_extractor()
    extract = _EXTRACTOR_SINGLETON

    def safe(text: object) -> list[str]:
        try:
            return extract(text) if isinstance(text, str) else []
        except Exception:
            return []

    return texts.apply(safe)


@F.pandas_udf(StringType())
def lang_id_udf(texts: pd.Series) -> pd.Series:
    """Deterministic n-gram language-ID heuristic (vectorized).

    Scores character bigrams against small per-language profiles; a real
    deployment would swap in fastText/CLD3 behind the same signature.
    """
    profiles = {
        "en": {"th", "he", "in", "er", "an"},
        "de": {"ch", "ei", "en", "de", "ie"},
        "fr": {"le", "es", "on", "de", "ou"},
        "es": {"de", "la", "os", "el", "en"},
        "zh": {"zh", "sh", "ng", "ua", "ia"},
    }

    def score(text: object) -> str:
        if not isinstance(text, str) or not text:
            return "und"
        bigrams = {text[i : i + 2] for i in range(len(text) - 1)}
        best = max(profiles.items(), key=lambda kv: (len(bigrams & kv[1]), kv[0]))
        return best[0]

    return texts.apply(score)
