"""Property tests for text_winnowing_fingerprints.

Two layers of evidence beyond the DuckDB gate:

1. A pure-Python replay of the spec (token Rabin-Karp prehash -> 4-token
   shingle fold -> min-of-window-5 -> distinct) is checked against the
   DuckDB oracle SQL on hypothesis-generated corpora — a third
   independent implementation pinning the SPEC, not just the engines.
2. The winnowing GUARANTEE (Schleimer, Wilkerson & Aiken, SIGMOD'03):
   any two documents sharing a contiguous run of >= t = w + k - 1 = 8
   tokens must share at least one selected fingerprint. The proof is
   that a shared 8-token run yields w = 5 consecutive identical shingle
   hashes, some selection window lies entirely inside that run in BOTH
   documents, and the min of identical window contents is identical.
   Hypothesis searches for a counterexample across random paddings.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

MOD = 2147483647
B = 1000003
K = 4  # shingle size (tokens)
W = 5  # selection window (shingles)


def _tok_hash(tok: str) -> int:
    h = 0
    for c in tok:
        h = (h * B + ord(c)) % MOD
    return h


def _fingerprints(toks: list[str]) -> set[int]:
    """Pure-python replay of the plan: prehash tokens, fold K token
    hashes per shingle, keep the min of each sliding window of W."""
    if len(toks) < K + W - 1:
        return set()
    th = [_tok_hash(t) for t in toks]
    gh = []
    for i in range(len(th) - K + 1):
        h = 0
        for x in th[i : i + K]:
            h = (h * B + x) % MOD
        gh.append(h)
    return {min(gh[j : j + W]) for j in range(len(gh) - W + 1)}


_ORACLE = """
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
), th AS (
  SELECT doc_id,
    list_transform(toks,
      t -> list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(t, ''),
                 c -> CAST(unicode(c) AS BIGINT))),
             (h, x) -> (h * 1000003 + x) % 2147483647)) AS th
  FROM d WHERE len(toks) >= 8
), g AS (
  SELECT doc_id,
    list_transform(generate_series(1, len(th) - 3),
      i -> list_reduce(
             list_prepend(CAST(0 AS BIGINT), list_slice(th, i, i+3)),
             (h, x) -> (h * 1000003 + x) % 2147483647)) AS gh
  FROM th
), w AS (
  SELECT doc_id,
    list_distinct(list_transform(generate_series(1, len(gh) - 4),
      j -> list_min(list_slice(gh, j, j+4)))) AS fps
  FROM g
)
SELECT doc_id, fp FROM (SELECT doc_id, UNNEST(fps) AS fp FROM w)
"""

_token = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=6,
)
_doc = st.lists(_token, min_size=0, max_size=30)


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=6))
def test_python_replay_matches_duckdb_oracle(docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, toks in enumerate(docs):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, " ".join(toks)])
    got = {}
    for doc_id, fp in con.execute(_ORACLE).fetchall():
        got.setdefault(doc_id, set()).add(fp)
    for i, toks in enumerate(docs):
        toks = [t for t in toks if t != ""]
        assert got.get(i, set()) == _fingerprints(toks), f"doc {i}"


@settings(max_examples=80, deadline=None)
@given(
    shared=st.lists(_token, min_size=8, max_size=14),
    pre_a=st.lists(_token, min_size=0, max_size=10),
    post_a=st.lists(_token, min_size=0, max_size=10),
    pre_b=st.lists(_token, min_size=0, max_size=10),
    post_b=st.lists(_token, min_size=0, max_size=10),
)
def test_shared_run_guarantees_common_fingerprint(
    shared, pre_a, post_a, pre_b, post_b
):
    doc_a = pre_a + shared + post_a
    doc_b = pre_b + shared + post_b
    fa, fb = _fingerprints(doc_a), _fingerprints(doc_b)
    assert fa & fb, (
        f"winnowing guarantee violated: shared {len(shared)}-token run "
        f"but no common fingerprint (|fa|={len(fa)}, |fb|={len(fb)})"
    )


def test_short_docs_produce_no_fingerprints():
    assert _fingerprints(["a"] * 7) == set()
    assert len(_fingerprints(["a"] * 8)) == 1


def test_flat_fold_rewrite_matches_aggregate_fold(spark):
    """r15 expression rewrite equivalence (verdict ask #2): the shingle
    hash became flat arithmetic over ``get`` lookups and the window min
    ``least()`` over gets — this pins them bit-equal to the original
    ``aggregate(slice(...))`` / ``array_min(slice(...))`` forms on
    adversarial token-hash arrays (boundary values 0, M-1, duplicates),
    independent of the fixture corpus."""
    from pyspark.sql import functions as F

    M, P = 2147483647, 1000003
    rows = [
        ([0, 1, 2, 3, 4, 5, 6, 7, 8],),
        ([M - 1] * 12,),
        ([0, M - 1, 123456789, 7, 7, 7, 999999937, 2, M - 2, 1, 0, 5],),
        ([17] * 8,),
    ]
    df = spark.createDataFrame(rows, "th array<long>")
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda h, x: (h * F.lit(P) + x) % F.lit(M)
    )

    def flat(i):
        e = lambda k: F.get("th", i - 1 + k)  # noqa: E731
        h = e(0)
        for k in (1, 2, 3):
            h = (h * F.lit(P) + e(k)) % F.lit(M)
        return h

    seq_g = F.sequence(F.lit(1), F.size("th") - 3)
    both = df.select(
        F.transform(seq_g, lambda i: fold(F.slice("th", i, F.lit(4)))).alias("a"),
        F.transform(seq_g, flat).alias("b"),
    )
    g = both.withColumn(
        "min_a",
        F.transform(
            F.sequence(F.lit(1), F.size("a") - 4),
            lambda j: F.array_min(F.slice("a", j, F.lit(5))),
        ),
    ).withColumn(
        "min_b",
        F.transform(
            F.sequence(F.lit(1), F.size("b") - 4),
            lambda j: F.least(*[F.get("b", j - 1 + k) for k in range(5)]),
        ),
    )
    for r in g.collect():
        assert r["a"] == r["b"], "shingle fold rewrite diverged"
        assert r["min_a"] == r["min_b"], "window-min rewrite diverged"
