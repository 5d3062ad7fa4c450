"""Property tests for the round-6 exact-algorithm entries.

- ``dedup_ppjoin_prefix``: the prefix-filter COMPLETENESS theorem (the
  reason the entry can claim exactness): for ANY global canonical order,
  every pair with Jaccard >= 3/5 shares a token inside both prefixes of
  length n - ceil(3n/5) + 1 — hypothesis probes the integer arithmetic
  edge cases (tiny sets, near-threshold pairs) where an off-by-one in the
  ceil formula would silently drop true pairs. Plus a full python replay
  of the Spark result on the fixture corpus (quadratic ground truth).

- ``part_skyline_pareto``: the two-level bucketed dominance logic replayed
  in pure python against the quadratic NOT-EXISTS definition, across
  random point sets, bucket widths, and tie patterns (equal price, equal
  size, exact duplicates — the mutually-non-dominating twins).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

SF_DIR = "/root/testdata/sf0.001"


def _prefix_len(n: int) -> int:
    # n - ceil(3n/5) + 1, ceil(3n/5) = (3n+4) div 5 — must mirror the plan
    return n - ((3 * n + 4) // 5) + 1


@settings(max_examples=300, deadline=None)
@given(
    a=st.sets(st.integers(0, 24), min_size=1, max_size=20),
    b=st.sets(st.integers(0, 24), min_size=1, max_size=20),
    seed=st.randoms(use_true_random=False),
)
def test_prefix_filter_never_drops_a_true_pair(a, b, seed):
    """Jaccard >= 3/5 => the two prefixes intersect, under ANY total order
    (hypothesis permutes the universe; the df-ascending order the plan
    uses is one such order, so completeness transfers)."""
    inter = len(a & b)
    union = len(a | b)
    if 5 * inter < 3 * union:
        return  # below threshold: no guarantee claimed
    universe = list(range(25))
    seed.shuffle(universe)
    rank = {tok: i for i, tok in enumerate(universe)}
    pa = sorted(a, key=rank.__getitem__)[: _prefix_len(len(a))]
    pb = sorted(b, key=rank.__getitem__)[: _prefix_len(len(b))]
    assert set(pa) & set(pb), (
        f"prefix filter dropped a true pair: |A|={len(a)} |B|={len(b)} "
        f"inter={inter} union={union}"
    )


def _quad_skyline(points):
    out = []
    for pk, c, s in points:
        dominated = any(
            c2 <= c and s2 >= s and (c2 < c or s2 > s) for _, c2, s2 in points
        )
        if not dominated:
            out.append((pk, c, s))
    return sorted(out)


def _two_level_skyline(points, bucket_w):
    """Pure-python replay of the plan's bucket + windows logic."""
    bmax: dict[int, int] = {}
    for _, c, s in points:
        b = c // bucket_w
        bmax[b] = max(bmax.get(b, -1), s)
    prev: dict[int, int] = {}
    run = -1
    for b in sorted(bmax):
        prev[b] = run
        run = max(run, bmax[b])
    same_price: dict[int, int] = {}
    for _, c, s in points:
        same_price[c] = max(same_price.get(c, -1), s)
    out = []
    for pk, c, s in points:
        b = c // bucket_w
        in_bkt = max(
            (s2 for _, c2, s2 in points if c2 // bucket_w == b and c2 < c),
            default=-1,
        )
        dominated = max(prev[b], in_bkt) >= s or same_price[c] > s
        if not dominated:
            out.append((pk, c, s))
    return sorted(out)


@settings(max_examples=300, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 12)), min_size=1, max_size=40
    ),
    bucket_w=st.sampled_from([1, 3, 7, 100]),
)
def test_two_level_skyline_matches_quadratic(pts, bucket_w):
    points = [(i, c, s) for i, (c, s) in enumerate(pts)]
    assert _two_level_skyline(points, bucket_w) == _quad_skyline(points)


def test_ppjoin_matches_python_quadratic_ground_truth(spark):
    """Full corpus replay at sf0.001: the Spark prefix-filter join must
    emit EXACTLY the quadratic python ground truth — completeness (no
    LSH-style recall loss) and precision (verify stage) in one check."""
    import duckdb

    from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (
        dedup_ppjoin_prefix,
    )

    got = {
        (r.doc_a, r.doc_b, r.inter_cnt, r.union_cnt)
        for r in dedup_ppjoin_prefix(spark, SF_DIR).collect()
    }
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    sets = {}
    for doc_id, text in rows:
        toks = [t for t in (text or "").split(" ") if t]
        sh = {f"{x}_{y}" for x, y in zip(toks, toks[1:])}
        if sh:
            sets[doc_id] = sh
    want = set()
    ids = sorted(sets)
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            inter = len(sets[da] & sets[db])
            union = len(sets[da] | sets[db])
            if 5 * inter >= 3 * union:
                want.add((da, db, inter, union))
    assert got == want
    assert want, "fixture corpus should contain true near-dup pairs"


@settings(max_examples=200, deadline=None)
@given(
    keys=st.lists(
        st.tuples(st.text(alphabet="abcz", min_size=1, max_size=5), st.integers(0, 99)),
        min_size=1,
        max_size=30,
    )
)
def test_two_level_rank_equals_global_rank(keys):
    """dedup_sorted_neighborhood's bucketed rank: bucket by the key's
    first character + within-bucket rank + bucket offsets must reproduce
    the global ROW_NUMBER() OVER (ORDER BY k, doc_id) exactly — including
    duplicate keys and duplicate (k, doc_id) prefixes across buckets."""
    rows = [(k, i) for i, (k, _) in enumerate(keys)]
    want = {kd: r + 1 for r, kd in enumerate(sorted(rows))}
    buckets: dict[str, list] = {}
    for kd in rows:
        buckets.setdefault(kd[0][0], []).append(kd)
    got = {}
    off = 0
    for b in sorted(buckets):
        members = sorted(buckets[b])
        for j, kd in enumerate(members):
            got[kd] = off + j + 1
        off += len(members)
    assert got == want


def test_similarity_auto_routes_ppjoin_under_budget(spark):
    """At sf0.001 the candidate estimate (117,268) fits the budget, so the
    router must take PPJoin and the pair set must equal the direct
    dedup_ppjoin_prefix entry (modulo the lo/hi rename)."""
    from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (
        dedup_ppjoin_prefix,
        dedup_similarity_auto,
    )

    auto = dedup_similarity_auto(spark, SF_DIR).collect()
    assert auto, "fixture corpus has near-dup pairs"
    assert {r["route"] for r in auto} == {"ppjoin"}
    assert {r["cand_est"] for r in auto} == {117268}
    direct = dedup_ppjoin_prefix(spark, SF_DIR).collect()
    assert {
        (r["doc_lo"], r["doc_hi"], r["inter_cnt"], r["union_cnt"]) for r in auto
    } == {
        (r["doc_a"], r["doc_b"], r["inter_cnt"], r["union_cnt"]) for r in direct
    }


def test_similarity_auto_routes_snm_over_budget(spark):
    """budget=0 forces the over-budget branch: route must be snm and the
    pair set must equal the direct dedup_sorted_neighborhood entry — the
    escape hatch is the REAL linear path, not a stub."""
    from sparkstreamingrealtimedatawithkafka_spark.plans._util import t
    from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (
        dedup_sorted_neighborhood,
        similarity_auto_pairs,
    )

    docs = t(spark, SF_DIR, "documents")
    auto = similarity_auto_pairs(docs, budget=0).collect()
    assert auto
    assert {r["route"] for r in auto} == {"snm"}
    # gate 2 WAS consulted (over budget) and measured the fixture's zero
    # head-key mass — distinct from the ppjoin route's -1 sentinel
    assert {r["skew_ppm"] for r in auto} == {0}
    direct = dedup_sorted_neighborhood(spark, SF_DIR).collect()
    assert {
        (r["doc_lo"], r["doc_hi"], r["inter_cnt"], r["union_cnt"]) for r in auto
    } == {
        (r["doc_lo"], r["doc_hi"], r["inter_cnt"], r["union_cnt"]) for r in direct
    }


def _boilerplate_corpus():
    """Synthetic corpus in the boilerplate-prefix regime: half the docs
    share the same 4 leading tokens (30 docs on one sort key > w=8 ->
    head-key mass 500_000 ppm), near-dup pairs hidden in the tails."""
    rows = []
    for i in range(15):
        tail = f"alpha{i} bravo{i} charlie{i} delta{i} echo{i} foxtrot{i}"
        rows.append((2 * i, f"terms of service agreement {tail} golf{i}"))
        rows.append((2 * i + 1, f"terms of service agreement {tail} hotel{i}"))
    for i in range(30):
        rows.append(
            (
                100 + i,
                f"unique{i} head{i} words{i} here{i} body{i} text{i} tail{i}",
            )
        )
    return rows


def test_similarity_auto_routes_multipass_on_boilerplate_skew(spark):
    """Third regime (r7 verdict ask #5): over budget AND head-key mass
    over the skew gate -> the rotated-key multipass form, pair set equal
    to the direct _snm_multipass_pairs, with the consulted stats in the
    output schema."""
    from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (
        _snm_multipass_pairs,
        similarity_auto_pairs,
    )

    docs = spark.createDataFrame(_boilerplate_corpus(), ["doc_id", "text"])
    auto = similarity_auto_pairs(docs, budget=0).collect()
    assert auto
    assert {r["route"] for r in auto} == {"snm_multipass"}
    assert {r["skew_ppm"] for r in auto} == {500_000}
    direct = _snm_multipass_pairs(docs).collect()
    assert {
        (r["doc_lo"], r["doc_hi"], r["inter_cnt"], r["union_cnt"]) for r in auto
    } == {
        (r["doc_lo"], r["doc_hi"], r["inter_cnt"], r["union_cnt"])
        for r in direct
    }


def test_similarity_auto_oracle_branch_parity_all_routes(spark):
    """The DuckDB oracle must take the SAME branch and produce the SAME
    rows as the engine in EVERY regime — forced via the parameterized
    gates on the boilerplate corpus: budget huge -> ppjoin; budget 0 +
    skew gate huge -> snm; budget 0 + default skew gate -> multipass."""
    import duckdb
    import pandas as pd

    from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (
        _sim_auto_oracle,
        similarity_auto_pairs,
    )

    pdf = pd.DataFrame(_boilerplate_corpus(), columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("documents", pdf)
    cases = [
        ("ppjoin", 10**15, 100_000),
        ("snm", 0, 1_000_000),
        ("snm_multipass", 0, 100_000),
    ]
    for want_route, budget, skew in cases:
        eng = {
            tuple(r)
            for r in similarity_auto_pairs(
                docs, budget=budget, skew_budget_ppm=skew
            ).collect()
        }
        ora = {tuple(r) for r in con.sql(_sim_auto_oracle(budget, skew)).fetchall()}
        assert eng == ora, f"route {want_route}: engine != oracle"
        assert {r[4] for r in eng} == {want_route}


def test_candidate_estimate_is_exact_prefix_join_row_count(spark):
    """The router's gate must measure EXACTLY what it claims: the
    candidate estimate sum C(df_prefix(tok), 2) equals the number of
    ordered (doc_a < doc_b) row pairs the prefix equi-join would emit
    BEFORE the length/position filters and dedup — i.e. the work the
    budget bounds, not a proxy for it."""
    from pyspark.sql import functions as F

    from sparkstreamingrealtimedatawithkafka_spark.plans._util import t
    from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (
        _ppjoin_prefix_table,
        _ppjoin_shingle_table,
    )

    docs = t(spark, SF_DIR, "documents")
    s = _ppjoin_shingle_table(docs).localCheckpoint()
    pre = _ppjoin_prefix_table(s).localCheckpoint()
    est = (
        pre.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("cand"))
        .first()["cand"]
    )
    a = pre.select(F.col("doc_id").alias("doc_a"), "tok")
    b = pre.select(F.col("doc_id").alias("doc_b"), "tok")
    actual = a.join(b, "tok").filter(F.col("doc_a") < F.col("doc_b")).count()
    assert est == actual == 117268  # sf0.001 fixture value (also in the oracle A/B)


def test_snm_multipass_is_superset_of_single_pass(spark):
    """Rotated-key multipass can only ADD pairs (union semantics): its
    pair set must contain the single-pass set — the recall-hardening
    property that holds on every corpus, not just recall-1.0 fixtures.
    On this fixture pass 1 already has recall 1.0, so the sets are equal
    AND match the PPJoin exact ground truth."""
    from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (
        dedup_ppjoin_prefix,
        dedup_snm_multipass,
        dedup_sorted_neighborhood,
    )

    single = {
        (r["doc_lo"], r["doc_hi"])
        for r in dedup_sorted_neighborhood(spark, SF_DIR).collect()
    }
    multi = {
        (r["doc_lo"], r["doc_hi"])
        for r in dedup_snm_multipass(spark, SF_DIR).collect()
    }
    assert multi >= single and single
    exact = {
        (r["doc_a"], r["doc_b"]) for r in dedup_ppjoin_prefix(spark, SF_DIR).collect()
    }
    assert multi == exact  # fixture corpora: full recall
