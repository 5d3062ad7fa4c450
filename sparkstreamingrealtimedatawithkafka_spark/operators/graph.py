"""Graph operators: connected components for dedup-cluster collapse.

A near-dup pass (operators/dedup.py) emits PAIRS, but a dedup pipeline
needs CLUSTERS — near-duplication is transitive in practice (A~B, B~C ⇒
keep one of {A,B,C}), so the pairs form a graph whose connected components
are the duplicate groups. The canonical keep-document is then the min id
per component, mirroring exact dedup's keep-first rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 30
) -> DataFrame:
    """Connected components via min-label propagation: every node's label
    converges to the minimum node id in its component. Returns
    (node, label) for every node that appears in an edge.

    Each iteration is one shuffle (join labels to the symmetric edge list,
    fold with min); iterations needed = graph diameter. Duplicate clusters
    have tiny diameters (near-dup graphs are dense blobs, not paths), so
    this converges in a handful of rounds; for adversarial long-path
    graphs, the large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) drops the
    round count to ~log n and slots into the same loop shape.

    Scale hygiene, both load-bearing at 100 TB:
    - ``localCheckpoint`` per round truncates the lineage — without it the
      plan doubles every iteration and planning time explodes long before
      data size matters;
    - convergence is detected by the invariant that the label SUM strictly
      decreases until fixpoint (labels only ever move down), so the check
      is a cheap single-row aggregate per round, not a self-join diff —
      and the aggregate rides the checkpoint materialization itself via
      ``observe`` (fires on localCheckpoint's eager job), so each round is
      ONE Spark job, not checkpoint + a separate sum-collect. Job-launch
      overhead is the whole cost on small duplicate graphs: same-session
      min-of-4 A/B on the 188-pair sf0.1 graph, 0.57 s -> 0.43 s,
      identical labels — and the saving is per ROUND, so it grows with
      graph diameter.
    """
    # Materialize the symmetric edge list ONCE. ``edges`` is typically the
    # output of a whole near-dup pipeline (LSH banding + verification);
    # without this checkpoint every propagation round would recompute that
    # entire upstream plan — measured ~1.5s/round on the full-dedup bench
    # entry. The edge set is pairs-only (two longs a row), far smaller than
    # the corpus, so materializing it is the cheap side of the trade at any
    # scale.
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .union(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
        .localCheckpoint()
    )
    # labels carries its node column as "lnode" so the per-round join
    # against sym can't hit Spark's ambiguous-self-join check (labels
    # derives from sym, so both would otherwise own the same attribute).
    # Round 1 is FUSED: with identity labels, label(nbr) == nbr, so the
    # propagation join is the edge list itself — one aggregate computes
    # label1(node) = min(node, min of neighbors), saving the initial
    # distinct + checkpoint and the first join round (the LPA round-1
    # lesson applied to CC).
    obs = Observation("cc_label_sum")
    labels = (
        sym.select(F.col("node").alias("lnode"), F.col("node").alias("label"))
        .union(
            sym.select(F.col("node").alias("lnode"), F.col("nbr").alias("label"))
        )
        .groupBy("lnode")
        .agg(F.min("label").alias("label"))
        .observe(obs, F.sum("label").alias("s"))
        .localCheckpoint()
    )
    prev_sum = obs.get["s"]

    for _ in range(max_iter - 1):
        prop = sym.join(labels, sym["nbr"] == labels["lnode"]).select(
            F.col("node").alias("lnode"), F.col("label")
        )
        obs = Observation("cc_label_sum")
        labels = (
            labels.union(prop)
            .groupBy("lnode")
            .agg(F.min("label").alias("label"))
            .observe(obs, F.sum("label").alias("s"))
            .localCheckpoint()
        )
        new_sum = obs.get["s"]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(F.col("lnode").alias("node"), "label")


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_rounds: int = 50
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the O(log n)-round alternative to
    ``connected_components``'s min-label propagation, whose round count
    is the graph DIAMETER. Near-dup graphs are dense blobs (diameter
    2-3), so min-label is the right default there; this operator is for
    adversarial long-path / high-diameter graphs (linkage chains, road
    networks, time-adjacency graphs), where diameter-many shuffles is
    the difference between 3 rounds and 3000.

    One round = large-star (every node's strictly-larger neighbors
    attach to its minimum neighborhood member) then small-star (every
    node's smaller-or-equal neighbors re-attach to the local minimum):
    each is ONE groupBy(min) + one equi-join back — same shuffle shape
    as a propagation round, but the edge set contracts geometrically
    instead of labels creeping one hop per round. Convergence: the edge
    set reaches the star forest (node -> component min) and stops
    changing; probed per round with the O(1) scalar discipline
    (BIT_XOR(xxhash64(a, b)) + count riding the localCheckpoint job via
    ``observe`` — the pair rows are unique, so the hash moves whenever
    the set does, w.h.p.). Returns (node, label) for every node that
    appears in an edge, label = min node id of its component — the SAME
    contract as ``connected_components``; equality on random graphs and
    a 200-node path is pinned in tests.
    """
    # nodes come off the RAW edge list so a node appearing only in a
    # self-loop edge still gets its (x, x) row — the same contract as
    # ``connected_components``, which unions both endpoints before any
    # filtering. The contraction rounds below then drop self-loops.
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    nodes = (
        raw.select(F.col("a").alias("node"))
        .union(raw.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # canonical undirected pairs (a > b not required yet; just a != b)
    e = raw.filter(F.col("a") != F.col("b")).distinct().localCheckpoint()
    prev_hash = None
    for _ in range(max_rounds):
        # ---- large-star: from each node u, every neighbor v > u attaches
        # to m(u) = min(neighborhood(u) + u). Processes each undirected
        # edge from BOTH endpoints via the symmetric expansion; output
        # edges all point strictly downward (v > m by construction).
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mn = sym.groupBy("u").agg(F.min("v").alias("mnv"))
        ls = (
            sym.join(mn, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("a"),
                F.least(F.col("mnv"), F.col("u")).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # ---- small-star: edges now point downward (b < a). For each a,
        # re-attach its smaller endpoints (and a itself) to m = min(b).
        mn2 = ls.groupBy("a").agg(F.min("b").alias("m"))
        rewired = (
            ls.join(mn2, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        obs = Observation("cc_star_edge_hash")
        e = (
            rewired.union(mn2.select(F.col("a"), F.col("m").alias("b")))
            .distinct()
            .observe(
                obs,
                F.expr("bit_xor(xxhash64(a, b))").alias("h"),
                F.count(F.lit(1)).alias("n"),
            )
            .localCheckpoint()
        )
        h = (obs.get["h"], obs.get["n"])
        if h == prev_hash:
            break
        prev_hash = h
    # e is now the star forest: (node, component-min) for non-roots.
    # Roots (and only roots) never appear on the left; they label
    # themselves. Isolated nodes can't occur (every input row is an edge).
    return nodes.join(
        e.select(F.col("a").alias("node"), F.col("b").alias("label")),
        "node",
        "left",
    ).select("node", F.coalesce("label", F.col("node")).alias("label"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int | None = None,
    max_rounds: int = 30,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """Synchronous label propagation (LPA) over a symmetric directed edge
    list (both directions present, as ``copurchase_edges`` emits): every
    node adopts the most frequent label among its neighbors each round,
    ties broken to the smallest label so the result is deterministic.
    Returns (node, lbl) for every node with an in-edge.

    ``rounds=N`` is the FIXED-DEPTH mode the catalog entry uses
    (oracle-replayable as an unrolled CTE chain — N=4 there is a demo
    depth, not a convergence claim). ``rounds=None`` is CONVERGED MODE:
    iterate until the label assignment reaches a fixpoint, detected per
    round with the same O(1)-scalar discipline as
    ``connected_components`` — one single-row aggregate,
    BIT_XOR(xxhash64(node, lbl)), changes whenever any label changes
    (w.h.p.; (node, lbl) rows are unique per node so no xor-cancellation,
    and xor can't hit ANSI mode's int64 SUM overflow) and costs no
    self-join diff. Capped at ``max_rounds`` because
    synchronous LPA can 2-cycle on bipartite-ish neighborhoods (the
    classic LPA caveat); a production run picks the cap by graph diameter
    expectations and treats hitting it as "oscillating, take the current
    assignment".

    The per-round argmax rides one integer encoding (score = n·K − lbl,
    decode lbl = K − score mod K), so each round is ONE equi-join keyed
    on the edge source plus two keyed aggregates — no window, no UDF.
    Round 1 is fused: identity labels make the label join a no-op, so
    the edge list groups directly (saves a distinct + join off the
    front).

    Lineage cuts are INTERVAL-based in fixed-depth mode: a
    localCheckpoint every ``checkpoint_interval`` rounds (never after
    the final round — the consumer's own action executes the last
    segment), so a demo-depth run (rounds=4) is ONE unrolled Spark job
    instead of one materialization job per round — isolated min-of-3 at
    sf0.1: 3.18 s -> 2.09 s, labels identical — while deep runs still
    cut the plan every 4 rounds before planning time can compound.
    Converged mode checkpoints every round regardless: the fixpoint
    probe needs each round's labels materialized anyway, and the
    ``observe`` scalar rides that job for free.
    """
    K = 1_000_000_000  # argmax encoding: score = n*K - lbl (0 < lbl < K)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    labels = None
    prev_hash = None
    done = 0
    while (rounds is not None and done < rounds) or (
        rounds is None and done < max_rounds
    ):
        if labels is None:
            counts = e.groupBy(
                F.col("dst").alias("node"), F.col("src").alias("lbl")
            ).agg(F.count(F.lit(1)).alias("n"))
        else:
            counts = (
                e.join(labels.select(F.col("node").alias("src"), "lbl"), "src")
                .groupBy(F.col("dst").alias("node"), "lbl")
                .agg(F.count(F.lit(1)).alias("n"))
            )
        labels = counts.groupBy("node").agg(
            (F.lit(K) - (F.max(F.col("n") * K - F.col("lbl")) % K))
            .cast("long")
            .alias("lbl")
        )
        if rounds is None:
            # the probe rides the checkpoint job via observe (fires on
            # localCheckpoint's eager materialization) — one job per
            # round, not checkpoint + a separate collect
            obs = Observation("lpa_label_hash")
            labels = labels.observe(
                obs, F.expr("bit_xor(xxhash64(node, lbl))").alias("h")
            ).localCheckpoint()
            done += 1
            h = obs.get["h"]
            if h == prev_hash:
                break
            prev_hash = h
        else:
            done += 1
            if done % checkpoint_interval == 0 and done < rounds:
                labels = labels.localCheckpoint()
    return labels


def kcore(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 4,
    rounds: int | None = None,
    max_rounds: int = 30,
) -> DataFrame:
    """k-core peeling (Seidman's degeneracy algorithm) over a SYMMETRIC
    directed edge list (both directions present, as ``copurchase_edges``
    emits — so out-degree IS degree): repeatedly drop nodes with degree
    < k and the edges touching them. Returns the surviving edge list
    (src, dst).

    ``rounds=N`` is fixed-depth (the ``graph_kcore`` catalog entry's
    oracle-replayable demo form — it keeps its own loop because its
    output is per-round STATS, but it must stay in lockstep with this
    operator; pinned by test). ``rounds=None`` is CONVERGED mode —
    peel to the true k-core — with the O(1)-scalar discipline of the
    other iterative operators: edges only ever shrink, so the edge
    COUNT is monotone and "count unchanged" means "edge set unchanged";
    the count rides each round's localCheckpoint job via ``observe``.
    Per-round checkpoints are load-bearing here (not hygiene): each
    round's edge list is referenced three times by the next round
    (degree aggregate + two semi-joins), so skipping the cut would
    replay the whole peel pyramid per reference. AQE converts the
    survivor semi-joins to broadcasts at fixture scale and keeps
    shuffle joins when the survivor set outgrows the threshold —
    verified in the executed plan (ReusedExchange on the edge side,
    BroadcastHashJoin x2).
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint()
    prev_n = None
    done = 0
    while (rounds is not None and done < rounds) or (
        rounds is None and done < max_rounds
    ):
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select(F.col("src").alias("node"))
        )
        obs = Observation("kcore_n_edges")
        e = (
            e.join(keep.withColumnRenamed("node", "src"), "src", "semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "semi")
            .select("src", "dst")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        done += 1
        if rounds is None:
            n = obs.get["n"]
            if n == prev_n:
                break
            prev_n = n
    return e


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int | None = 5,
    base_ppm: int = 150_000,
    damp_pct: int = 85,
    max_iterations: int = 120,
    checkpoint_interval: int = 4,
    tol_ppm: int = 0,
) -> DataFrame:
    """PageRank with EXACT INTEGER arithmetic (ppm-scaled):
    r'(v) = base_ppm + damp_pct% * Σ_{u→v} (r(u) div deg(u)), all in
    int64 ``div`` — so the result is bit-identical on any engine and
    hash-checkable, where float PageRank's cross-engine sum order never
    is. The standard damping algebra survives: truncating div loses
    < deg(u) ppm per term, identically on both engines.

    Same scale hygiene as ``connected_components``: the symmetric edge
    list + out-degrees materialize ONCE (one localCheckpoint, pairs-only
    rows); each iteration is one join + one shuffle on the destination
    key. Lineage cuts are INTERVAL-based in fixed-depth mode (a
    localCheckpoint every ``checkpoint_interval`` iterations, never
    after the last — the ``label_propagation`` lesson: a demo-depth run
    is one unrolled job, deep runs still cut the plan before planning
    time compounds); converged mode checkpoints every round because the
    fixpoint probe rides that job.

    ``iterations=N`` is FIXED-DEPTH mode — the catalog entry's choice,
    keeping the oracle replayable as an unrolled SQL CTE chain (a DEMO
    DEPTH, like ``label_propagation(rounds=N)``). ``iterations=None`` is
    CONVERGED MODE: iterate until the integer rank assignment reaches an
    exact fixpoint — integer ranks make exact detection meaningful where
    float PageRank needs an epsilon — probed per round with the same
    O(1) single-row scalar as converged LPA (BIT_XOR(xxhash64(node, r)),
    riding the localCheckpoint job via ``observe`` so the probe costs no
    second job). The damped map contracts geometrically at rate
    damp_pct/100, so reaching the EXACT integer fixpoint takes about
    log(1e6)/log(100/damp_pct) rounds (~85 at the default 85% — a
    property of the ppm resolution, not the graph; measured 76 on a
    5-node fixture). ``max_iterations`` defaults above that; truncation
    can in principle leave a ±1ppm limit cycle instead of a strict
    fixpoint, and hitting the cap means "take the current assignment"
    (the converged-LPA cap contract).

    ``tol_ppm > 0`` (converged mode only) is the PRODUCTION exit: stop
    when no rank moved more than tol_ppm this round — max|Δ| ≤ tol exits
    after ~log(1e6/tol)/log(100/damp_pct) rounds (~43 at tol=1000, damp
    85%) instead of the exact probe's ~85, at the cost of an extra
    equi-join per round against the previous (checkpointed, so
    replayed-from-blocks) assignment. The delta scalar rides the same
    checkpoint job via ``observe``. tol_ppm=0 keeps the exact-hash
    probe, which is what makes that mode cross-engine replayable.
    Returns (node, rank_ppm) for every node in an edge.
    """
    if tol_ppm > 0 and iterations is not None:
        raise ValueError(
            "tol_ppm is a converged-mode exit (iterations=None); "
            f"got iterations={iterations} with tol_ppm={tol_ppm} — a "
            "fixed-depth run would silently ignore the tolerance"
        )
    sym = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = sym.join(deg, "src").localCheckpoint()
    ranks = None
    prev_hash = None
    done = 0
    while (iterations is not None and done < iterations) or (
        iterations is None and done < max_iterations
    ):
        if ranks is None:
            # round 1 fused: ranks are uniform (1_000_000), so the rank
            # join is a no-op — contributions come straight off the edge
            # list, saving the initial distinct and the first join (the
            # LPA/CC round-1 lesson)
            contrib = ed.select(
                F.col("dst"), F.expr("1000000 div deg").alias("c")
            )
        else:
            contrib = ed.join(ranks, ed.src == ranks.node).select(
                F.col("dst"), F.expr("r div deg").alias("c")
            )
        prev = ranks
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (
                F.lit(base_ppm) + F.expr(f"({damp_pct} * sum(c)) div 100")
            ).alias("r")
        )
        if iterations is None and tol_ppm > 0:
            if prev is None:
                # no previous assignment to diff against — round 1 just
                # materializes; the delta exit starts at round 2
                ranks = ranks.localCheckpoint()
                done += 1
                continue
            obs = Observation("pr_rank_delta")
            ranks = (
                ranks.join(
                    prev.select(
                        F.col("node").alias("pn"), F.col("r").alias("pr")
                    ),
                    F.col("node") == F.col("pn"),
                )
                .select(
                    "node", "r", F.abs(F.col("r") - F.col("pr")).alias("d")
                )
                .observe(obs, F.max("d").alias("m"))
                .select("node", "r")
                .localCheckpoint()
            )
            done += 1
            if int(obs.get["m"] or 0) <= tol_ppm:
                break
        elif iterations is None:
            obs = Observation("pr_rank_hash")
            ranks = ranks.observe(
                obs, F.expr("bit_xor(xxhash64(node, r))").alias("h")
            ).localCheckpoint()
            done += 1
            h = obs.get["h"]
            if h == prev_hash:
                break
            prev_hash = h
        else:
            done += 1
            if done % checkpoint_interval == 0 and done < iterations:
                ranks = ranks.localCheckpoint()
    return ranks.select("node", F.col("r").alias("rank_ppm"))
