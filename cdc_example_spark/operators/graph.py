"""Connected components by unrolled min-label propagation.

The terminal step of every dedup pipeline: near-dup PAIRS (MinHash-LSH,
SimHash banding, shingle overlap) must become CLUSTERS before a
survivor can be picked per cluster. Components here are computed by
label propagation — every vertex starts labeled with itself, and each
round replaces a vertex's label with the minimum over itself and its
neighbors — unrolled a FIXED number of rounds:

- a fixed unroll is a deterministic dataflow: the same relational plan
  runs on any engine, so the result is hash-checkable against a DuckDB
  oracle built from the identically-unrolled SQL (a data-dependent
  fixpoint loop would not be);
- convergence needs `diameter(component)` rounds. Dup clusters are
  near-cliques (diameter ≤ 2–3 in practice); callers pick ``rounds``
  with margin and tests assert convergence against a union-find model.

Scale shape: each round is one shuffle join + one partial-agg min —
the standard large-graph CC loop (GraphX/Pregel do exactly this with
checkpointing). The symmetric edge list appears in every round's
subplan, but every occurrence is the IDENTICAL exchange subtree, so
ReuseExchange computes and shuffles it once (same trick as q24's
self-join; the ``merge`` hint keeps the join shuffle-based — a
broadcast has no exchange to reuse). At 100 TB you add
``localCheckpoint`` every few rounds to cut lineage; at query scale
the pure plan keeps the bench's fresh-tier semantics honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: "int | str" = 6,
    materialize_edges: bool = True,
    checkpoint_every: int = 8,
    probe_round: int | None = None,
) -> DataFrame:
    """Label each vertex of the undirected ``edges`` graph with the
    minimum vertex id reachable within ``rounds`` hops (= its component
    id once ``rounds`` ≥ component diameter). Vertices are the edge
    endpoints — isolated rows never enter a dedup graph.

    ``rounds="auto"`` (VERDICT r3 item 6) iterates to the FIXPOINT
    instead: each round materializes its labels (eager localCheckpoint)
    and counts strictly-decreased labels — labels only ever decrease,
    so a zero-change round proves convergence for ANY diameter. This is
    the real-deployment mode for long-diameter graphs; the fixed unroll
    stays the default because a data-independent dataflow is what a
    cross-engine oracle can replay (q58), and dup clusters are
    near-cliques where 6 rounds is already 2–3× the diameter.

    ``materialize_edges`` (default) cuts the edge pipeline out of the
    round-loop lineage with a local checkpoint, exactly as GraphX/Pregel
    checkpoint between supersteps: each round's label frame references
    the previous round's TWICE (self side + neighbor side), so a pure
    plan re-derives the edge subtree exponentially often and only
    exchange reuse keeps it sane. The checkpoint makes the loop linear
    in ``rounds``; the edge RDD lives for the session (per-session cost,
    like the hot-table cache). Pass False for a pure re-executable plan
    (plan-shape tests).

    ``checkpoint_every`` bounds the label frame's lineage the same way
    (a checkpoint every K rounds): Catalyst planning cost grows with
    plan depth, and past ~10 unmaterialized rounds analysis time
    dominates execution. The default never triggers for the fixed
    6-round dedup unroll; long-diameter graphs need it.

    ``probe_round`` (r14, VERDICT r13 item 4): after unrolling that
    many rounds, run ONE construction-time convergence probe — the
    fixpoint mode's own-marker aggregate, executed once as a count —
    and, if the probe round changed nothing, STOP unrolling: labels are
    monotone non-increasing, so a zero-change round proves every
    remaining unrolled round is the identity and the shallower plan is
    provably equal to the full unroll (NOT a result cache: the emitted
    plan recomputes its rounds from the edges on every submission; only
    the unroll DEPTH is data-derived, the same adaptivity contract as
    AQE). Dup-cluster graphs are near-cliques where ``rounds`` carries
    2-3× diameter margin, so the probe usually halves the executed
    stage count — measured at sf0.1 (q58 dataflow, interleaved):
    fresh 0.82 → 0.36 s and the deep plan's one-time codegen 13.0 →
    3.5 s, labels byte-equal. Non-converged graphs pay one probe and
    keep the full declared unroll. Default None: exact prior dataflow.

    Returns (v, component).
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("w")).unionAll(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("w"))
    )
    if materialize_edges or rounds == "auto":
        sym = sym.localCheckpoint(eager=False)
    labels = sym.select(F.col("u").alias("v")).distinct().withColumn(
        "lbl", F.col("v")
    )
    if rounds == "auto":
        return _cc_to_fixpoint(sym, labels)
    for rnd in range(rounds):
        if materialize_edges and rnd and rnd % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=False)
        # min over {self} ∪ neighbors as ONE aggregate: union the
        # neighbor-propagated labels with the current ones and take the
        # per-vertex min — one join + one agg per round (a separate
        # left-join-back costs a third shuffle). No join-strategy
        # hints: with the edge list materialized there is no exchange
        # worth reusing, and Catalyst is free to broadcast the (usually
        # small) label frame; at cluster scale AQE sizes this per round.
        propagated = sym.join(labels, sym["w"] == labels["v"]).select(
            F.col("u"), F.col("lbl")
        )
        labels = (
            propagated.unionAll(labels.select(F.col("v").alias("u"), "lbl"))
            .groupBy("u")
            .agg(F.min("lbl").alias("lbl"))
            .select(F.col("u").alias("v"), "lbl")
        )
        if (
            probe_round is not None
            and rnd + 1 == probe_round
            and rnd + 1 < rounds
            and _cc_converged(sym, labels)
        ):
            break
    return labels.select("v", F.col("lbl").alias("component"))


def _cc_converged(sym: DataFrame, labels: DataFrame) -> bool:
    """One own-marker superstep executed as a count: True iff the next
    round would change zero labels (labels are monotone, so this is a
    true fixpoint witness for any diameter). Runs at CONSTRUCTION time,
    once; the returned plan never references it."""
    propagated = sym.join(labels, sym["w"] == labels["v"]).select(
        F.col("u"), F.col("lbl"), F.lit(False).alias("own")
    )
    stamped = (
        propagated.unionAll(
            labels.select(F.col("v").alias("u"), "lbl", F.lit(True).alias("own"))
        )
        .groupBy("u")
        .agg(
            F.min("lbl").alias("lbl"),
            F.min(F.when(F.col("own"), F.col("lbl"))).alias("prev"),
        )
    )
    return stamped.filter(F.col("lbl") < F.col("prev")).count() == 0


def _cc_to_fixpoint(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """Min-label propagation iterated until a round changes nothing.

    Per round: the same one-join-one-agg superstep as the unrolled
    loop, but the self rows carry an ``own`` marker so the aggregate
    yields BOTH the new label (min over {self} ∪ neighbors) and the
    previous one — the convergence probe is then a count on the already
    materialized round output, not a second join. The eager
    localCheckpoint per round is what Pregel/GraphX do between
    supersteps: it bounds lineage AND makes the count() read the
    computed round instead of re-deriving it. Labels are monotone
    non-increasing, so changed == 0 is a true fixpoint for any
    diameter (a path graph of n vertices takes n-1 rounds + 1 probe).
    """
    while True:
        propagated = sym.join(labels, sym["w"] == labels["v"]).select(
            F.col("u"), F.col("lbl"), F.lit(False).alias("own")
        )
        stamped = (
            propagated.unionAll(
                labels.select(F.col("v").alias("u"), "lbl", F.lit(True).alias("own"))
            )
            .groupBy("u")
            .agg(
                F.min("lbl").alias("lbl"),
                F.min(F.when(F.col("own"), F.col("lbl"))).alias("prev"),
            )
            .localCheckpoint(eager=True)
        )
        labels = stamped.select(F.col("u").alias("v"), "lbl")
        if stamped.filter(F.col("lbl") < F.col("prev")).count() == 0:
            return labels.select("v", F.col("lbl").alias("component"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    materialize_edges: bool = True,
) -> DataFrame:
    """PageRank by a FIXED unroll of the power iteration — the same
    cross-engine-replayable move as :func:`connected_components`:
    ``pr₀ = 1``; ``prₜ₊₁(v) = (1−d) + d·Σ_{(u,v)∈E} prₜ(u)/outdeg(u)``
    (the classic unnormalized formulation; nodes without out-edges
    simply leak their mass, as in the original paper's simple variant).
    A data-independent unroll is a deterministic dataflow, so an
    identically-unrolled SQL oracle hash-checks it (q79); deployments
    wanting convergence iterate with localCheckpoint every few rounds
    exactly like CC's ``rounds="auto"``.

    Scale shape per iteration: one shuffle join of the edge list with
    the group-cardinality rank frame + one partial-agg sum — the
    standard Pregel step. The (edges ⋈ outdeg) contribution frame is
    iteration-invariant and appears in every unrolled level as the
    IDENTICAL subtree, so ReuseExchange shuffles it once.

    Join strategy is picked DELIBERATELY and size-derived (guide §3.1):
    the rank/contribution frames are |nodes|-cardinality, and the
    checkpointed edge list plans as a LogicalRDD with UNKNOWN stats, so
    Catalyst's static planner can never see that they fit a broadcast —
    it sorts the corpus-sized edge partitions in BOTH per-iteration
    joins forever. When the edges are materialized the node count is
    one cheap job, and if the built rank relation provably fits the
    session's own broadcast threshold, both per-iteration joins hint
    ``broadcast``: the edge pass becomes a scan + hash probe with ZERO
    per-iteration exchanges except the contribution partial-agg
    (measured at sf0.1: 2.6 s → 0.7 s fresh for 5 iterations on 587 k
    edges / 16 k nodes). Past the threshold — the 100 TB graph — the
    shuffle plan stands unchanged.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if materialize_edges:
        # same move (and same rationale) as connected_components'
        # materialize_edges: the deduped edge list is referenced by
        # every unrolled level (contribution side) plus outdeg and the
        # node set — a pure plan re-executes the upstream edge pipeline
        # per reference. One eager localCheckpoint cuts it to a single
        # computation, the Pregel between-superstep checkpoint.
        e = e.localCheckpoint(eager=True)
    out = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    contrib_edges = e.join(out, "src").select(
        "src", "dst", F.col("deg").cast("double").alias("deg")
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    bc_ranks = False
    if materialize_edges:
        # ~64 B/row for the built (long, double) hash relation — a
        # deliberately fat per-row estimate so the gate errs toward the
        # always-correct shuffle plan. Threshold ≤ 0 disables, exactly
        # like Catalyst's own auto-broadcast gate.
        threshold = _broadcast_threshold_bytes(edges.sparkSession)
        bc_ranks = threshold > 0 and nodes.count() * 64 <= threshold
    if bc_ranks:
        # On the broadcast path the iteration-invariant contribution
        # frame is a BHJ STREAM side — there is no exchange above it
        # for ReuseExchange to dedup, so a pure plan would re-run the
        # (e ⋈ outdeg) sort-merge every iteration (measured: 5 extra
        # 587 k-row sort+merge passes at sf0.1). Materialize it once;
        # each unrolled level then reads the checkpointed rows and hash-
        # probes the broadcast ranks with zero per-iteration exchanges.
        # The shuffle path keeps the pure plan: its per-level subtrees
        # are identical, so ReuseExchange already shuffles them once.
        contrib_edges = contrib_edges.localCheckpoint(eager=True)
    ranks = nodes.select("id", F.lit(1.0).alias("pr"))
    for _ in range(iters):
        r = F.broadcast(ranks) if bc_ranks else ranks
        contribs = (
            contrib_edges.join(r, contrib_edges.src == r["id"])
            .select("dst", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        # join 2 stays a shuffle join even on the broadcast path: both
        # sides are |nodes|-bounded (tiny here), and an interleaved A/B
        # measured the extra per-iteration broadcast build SLOWER than
        # the small shuffle (2.7 s vs 2.1 s for the 5-iteration plan) —
        # the serial driver-side broadcast chain costs more than it
        # saves once the corpus-sized side is already hash-probed.
        ranks = nodes.join(
            contribs, nodes.id == contribs.dst, "left"
        ).select(
            "id",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("pr"),
        )
    return ranks


def _broadcast_threshold_bytes(spark) -> int:
    """``spark.sql.autoBroadcastJoinThreshold`` as bytes (the conf API
    returns whatever string the session was configured with — plain
    bytes, or a size suffix on a vanilla session's '10MB' default).

    The gate's contract is "err toward the always-correct shuffle
    plan", so parsing must NEVER raise (ADVICE r13): Spark accepts
    t/tb/p/pb suffixes and fractional values ('1.5g') that the r13
    parser rejected with ValueError — crashing pagerank outright on
    such sessions. Unparseable values now return 0 (broadcast
    disabled), the same fallback as an explicit threshold ≤ 0."""
    try:
        raw = str(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        ).strip().lower()
        for suffix, mult in (
            ("kb", 1024), ("mb", 1024**2), ("gb", 1024**3),
            ("tb", 1024**4), ("pb", 1024**5),
            ("k", 1024), ("m", 1024**2), ("g", 1024**3),
            ("t", 1024**4), ("p", 1024**5), ("b", 1),
        ):
            if raw.endswith(suffix):
                return int(float(raw.removesuffix(suffix)) * mult)
        return int(raw)
    except Exception:
        return 0
