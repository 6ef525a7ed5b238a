"""Distributed EXACT grouped percentiles: sketch-bracket + refinement.

The naive exact algorithm materializes every value of every group in
one place (a per-group sort, or an Arrow transfer into np.percentile —
``queries/batch.q41``'s original shape). That is fine while groups fit
a task, but the transfer grows linearly with the fact table: at the
60 M-row scaling shard the pandas path spends ~20 s moving values.

This operator computes the same exact linear-interpolation percentiles
(np.percentile / SQL ``percentile_cont`` semantics) in scan-bound
distributed passes:

1. **Bracket pass** — per group: row count + a Greenwald–Khanna sketch
   (``percentile_approx``) evaluated at ``q ± margin``. GK's rank error
   is DETERMINISTIC (≤ n/accuracy), so values at the widened quantiles
   are guaranteed value-space brackets around the true percentile;
   ``margin = 4/accuracy`` leaves 4× slack.
2. **Refinement** — two narrow scans, both map-side partial-aggregated:
   (a) a conditional-sum ``groupBy(group)`` counts strictly-below-
   bracket values per (column, quantile) pair — ONE output row per
   group, no row explosion at all (the r4 shape exploded every row
   into |pairs| structs — 180 M generated rows at the 60 M shard —
   then collapsed most of them back into NULL-key partials; the
   conditional sums do the same arithmetic inside one codegen'd agg);
   (b) a generator emits ONLY in-bracket values (``F.filter`` on the
   struct array before ``explode``), which GK bounds at ~8·n/accuracy
   rows per pair — the (value, count) histogram shuffle is tiny by
   construction. A window cumsum over that histogram locates the
   global floor/ceil order statistics, and the standard interpolation
   ``v_lo + frac·(v_hi − v_lo)`` finishes on a handful of rows.

No value stream ever leaves the executors. NULLs are excluded (SQL
percentile semantics); rank arithmetic uses each column's non-null
count. A NULL group key is a legitimate SQL GROUP BY group — every
join below is null-safe so its row survives with real percentiles
(ADVICE r4: plain `[g]` joins silently dropped it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_exact_percentiles(
    df: DataFrame,
    group_col: str,
    specs: "list[tuple[str, list[float]]]",
    accuracy: int = 10_000,
) -> DataFrame:
    """Exact linear-interpolation percentiles per group.

    ``specs``: ``[(value_col, [q, ...]), ...]``. Returns one row per
    group with a double column ``{col}_p{int(q*100)}`` per requested
    quantile (np.percentile semantics, NULLs excluded).

    ``accuracy`` bounds refinement state: each (col, q) pair keeps at
    most ~8·n/accuracy in-bracket histogram rows.

    Raises ``ValueError`` on a repeated column or quantile — the
    per-column sketch aliases (``_b_{c}``/``_n_{c}``) and the pair
    index are keyed by name, so duplicates would silently collide
    (ADVICE r4); merge the quantile lists per column instead.
    """
    seen: set[str] = set()
    for c, qs in specs:
        if c in seen:
            raise ValueError(
                f"grouped_exact_percentiles: column {c!r} appears in multiple "
                "specs entries — merge its quantile lists into one entry"
            )
        seen.add(c)
        if len(qs) != len(set(qs)):
            raise ValueError(
                f"grouped_exact_percentiles: duplicate quantiles for column {c!r}"
            )
    pairs = [(c, q) for c, qs in specs for q in qs]
    margin = 4.0 / accuracy
    g = group_col

    # ---- pass 1: per-group counts + GK value brackets ----------------
    # ONE sketch per COLUMN, evaluated at every requested quantile's
    # widened bounds in a single array call — a per-(col, q) sketch
    # would rebuild the identical GK structure once per quantile
    # (measured 18.9 → 14.7 s at the 60 M-row shard for
    # (price×2, qty×1)). Same sketch + same accuracy ⇒ identical
    # bracket values.
    aggs = []
    bref: dict[int, tuple[str, int]] = {}  # pair t → (column, offset into bounds)
    for c, qs in specs:
        bounds = []
        for q in qs:
            t = pairs.index((c, q))
            bref[t] = (c, len(bounds))
            bounds += [max(0.0, q - margin), min(1.0, q + margin)]
        aggs.append(
            F.percentile_approx(
                F.col(c).cast("double"),
                F.array(*[F.lit(b) for b in bounds]),
                accuracy,
            ).alias(f"_b_{c}")
        )
        aggs.append(F.count(F.col(c)).alias(f"_n_{c}"))
    stats = df.groupBy(g).agg(*aggs)

    # group-cardinality broadcast of the brackets back onto the rows;
    # null-safe so a NULL-key group's rows still meet their bracket row.
    st = stats.withColumnRenamed(g, "_g")
    joined = df.join(F.broadcast(st), F.col(g).eqNullSafe(F.col("_g"))).drop("_g")

    def _bracket(t: int):
        c = pairs[t][0]
        _, off = bref[t]
        v = F.col(c).cast("double")
        vlo = F.element_at(F.col(f"_b_{c}"), off + 1)
        vhi = F.element_at(F.col(f"_b_{c}"), off + 2)
        # Rank-slack proof: GK guarantees |rank − φ·n| ≤ n/accuracy, and
        # its φ·n rank convention sits ≤ 1 off np.percentile's (n−1)·q.
        # With margin = 4/accuracy the bracket's slack is 4n/acc −
        # n/acc − 2 = 3n/acc − 2 ranks, which is ≥ 1 only when
        # n ≥ accuracy — so SMALL groups (n ≤ accuracy) skip the
        # bracket and keep their full histogram instead (≤ accuracy
        # rows, the same state bound the bracket gives big groups).
        small = F.col(f"_n_{c}") <= accuracy
        return v, vlo, vhi, small

    # ---- pass 2a: below-bracket counts, one row per group ------------
    lt_aggs = []
    for t, (c, q) in enumerate(pairs):
        v, vlo, _, small = _bracket(t)
        lt_aggs.append(
            F.sum(
                F.when(v.isNotNull() & ~small & (v < vlo), 1).otherwise(0)
            ).alias(f"_lt_{t}")
        )
    ltw = joined.groupBy(g).agg(*lt_aggs)
    nlt = ltw.select(
        g,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        F.col(f"_lt_{t}").cast("long").alias("n_lt"),
                    )
                    for t in range(len(pairs))
                ]
            )
        ).alias("s"),
    ).select(g, "s.*")
    # per-(group, pair) non-null count rides along from pass 1
    npair = stats.select(
        F.col(g),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), F.col(f"_n_{c}").alias("n"))
                    for t, (c, q) in enumerate(pairs)
                ]
            )
        ).alias("s"),
    ).select(g, "s.*")
    nlt = nlt.join(
        F.broadcast(npair.withColumnRenamed(g, "_g").withColumnRenamed("t", "_t")),
        F.col(g).eqNullSafe(F.col("_g")) & (F.col("t") == F.col("_t")),
    ).drop("_g", "_t")

    # ---- pass 2b: in-bracket histogram ONLY -------------------------
    # F.filter prunes the struct array BEFORE the generator runs, so
    # explode emits ~8·n/accuracy rows per pair, not one per input row.
    structs = []
    for t, (c, q) in enumerate(pairs):
        v, vlo, vhi, small = _bracket(t)
        inb = v.isNotNull() & (small | ((v >= vlo) & (v <= vhi)))
        structs.append(
            F.when(inb, F.struct(F.lit(t).alias("t"), v.alias("v")))
        )
    hist = (
        joined.select(
            g,
            F.explode(
                F.filter(F.array(*structs), lambda s: s.isNotNull())
            ).alias("s"),
        )
        .groupBy(g, F.col("s.t").alias("t"), F.col("s.v").alias("hv"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    # ---- locate + interpolate on the tiny histogram ------------------
    qcol = F.element_at(F.array(*[F.lit(float(q)) for _, q in pairs]), F.col("t") + 1)
    p = (F.col("n") - 1).cast("double") * qcol
    w = Window.partitionBy(g, "t").orderBy("hv")
    nltr = nlt.withColumnRenamed(g, "_g").withColumnRenamed("t", "_t")
    cum = (
        hist.join(
            F.broadcast(nltr),
            F.col(g).eqNullSafe(F.col("_g")) & (F.col("t") == F.col("_t")),
        )
        .drop("_g", "_t")
        .withColumn("C", F.sum("cnt").over(w))
    )
    first_idx = F.col("n_lt") + F.col("C") - F.col("cnt")  # global index of run start
    end_idx = F.col("n_lt") + F.col("C")  # one past run end
    has_lo = (first_idx <= F.floor(p)) & (F.floor(p) < end_idx)
    has_hi = (first_idx <= F.ceil(p)) & (F.ceil(p) < end_idx)
    # Fail-loud contract (ADVICE r3): the GK rank guarantee makes a
    # bracket miss impossible by construction — if floor(p)/ceil(p)
    # still falls outside every in-bracket run, that is a bug (or a
    # violated sketch contract), and it must surface as an error, not
    # as a silently-NULL percentile.
    bracket_ok = F.assert_true(
        F.col("lo").isNotNull() & F.col("hi").isNotNull(),
        F.lit(
            "grouped_exact_percentiles: GK bracket miss — floor/ceil rank "
            "outside every in-bracket histogram run"
        ),
    )
    per = (
        cum.filter(has_lo | has_hi)
        .groupBy(g, "t")
        .agg(
            F.max(F.when(has_lo, F.col("hv"))).alias("lo"),
            F.max(F.when(has_hi, F.col("hv"))).alias("hi"),
            F.first(p - F.floor(p)).alias("frac"),
        )
        .select(
            g,
            "t",
            F.when(
                bracket_ok.isNull(),  # assert_true → NULL on success, throws on miss
                F.col("lo") + F.col("frac") * (F.col("hi") - F.col("lo")),
            ).alias("val"),
        )
    )
    out_aggs = [
        F.max(F.when(F.col("t") == t, F.col("val"))).alias(f"{c}_p{int(q * 100)}")
        for t, (c, q) in enumerate(pairs)
    ]
    # Re-anchor on the pass-1 group list: a group whose value column is
    # entirely NULL has no in-bracket rows at all and would vanish from
    # ``per`` — SQL semantics keep the group row with NULL percentiles
    # (both frames are group-cardinality; Catalyst broadcasts). The
    # eqNullSafe keeps a NULL group key matched to its computed row
    # (ADVICE r4: a plain `[g]` left join replaced its real values
    # with NULLs).
    pa = per.groupBy(g).agg(*out_aggs).withColumnRenamed(g, "_g")
    return (
        stats.select(g)
        .join(pa, F.col(g).eqNullSafe(F.col("_g")), "left")
        .drop("_g")
    )
