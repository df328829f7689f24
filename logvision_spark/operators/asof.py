"""As-of (most-recent-match) join — an operator Spark's join menu lacks,
composed from existing DataFrame ops (the union + forward-fill-window
formulation), per the engine rule: compose built-ins before reaching for
Pandas UDFs.

Semantics (``direction``):
- ``backward`` (default): latest right row with right.ts <= left.ts;
- ``forward``: earliest right row with right.ts >= left.ts;
- ``nearest``: whichever of the two candidates is closer in time
  (ties prefer the backward/earlier row).
Equal timestamps match in every direction (inclusive).

Physical shape: one union, one shuffle by key, one sort per partition
(two sorts for ``nearest``) — the same cost class as a sort-merge join.
No per-key driver loops, no Python. Scale note: partitioning is by key
only; a single hyperactive key serializes its window — salt by coarse
time bucket first if a key can exceed one task's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = (),
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row + the matched right row per key.

    ``value_cols``: right columns to carry; the matched right timestamp
    always arrives as ``{right_ts}{suffix}``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")
    lcols = left.columns
    # frame constructions as single selectExpr calls (r18): the
    # withColumn chains and the per-field struct aliases cost a py4j
    # round trip per Column op — pure driver-side builder latency; the
    # parsed projections are the same expressions in the same output
    # order (named_struct mirrors the struct aliases, 1/0 literals the
    # lit() ints)
    l = left.selectExpr("*", "1 AS _src", f"`{left_ts}` AS _ts")
    # The matched right row travels as ONE struct, so every carried
    # field comes from the SAME row as the reported timestamp: filling
    # each column independently with last(ignorenulls) fabricated data —
    # a NULL value in the true match was silently replaced by a stale
    # value from an older row (review finding). Right rows with a NULL
    # key or NULL timestamp are excluded up front: SQL join semantics
    # never match NULL keys (Window.partitionBy would have grouped
    # them), and a row without a timestamp has no as-of position.
    pack_sql = "named_struct('_rts', `%s`%s)" % (
        right_ts,
        "".join(
            f", '{c}{suffix}', `{c}`" for c in value_cols
        ),
    )
    r = right.where(
        F.col(key).isNotNull() & F.col(right_ts).isNotNull()
    ).selectExpr(
        f"`{key}`",
        f"`{right_ts}` AS _rts",
        f"{pack_sql} AS _rpack",
        "0 AS _src",
        f"`{right_ts}` AS _ts",
    )

    combined = l.unionByName(
        r.select(key, "_src", "_ts", "_rpack"),
        allowMissingColumns=True,
    )
    # right rows (_src=0) sort before left rows at equal timestamps in
    # BOTH directions → equal-ts matches are inclusive
    w_back = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").desc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    suffixed = [f"{c}{suffix}" for c in value_cols]

    def unpack(pack, out_names):
        return [
            *[pack[name].alias(name) for name in out_names],
            pack["_rts"].alias(f"{right_ts}{suffix}"),
        ]

    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        filled = combined.select(
            "*", F.last(F.col("_rpack"), ignorenulls=True).over(w).alias("_f")
        )
        return filled.where(F.col("_src") == 1).select(
            *lcols, *unpack(F.col("_f"), suffixed)
        )

    # nearest: fill both directions, pick the closer candidate per row.
    # DELIBERATELY two windows with opposite sort orders, NOT one
    # ascending sort with a (currentRow, unboundedFollowing) frame for
    # the forward fill: Spark evaluates unbounded-FOLLOWING frames
    # non-incrementally (UnboundedFollowingWindowFunctionFrame
    # re-aggregates current→end for every row), which is O(m²) per key
    # — measured 50 s at a 20 k-row key and 232 s at 40 k (r6 review
    # finding; the fixture's tiny per-key groups hid it). Both frames
    # here are unbounded-PRECEDING on their own sort order, the
    # incremental O(m) frame, so the cost is two sorts, not a quadratic
    # scan.
    filled = combined.select(
        "*",
        F.last(F.col("_rpack"), ignorenulls=True).over(w_back).alias("_fb"),
        F.last(F.col("_rpack"), ignorenulls=True).over(w_fwd).alias("_ff"),
    ).where(F.col("_src") == 1)
    l_us = F.unix_micros(F.col("_ts"))
    back_us = F.unix_micros(F.col("_fb")["_rts"])
    fwd_us = F.unix_micros(F.col("_ff")["_rts"])
    use_back = F.col("_fb")["_rts"].isNotNull() & (
        F.col("_ff")["_rts"].isNull() | ((l_us - back_us) <= (fwd_us - l_us))
    )
    pick = F.when(use_back, F.col("_fb")).otherwise(F.col("_ff"))
    return filled.select(*lcols, *unpack(pick, suffixed))


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = (),
    suffix: str = "_asof",
    bucket: str = "1 hour",
    direction: str = "backward",
) -> DataFrame:
    """As-of join partitioned by (key, coarse time bucket) — the
    hot-key formulation this module's header prescribes: plain
    ``asof_join`` partitions its window by key alone, so one
    hyperactive key serializes its entire history through a single
    task. Here the fill window runs per (key, bucket) and boundary
    CARRY-INs supply each bucket with its cross-bucket candidate, so
    results are row-identical to ``asof_join`` in every direction:

    - ``backward``: per-(key, bucket) latest right pack via ``max_by``
      (an ordinary partial-aggregatable groupBy — a hot key spreads
      over its buckets, map-side combine shrinks it before the
      shuffle), then a running ``last`` over STRICTLY EARLIER buckets
      — this window's input is ONE ROW PER BUCKET, not per event, so
      the hyperactive key costs #buckets, not #rows. The carried pack
      is injected at the bucket START with a sort rank below every
      real row (_src=-1) and the usual ascending fill window runs per
      (key, bucket).
    - ``forward``: the mirror — per-bucket EARLIEST right pack via
      ``min_by``, running ``last`` over a DESCENDING bucket sort
      (strictly LATER buckets; the last non-null in that frame is the
      closest later bucket, whose min IS the global min over all
      later buckets since buckets are time-ordered), injected at the
      bucket END (start + width; real rows live in [start, end), so
      the carry strictly out-sorts them in the descending fill — no
      equal-ts tie is possible), descending fill window per
      (key, bucket).
    - ``nearest``: both carries travel in SEPARATE pack columns
      (_pb/_pf) so each fill only ever sees its own direction's packs
      — with a shared column the backward carry at the bucket floor
      would sit inside a boundary left row's forward frame (desc sort,
      equal ts, _src=-1 first) and win the forward fill with a PAST
      row. Both fills stay unbounded-PRECEDING on their own sort
      order — never a (currentRow, unboundedFollowing) frame, which
      Spark evaluates O(m²) per partition (asof.py r6 note; plan-
      tested in tests/test_asof.py).

    The carried pack's timestamp stays the TRUE matched row's — only
    its sort position moves. A right row exactly on a bucket boundary
    belongs to that bucket (never its own carry-in), so real rows
    always outrank the backward carry-in at equal sort ts.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")
    lcols = left.columns
    b = lambda c: F.window(F.col(c), bucket)["start"]  # noqa: E731
    # frame constructions as single selectExpr calls — same projections,
    # one parse instead of a py4j round trip per Column op (r18; see
    # asof_join's note)
    l = left.selectExpr(
        "*",
        "1 AS _src",
        f"`{left_ts}` AS _ts",
        f"window(`{left_ts}`, '{bucket}').start AS _b",
    )
    pack_sql = "named_struct('_rts', `%s`%s)" % (
        right_ts,
        "".join(
            f", '{c}{suffix}', `{c}`" for c in value_cols
        ),
    )
    r = right.where(
        F.col(key).isNotNull() & F.col(right_ts).isNotNull()
    ).selectExpr(
        f"`{key}`",
        f"`{right_ts}` AS _rts",
        f"{pack_sql} AS _rpack",
        "0 AS _src",
        f"`{right_ts}` AS _ts",
        f"window(`{right_ts}`, '{bucket}').start AS _b",
    )
    # spine over every (key, bucket) either side touches, so gaps
    # between right buckets still receive the carry. ONE per-bucket
    # aggregate and ONE spine join feed both carry directions (nearest
    # needs both; computing them separately doubled the carry stages).
    need_back = direction in ("backward", "nearest")
    need_fwd = direction in ("forward", "nearest")
    if value_cols:
        back_agg = F.expr("max_by(_rpack, _rts) AS _pmax")
        fwd_agg = F.expr("min_by(_rpack, _rts) AS _pmin")
    else:
        # value_cols=(): the pack is struct(_rts) alone, so the pack of
        # the max/min-_rts row IS struct(max/min(_rts)). max_by/min_by
        # carry a struct-typed aggregation buffer, which HashAggregate
        # cannot hold (mutable fixed-width types only) — the planner
        # falls back to SortAggregate and pays a full sort of the
        # filtered right side per direction. Plain max/min keep a
        # timestamp buffer → HashAggregate, and the struct is rebuilt
        # in the projection above the aggregate (r18; ties are
        # irrelevant — all tied packs are identical when the pack has
        # no value columns).
        back_agg = F.expr("named_struct('_rts', max(_rts)) AS _pmax")
        fwd_agg = F.expr("named_struct('_rts', min(_rts)) AS _pmin")
    rb = r.groupBy(key, "_b").agg(
        *([back_agg] if need_back else []),
        *([fwd_agg] if need_fwd else []),
    )
    # ONE distinct over the left's (key, bucket) pairs, FULL OUTER
    # joined to the per-bucket aggregate: every bucket either side
    # touches appears exactly once, and the right side is scanned and
    # aggregated ONCE. (The previous union-spine + left-join recomputed
    # rb in the executed plan — column pruning rewrote the spine branch
    # into a second, aggregate-free groupBy, so ReusedExchange never
    # fired and the right side shuffled twice. Both join children here
    # already hash-partition on (key, _b) from their own aggregates, so
    # the join adds no exchange.)
    sp = l.select(key, "_b").distinct().join(rb, [key, "_b"], "full_outer")

    def carry_spec(dir_: str):
        """(pack column, bucket sort order, injection timestamp) for a
        carry direction — the ONLY place these constants live; both
        carry_for and nearest's one-pass dual carry read them here."""
        if dir_ == "backward":
            return "_pmax", F.col("_b").asc(), F.col("_b")
        return "_pmin", F.col("_b").desc(), F.window(F.col("_b"), bucket)["end"]

    def carry_window(order):
        return Window.partitionBy(key).orderBy(order).rowsBetween(
            Window.unboundedPreceding, -1
        )

    def carry_for(dir_: str) -> DataFrame:
        """One carry row per (key, bucket): the cross-bucket candidate
        from strictly earlier (backward) / later (forward) buckets."""
        pack, order, inject_ts = carry_spec(dir_)
        return (
            sp.select(
                key,
                "_b",
                F.last(F.col(pack), ignorenulls=True)
                .over(carry_window(order))
                .alias("_rpack"),
            )
            .where(F.col("_rpack").isNotNull())
            .withColumn("_src", F.lit(-1))
            .withColumn("_ts", inject_ts)
        )

    w_back = (
        Window.partitionBy(key, "_b")
        .orderBy(F.col("_ts").asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key, "_b")
        .orderBy(F.col("_ts").desc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    suffixed = [f"{c}{suffix}" for c in value_cols]

    def unpack(pack):
        return [
            *[pack[name].alias(name) for name in suffixed],
            pack["_rts"].alias(f"{right_ts}{suffix}"),
        ]

    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        combined = l.unionByName(
            r.select(key, "_b", "_src", "_ts", "_rpack"),
            allowMissingColumns=True,
        ).unionByName(
            carry_for(direction).select(key, "_b", "_src", "_ts", "_rpack"),
            allowMissingColumns=True,
        )
        filled = combined.select(
            "*", F.last(F.col("_rpack"), ignorenulls=True).over(w).alias("_f")
        )
        return filled.where(F.col("_src") == 1).select(
            *lcols, *unpack(F.col("_f"))
        )

    # nearest: real right rows feed BOTH fills; each carry feeds only its own
    r_both = r.selectExpr(
        f"`{key}`", "_b", "_src", "_ts",
        "_rpack AS _pb", "_rpack AS _pf",
    )
    # BOTH carries in ONE pass over sp: calling carry_for() per
    # direction recomputes the whole sp subtree (left distinct + right
    # aggregate + join — full scans of both inputs) once per direction.
    # Instead: two windows over one sp child (same key partitioning —
    # one exchange — with one ascending and one descending bucket
    # sort over ONE ROW PER BUCKET), then explode each bucket into its
    # two injected carry rows. Frames, packs, and injection timestamps
    # all come from carry_spec — the same constants carry_for reads.
    bpack, border, binject = carry_spec("backward")
    fpack, forder, finject = carry_spec("forward")
    none_pack = F.when(F.lit(False), F.col("_cb"))  # typed NULL pack
    carries = (
        sp.select(
            key,
            "_b",
            F.last(bpack, ignorenulls=True).over(carry_window(border)).alias("_cb"),
            F.last(fpack, ignorenulls=True).over(carry_window(forder)).alias("_cf"),
        )
        .select(
            key,
            "_b",
            F.explode(
                F.array(
                    F.struct(
                        binject.alias("_ts"),
                        F.col("_cb").alias("_pb"),
                        none_pack.alias("_pf"),
                    ),
                    F.struct(
                        finject.alias("_ts"),
                        none_pack.alias("_pb"),
                        F.col("_cf").alias("_pf"),
                    ),
                )
            ).alias("_e"),
        )
        .select(
            key,
            "_b",
            F.col("_e._ts").alias("_ts"),
            F.col("_e._pb").alias("_pb"),
            F.col("_e._pf").alias("_pf"),
        )
        .where(F.col("_pb").isNotNull() | F.col("_pf").isNotNull())
        .withColumn("_src", F.lit(-1))
    )
    combined = l.unionByName(r_both, allowMissingColumns=True).unionByName(
        carries, allowMissingColumns=True
    )
    filled = combined.select(
        "*",
        F.last(F.col("_pb"), ignorenulls=True).over(w_back).alias("_fb"),
        F.last(F.col("_pf"), ignorenulls=True).over(w_fwd).alias("_ff"),
    ).where(F.col("_src") == 1)
    l_us = F.unix_micros(F.col("_ts"))
    back_us = F.unix_micros(F.col("_fb")["_rts"])
    fwd_us = F.unix_micros(F.col("_ff")["_rts"])
    use_back = F.col("_fb")["_rts"].isNotNull() & (
        F.col("_ff")["_rts"].isNull() | ((l_us - back_us) <= (fwd_us - l_us))
    )
    pick = F.when(use_back, F.col("_fb")).otherwise(F.col("_ff"))
    return filled.select(*lcols, *unpack(pick))
