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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logvision_spark.operators.util import quote_ident as _qi
from logvision_spark.operators.util import validate_sql_literal as _lit


def _nearest_pick_sql(fb: str, ff: str) -> str:
    """SQL for the nearest-direction candidate pick: the backward pack
    when it exists and is at least as close as the forward one (ties
    prefer backward/earlier — `<=`), else the forward pack. One string
    so callers parse the whole CASE once (r18); the tree is the same
    unix_micros arithmetic the Column form built."""
    return (
        f"(CASE WHEN {fb}._rts IS NOT NULL AND ({ff}._rts IS NULL OR "
        f"(unix_micros(_ts) - unix_micros({fb}._rts)) <= "
        f"(unix_micros({ff}._rts) - unix_micros(_ts))) "
        f"THEN {fb} ELSE {ff} END)"
    )


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
    kq, ltq, rtq = _qi(key), _qi(left_ts), _qi(right_ts)
    # frame constructions as single selectExpr calls (r18): the
    # withColumn chains and the per-field struct aliases cost a py4j
    # round trip per Column op — pure driver-side builder latency; the
    # parsed projections are the same expressions in the same output
    # order (named_struct mirrors the struct aliases, 1/0 literals the
    # lit() ints)
    l = left.selectExpr("*", "1 AS _src", f"{ltq} AS _ts")
    # The matched right row travels as ONE struct, so every carried
    # field comes from the SAME row as the reported timestamp: filling
    # each column independently with last(ignorenulls) fabricated data —
    # a NULL value in the true match was silently replaced by a stale
    # value from an older row (review finding). Right rows with a NULL
    # key or NULL timestamp are excluded up front: SQL join semantics
    # never match NULL keys (Window.partitionBy would have grouped
    # them), and a row without a timestamp has no as-of position.
    pack_sql = "named_struct('_rts', %s%s)" % (
        rtq,
        "".join(
            f", '{_lit(f'{c}{suffix}', 'value_col name')}', {_qi(c)}"
            for c in value_cols
        ),
    )
    r = right.where(
        F.col(kq).isNotNull() & F.col(rtq).isNotNull()
    ).selectExpr(
        kq,
        f"{rtq} AS _rts",
        f"{pack_sql} AS _rpack",
        "0 AS _src",
        f"{rtq} AS _ts",
    )

    combined = l.unionByName(
        r.selectExpr(kq, "_src", "_ts", "_rpack"),
        allowMissingColumns=True,
    )
    # right rows (_src=0) sort before left rows at equal timestamps in
    # BOTH directions → equal-ts matches are inclusive. Window fills,
    # unpack projections and the nearest pick are single SQL parses
    # (r18, guide §5): the Column-form Window specs + per-field struct
    # extracts cost a py4j round trip per op (~500 per nearest build of
    # pure driver-side latency); the parsed trees are the same
    # expressions — last(pack, true) over ROWS UNBOUNDED PRECEDING
    # frames on the same sort orders (SQL ASC/DESC NULLS defaults match
    # Column.asc()/.desc()), the same unix_micros CASE pick.
    w_back = (
        f"PARTITION BY {kq} ORDER BY _ts ASC, _src ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    w_fwd = (
        f"PARTITION BY {kq} ORDER BY _ts DESC, _src ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    suffixed = [f"{c}{suffix}" for c in value_cols]

    def unpack(pack_sql_, out_names):
        return [
            *[
                f"{pack_sql_}.{_qi(name)} AS {_qi(name)}"
                for name in out_names
            ],
            f"{pack_sql_}._rts AS {_qi(f'{right_ts}{suffix}')}",
        ]

    lcols_sql = [_qi(c) for c in lcols]
    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        filled = combined.selectExpr(
            "*", f"last(_rpack, true) OVER ({w}) AS _f"
        )
        return filled.where(F.col("_src") == 1).selectExpr(
            *lcols_sql, *unpack("_f", suffixed)
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
    filled = combined.selectExpr(
        "*",
        f"last(_rpack, true) OVER ({w_back}) AS _fb",
        f"last(_rpack, true) OVER ({w_fwd}) AS _ff",
    ).where(F.col("_src") == 1)
    pick = _nearest_pick_sql("_fb", "_ff")
    return filled.selectExpr(*lcols_sql, *unpack(pick, suffixed))


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

    - ``backward``: per-(key, bucket) latest right pack (an ordinary
      partial-aggregatable groupBy over the extreme timestamps — a hot
      key spreads over its buckets, map-side combine shrinks it before
      the shuffle; with value columns the winning rows' packs attach
      via one hash re-join, see the carry block below), then a running
      ``last`` over STRICTLY EARLIER buckets
      — this window's input is ONE ROW PER BUCKET, not per event, so
      the hyperactive key costs #buckets, not #rows. The carried pack
      is injected at the bucket START with a sort rank below every
      real row (_src=-1) and the usual ascending fill window runs per
      (key, bucket).
    - ``forward``: the mirror — per-bucket EARLIEST right pack,
      running ``last`` over a DESCENDING bucket sort
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
    kq, ltq, rtq = _qi(key), _qi(left_ts), _qi(right_ts)
    # the width string lands inside a single-quoted SQL literal; a
    # quote in it produced a confusing parse error where F.window gave
    # the interval-format message (r18 ADVICE) — reject it up front
    bucket = _lit(bucket, "bucket width")
    # frame constructions as single selectExpr calls — same projections,
    # one parse instead of a py4j round trip per Column op (r18; see
    # asof_join's note)
    l = left.selectExpr(
        "*",
        "1 AS _src",
        f"{ltq} AS _ts",
        f"window({ltq}, '{bucket}').start AS _b",
    )
    pack_sql = "named_struct('_rts', %s%s)" % (
        rtq,
        "".join(
            f", '{_lit(f'{c}{suffix}', 'value_col name')}', {_qi(c)}"
            for c in value_cols
        ),
    )
    r = right.where(
        F.col(kq).isNotNull() & F.col(rtq).isNotNull()
    ).selectExpr(
        kq,
        f"{rtq} AS _rts",
        f"{pack_sql} AS _rpack",
        "0 AS _src",
        f"{rtq} AS _ts",
        f"window({rtq}, '{bucket}').start AS _b",
    )
    # spine over every (key, bucket) either side touches, so gaps
    # between right buckets still receive the carry. ONE per-bucket
    # aggregate and ONE spine join feed both carry directions (nearest
    # needs both; computing them separately doubled the carry stages).
    need_back = direction in ("backward", "nearest")
    need_fwd = direction in ("forward", "nearest")
    if value_cols:
        # Hash-aggregable carry for packs WITH value columns (r19, the
        # r18 fix covered only the empty pack): max_by/min_by carry a
        # struct-typed aggregation buffer, which HashAggregate cannot
        # hold (mutable fixed-width types only) — the planner fell back
        # to SortAggregate, a full sort of the filtered right side per
        # carry direction. Instead (guide §2.3): (1) the per-bucket
        # extreme TIMESTAMPS aggregate hash-side (max/min(_rts) — a
        # mutable long buffer); (2) the rows achieving them come back
        # from ONE re-join of the right frame, SHUFFLE_HASH building on
        # the tiny one-row-per-bucket extremes table so the right side
        # is probed, never sorted; (3) a row_number window over the
        # per-bucket WINNERS (only extreme-ts ties — a handful of rows
        # per bucket, not the right side) picks one pack per direction.
        # Every remaining sort is over winner rows, #buckets-sized.
        # Tie semantics match max_by/min_by: among rows tied on the
        # extreme timestamp the picked pack is arbitrary; the reported
        # _rts is deterministic either way (the operator's documented
        # tie contract).
        ext = r.groupBy(F.col(kq), F.col("_b")).agg(
            *([F.max("_rts").alias("_mx")] if need_back else []),
            *([F.min("_rts").alias("_mn")] if need_fwd else []),
        )
        ext_filter = " OR ".join(
            (["_rts = _mx"] if need_back else [])
            + (["_rts = _mn"] if need_fwd else [])
        )
        winners = (
            r.selectExpr(kq, "_b", "_rts", "_rpack")
            .join(ext.hint("shuffle_hash"), [key, "_b"])
            .where(F.expr(ext_filter))
        )

        def pick(dir_: str) -> DataFrame:
            ext_col, order, out = (
                ("_mx", "DESC", "_pmax")
                if dir_ == "backward"
                else ("_mn", "ASC", "_pmin")
            )
            w = f"PARTITION BY {kq}, _b ORDER BY _rts {order}"
            return (
                winners.where(F.col("_rts") == F.col(ext_col))
                .selectExpr(
                    kq,
                    "_b",
                    "_rpack",
                    f"row_number() OVER ({w}) AS _rn",
                )
                .where(F.col("_rn") == 1)
                .selectExpr(kq, "_b", f"_rpack AS {out}")
            )

        if need_back and need_fwd:
            # every bucket with winners has both picks — inner join
            rb = pick("backward").join(pick("forward"), [key, "_b"])
        elif need_back:
            rb = pick("backward")
        else:
            rb = pick("forward")
    else:
        # value_cols=(): the pack is struct(_rts) alone, so the pack of
        # the max/min-_rts row IS struct(max/min(_rts)). Plain max/min
        # keep a timestamp buffer → HashAggregate, and the struct is
        # rebuilt in the projection above the aggregate (r18; ties are
        # irrelevant — all tied packs are identical when the pack has
        # no value columns).
        rb = r.groupBy(F.col(kq), F.col("_b")).agg(
            *(
                [F.expr("named_struct('_rts', max(_rts)) AS _pmax")]
                if need_back
                else []
            ),
            *(
                [F.expr("named_struct('_rts', min(_rts)) AS _pmin")]
                if need_fwd
                else []
            ),
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
    sp = (
        l.selectExpr(kq, "_b")
        .distinct()
        .join(rb, [key, "_b"], "full_outer")
    )

    # Windows, carries and unpack projections as single SQL parses (r18
    # — same recipe and same trees as asof_join; see its note).
    def carry_spec(dir_: str):
        """(pack column, bucket sort order SQL, injection timestamp SQL)
        for a carry direction — the ONLY place these constants live; both
        carry_for and nearest's one-pass dual carry read them here."""
        if dir_ == "backward":
            return "_pmax", "_b ASC", "_b"
        return "_pmin", "_b DESC", f"window(_b, '{bucket}').end"

    def carry_window(order: str) -> str:
        return (
            f"PARTITION BY {kq} ORDER BY {order} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
        )

    def carry_for(dir_: str) -> DataFrame:
        """One carry row per (key, bucket): the cross-bucket candidate
        from strictly earlier (backward) / later (forward) buckets."""
        pack, order, inject_ts = carry_spec(dir_)
        return (
            sp.selectExpr(
                kq,
                "_b",
                f"last({pack}, true) OVER ({carry_window(order)}) AS _rpack",
            )
            .where(F.col("_rpack").isNotNull())
            .selectExpr("*", "-1 AS _src", f"{inject_ts} AS _ts")
        )

    w_back = (
        f"PARTITION BY {kq}, _b ORDER BY _ts ASC, _src ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    w_fwd = (
        f"PARTITION BY {kq}, _b ORDER BY _ts DESC, _src ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    suffixed = [f"{c}{suffix}" for c in value_cols]

    def unpack(pack_sql_):
        return [
            *[
                f"{pack_sql_}.{_qi(name)} AS {_qi(name)}"
                for name in suffixed
            ],
            f"{pack_sql_}._rts AS {_qi(f'{right_ts}{suffix}')}",
        ]

    lcols_sql = [_qi(c) for c in lcols]
    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        combined = l.unionByName(
            r.selectExpr(kq, "_b", "_src", "_ts", "_rpack"),
            allowMissingColumns=True,
        ).unionByName(
            carry_for(direction).selectExpr(kq, "_b", "_src", "_ts", "_rpack"),
            allowMissingColumns=True,
        )
        filled = combined.selectExpr(
            "*", f"last(_rpack, true) OVER ({w}) AS _f"
        )
        return filled.where(F.col("_src") == 1).selectExpr(
            *lcols_sql, *unpack("_f")
        )

    # nearest: real right rows feed BOTH fills; each carry feeds only its own
    r_both = r.selectExpr(
        kq, "_b", "_src", "_ts",
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
    none_pack = "CASE WHEN false THEN _cb END"  # typed NULL pack
    carries = (
        sp.selectExpr(
            kq,
            "_b",
            f"last({bpack}, true) OVER ({carry_window(border)}) AS _cb",
            f"last({fpack}, true) OVER ({carry_window(forder)}) AS _cf",
        )
        .selectExpr(
            kq,
            "_b",
            "explode(array("
            f"named_struct('_ts', {binject}, '_pb', _cb, '_pf', {none_pack}), "
            f"named_struct('_ts', {finject}, '_pb', {none_pack}, '_pf', _cf)"
            ")) AS _e",
        )
        .selectExpr(
            kq,
            "_b",
            "_e._ts AS _ts",
            "_e._pb AS _pb",
            "_e._pf AS _pf",
        )
        .where(F.col("_pb").isNotNull() | F.col("_pf").isNotNull())
        .selectExpr("*", "-1 AS _src")
    )
    combined = l.unionByName(r_both, allowMissingColumns=True).unionByName(
        carries, allowMissingColumns=True
    )
    filled = combined.selectExpr(
        "*",
        f"last(_pb, true) OVER ({w_back}) AS _fb",
        f"last(_pf, true) OVER ({w_fwd}) AS _ff",
    ).where(F.col("_src") == 1)
    pick = _nearest_pick_sql("_fb", "_ff")
    return filled.selectExpr(*lcols_sql, *unpack(pick))
