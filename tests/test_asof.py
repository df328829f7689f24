"""As-of join unit semantics: inclusive ties, no-match nulls, key isolation."""

from __future__ import annotations

import datetime

from logvision_spark.operators.asof import asof_join


def ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts(10)), (2, "u1", ts(5)), (3, "u2", ts(10)), (4, "u3", ts(10))],
        ["event_id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [("u1", ts(5), "a"), ("u1", ts(8), "b"), ("u2", ts(11), "c")],
        ["user", "ts", "tag"],
    )
    out = {
        r["event_id"]: (r["ts_asof"], r["tag_asof"])
        for r in asof_join(left, right, key="user", value_cols=("tag",)).collect()
    }
    assert out[1] == (ts(8), "b")   # latest <= 10
    assert out[2] == (ts(5), "a")   # tie at 5 is inclusive
    assert out[3] == (None, None)   # u2's only right row is later
    assert out[4] == (None, None)   # u3 has no right rows
    assert len(out) == 4            # left rows all preserved


def test_asof_forward_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts(10)), (2, "u1", ts(5)), (3, "u2", ts(10)), (4, "u3", ts(10))],
        ["event_id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [("u1", ts(5), "a"), ("u1", ts(12), "b"), ("u2", ts(8), "c")],
        ["user", "ts", "tag"],
    )
    out = {
        r["event_id"]: (r["ts_asof"], r["tag_asof"])
        for r in asof_join(
            left, right, key="user", value_cols=("tag",), direction="forward"
        ).collect()
    }
    assert out[1] == (ts(12), "b")  # earliest >= 10
    assert out[2] == (ts(5), "a")   # tie at 5 is inclusive
    assert out[3] == (None, None)   # u2's only right row is earlier
    assert out[4] == (None, None)   # u3 has no right rows


def test_asof_nearest_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", ts(10)),  # back at 8 (Δ2) beats fwd at 15 (Δ5)
            (2, "u1", ts(14)),  # fwd at 15 (Δ1) beats back at 8 (Δ6)
            (3, "u1", ts(30)),  # only back exists → back
            (4, "u2", ts(10)),  # only fwd exists → fwd
            (5, "u3", ts(10)),  # no right rows → null
        ],
        ["event_id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [("u1", ts(8), "a"), ("u1", ts(15), "b"), ("u2", ts(20), "c")],
        ["user", "ts", "tag"],
    )
    out = {
        r["event_id"]: (r["ts_asof"], r["tag_asof"])
        for r in asof_join(
            left, right, key="user", value_cols=("tag",), direction="nearest"
        ).collect()
    }
    assert out[1] == (ts(8), "a")
    assert out[2] == (ts(15), "b")
    assert out[3] == (ts(15), "b")
    assert out[4] == (ts(20), "c")
    assert out[5] == (None, None)


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame([(1, "u1", ts(10))], ["event_id", "user", "ts"])
    right = spark.createDataFrame(
        [("u1", ts(7), "back"), ("u1", ts(13), "fwd")], ["user", "ts", "tag"]
    )
    out = asof_join(
        left, right, key="user", value_cols=("tag",), direction="nearest"
    ).collect()[0]
    assert (out["ts_asof"], out["tag_asof"]) == (ts(7), "back")


def _bucketed_fixture(spark):
    """Randomized fixture shared by the bucketed-equivalence tests:
    matches carried across many empty buckets, right rows exactly on
    bucket boundaries, a hot key, and a key with no right rows."""
    import random

    rng = random.Random(7)
    base = datetime.datetime(2024, 1, 1)
    sec = datetime.timedelta(seconds=1)
    left = [
        (i, f"u{rng.randrange(5)}", base + rng.randrange(40_000) * sec)
        for i in range(300)
    ]
    # u4 gets no right rows; u0 is a hot key; some rows land exactly on
    # hour boundaries (3600-second multiples)
    right = [
        (f"u{rng.choice([0, 0, 0, 1, 2, 3])}",
         base + rng.choice([rng.randrange(40_000), 3600 * rng.randrange(11)]) * sec,
         f"t{j}")
        for j in range(200)
    ]
    return (
        spark.createDataFrame(left, ["event_id", "user", "ts"]),
        spark.createDataFrame(right, ["user", "ts", "tag"]),
    )


def test_asof_bucketed_equals_plain_all_directions(spark):
    """asof_join_bucketed must be row-identical to the plain asof_join
    in EVERY direction and for every bucket width. Matched timestamps
    must agree everywhere; tags may differ only where several right
    rows tie on the matched timestamp (both formulations pick an
    arbitrary row among exact-ts ties)."""
    from logvision_spark.operators.asof import asof_join_bucketed

    ldf, rdf = _bucketed_fixture(spark)
    for direction in ("backward", "forward", "nearest"):
        plain = {
            r["event_id"]: r["ts_asof"]
            for r in asof_join(
                ldf, rdf, key="user", value_cols=("tag",), direction=direction
            ).collect()
        }
        for bucket in ("17 minutes", "1 hour", "3 hours"):
            got = {
                r["event_id"]: r["ts_asof"]
                for r in asof_join_bucketed(
                    ldf, rdf, key="user", value_cols=("tag",),
                    bucket=bucket, direction=direction,
                ).collect()
            }
            assert got == plain, (direction, bucket)


def test_asof_bucketed_nearest_plan_has_no_unbounded_following_frame(spark):
    """The bucketed nearest fill must keep both frames incremental
    (unbounded-PRECEDING on their own sort order) — same structural pin
    as the plain nearest plan test."""
    from logvision_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame([(1, "u", ts(10))], ["event_id", "user", "ts"])
    right = spark.createDataFrame([("u", ts(8), "a")], ["user", "ts", "tag"])
    plan = (
        asof_join_bucketed(left, right, key="user", direction="nearest")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "unboundedfollowing" not in plan.lower().replace(" ", ""), plan


def test_asof_nearest_hot_key_is_not_quadratic(spark):
    """Both nearest fill frames must be unbounded-PRECEDING on their own
    sort order (incremental). An ascending-sort forward fill via an
    unbounded-FOLLOWING frame is re-aggregated per row by Spark —
    measured 50 s at a 20k-row single key (O(m²)); this pins the linear
    shape with a generous wall bound the quadratic form cannot meet."""
    import time

    from pyspark.sql import functions as F

    n = 30_000
    left = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.lit("hot").alias("user"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
    )
    right = spark.range(n).select(
        F.lit("hot").alias("user"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.col("id").alias("tag"),
    )
    t0 = time.perf_counter()
    row = (
        asof_join(left, right, key="user", direction="nearest")
        # consume the filled column: a count-only sink lets Catalyst
        # prune the window projection and measure nothing
        .agg(F.sum(F.unix_seconds(F.col("ts_asof"))).alias("s"))
        .collect()
    )
    wall = time.perf_counter() - t0
    assert row[0]["s"] is not None
    # generous bound: the linear form runs in ~2-4 s here, the quadratic
    # frame took 50 s at 20k rows (so >100 s at 30k). 120 s absorbs a
    # loaded CI host (r6 ADVICE: a tight wall bound flakes); the plan-
    # shape test below is the primary, deterministic regression gate.
    assert wall < 120, f"nearest hot-key fill took {wall:.1f}s — quadratic frame?"


def test_asof_nearest_plan_has_no_unbounded_following_frame(spark):
    """Structural twin of the hot-key wall-bound test: the nearest plan
    must contain no unbounded-FOLLOWING window frame (Spark evaluates
    those non-incrementally, O(m²) per key)."""
    left = spark.createDataFrame([(1, "u", ts(10))], ["event_id", "user", "ts"])
    right = spark.createDataFrame([("u", ts(8), "a")], ["user", "ts", "tag"])
    plan = (
        asof_join(left, right, key="user", direction="nearest")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "unboundedfollowing" not in plan.lower().replace(" ", ""), plan


def test_asof_bucketed_value_cols_no_sort_aggregate(spark):
    """r19 optimization pin (the r18 fix covered only value_cols=()):
    with value columns the carry no longer uses max_by/min_by (whose
    struct aggregation buffer forces a SortAggregate over the whole
    right side) — extremes aggregate hash-side, winning rows re-join,
    a row_number over per-bucket winners picks the pack. Three sides:
    (1) full-row identity (timestamps AND carried values) to the plain
    asof_join on a fixture whose right (key, ts) pairs are UNIQUE, so
    the pick is never ambiguous; (2) matched-timestamp identity on the
    adversarial tie-full fixture (tags on ties are arbitrary in BOTH
    formulations — the documented contract); (3) the executed plan
    carries NO SortAggregate."""
    from logvision_spark.operators.asof import asof_join_bucketed

    # tie-free right side: one right row per (user, ts)
    base = datetime.datetime(2024, 1, 1)
    sec = datetime.timedelta(seconds=1)
    import random

    rng = random.Random(11)
    left = spark.createDataFrame(
        [
            (i, f"u{rng.randrange(4)}", base + rng.randrange(30_000) * sec)
            for i in range(200)
        ],
        ["event_id", "user", "ts"],
    )
    seen = set()
    rrows = []
    for j in range(150):
        k = (f"u{rng.randrange(3)}", rng.randrange(30_000))
        if k in seen:
            continue
        seen.add(k)
        rrows.append((k[0], base + k[1] * sec, f"t{j}"))
    right = spark.createDataFrame(rrows, ["user", "ts", "tag"])

    ldf, rdf = _bucketed_fixture(spark)
    for direction in ("backward", "forward", "nearest"):
        plain = {
            r["event_id"]: (r["ts_asof"], r["tag_asof"])
            for r in asof_join(
                left, right, key="user", value_cols=("tag",),
                direction=direction,
            ).collect()
        }
        bucketed = asof_join_bucketed(
            left, right, key="user", value_cols=("tag",),
            bucket="1 hour", direction=direction,
        )
        got = {
            r["event_id"]: (r["ts_asof"], r["tag_asof"])
            for r in bucketed.collect()
        }
        assert got == plain, direction
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        assert "SortAggregate" not in plan, (direction, plan)
        # adversarial fixture: ts-identity (tie tags are arbitrary)
        plain_ts = {
            r["event_id"]: r["ts_asof"]
            for r in asof_join(
                ldf, rdf, key="user", value_cols=("tag",),
                direction=direction,
            ).collect()
        }
        got_ts = {
            r["event_id"]: r["ts_asof"]
            for r in asof_join_bucketed(
                ldf, rdf, key="user", value_cols=("tag",),
                bucket="17 minutes", direction=direction,
            ).collect()
        }
        assert got_ts == plain_ts, direction


def test_asof_bucketed_empty_pack_equals_plain_and_hash_aggregates(spark):
    """r18 optimization pin: with value_cols=() the per-bucket carry
    aggregate uses plain max/min(_rts) (HashAggregate) instead of
    max_by/min_by whose struct aggregation buffer forces SortAggregate.
    Two sides: (1) results stay row-identical to the plain asof_join in
    every direction; (2) the executed plan carries NO SortAggregate."""
    from logvision_spark.operators.asof import asof_join_bucketed

    ldf, rdf = _bucketed_fixture(spark)
    for direction in ("backward", "forward", "nearest"):
        plain = {
            r["event_id"]: r["ts_asof"]
            for r in asof_join(
                ldf, rdf, key="user", direction=direction
            ).collect()
        }
        bucketed = asof_join_bucketed(
            ldf, rdf, key="user", bucket="1 hour", direction=direction
        )
        got = {r["event_id"]: r["ts_asof"] for r in bucketed.collect()}
        assert got == plain, direction
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        assert "SortAggregate" not in plan, (direction, plan)
