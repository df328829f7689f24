"""Serving-layer query catalog (SURVEY.md §3.3).

The reference's Flask app polls Redis/Kafka once per second and
post-processes in Python — sorting, outer-joining, ranking, geo-enriching
(flask/app.py:30-536). Each socket namespace becomes a *named DataFrame
view* here; a thin poller (SocketIO/HTTP, out of engine scope) can collect
any of them on its own schedule. 13 of the 15 namespaces are relational
queries; `sys_time`/`log_stream` are UI plumbing with no computation.

Every view composes the engine's operators over (a) the parsed log frame
and (b) the scored frame from the ML pipeline — identical code against a
batch frame or against streaming counter state (memory-sink tables from
streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logvision_spark.operators.aggregations import count_by, count_by_second
from logvision_spark.operators.joins import geo_enrich
from logvision_spark.operators.topk import top_k, top_k_ranked


class ServingCatalog:
    """Named views over a parsed (and optionally scored) log DataFrame.

    ``parsed``: ACCESS_LOG_SCHEMA frame (batch or the materialized
    streaming state); ``scored``: same + probability/prediction columns;
    ``geo_dim``: (ip, coor_x, coor_y) fixture replacing the reference's
    per-IP HTTP geocoder (app.py:136-147).
    """

    def __init__(
        self,
        parsed: DataFrame,
        scored: DataFrame | None = None,
        geo_dim: DataFrame | None = None,
    ):
        self.parsed = parsed.where(F.col("parsed"))
        self.raw = parsed
        self.scored = scored
        self.geo_dim = geo_dim

    # --- count_board (app.py:75-121) -------------------------------------
    def count_board(self) -> DataFrame:
        """Visitors, resources, line count, traffic MB, success/other — the
        reference's five zcard/zscore reads + client-side sum, as ONE
        aggregate per input frame.

        line_cnt/traffic cover ALL lines (the reference counts every
        ingested line), but the status split and visitor/resource
        distincts cover only successfully-parsed records — the reference's
        counters are built from parsed records exclusively (malformed
        lines carry no status/host/url), so unparsed lines must not
        inflate other_cnt."""
        # ONE conditional aggregate over the raw frame — the parsed-only
        # metrics gate on the parsed flag inside their expressions
        # (approx_count_distinct ignores the NULLs the when() yields),
        # so there is a single scan and no crossJoin (review finding:
        # the previous two-agg + crossJoin form doubled the scan this
        # module's own comments argue must be halved). Counts coalesce
        # to 0: sum() over zero rows is NULL, and the reference's Redis
        # counters read 0 on an empty/just-started board, not null.
        parsed_flag = F.col("parsed")
        ok = F.col("status_code").between(200, 207)
        return self.raw.agg(
            F.approx_count_distinct(
                F.when(parsed_flag, F.col("host"))
            ).alias("visitors"),
            F.approx_count_distinct(
                F.when(parsed_flag, F.col("url"))
            ).alias("resources"),
            F.count(F.lit(1)).alias("line_cnt"),
            (
                F.coalesce(F.sum(F.coalesce(F.col("bytes"), F.lit(0))), F.lit(0))
                / F.lit(1048576.0)
            ).alias("traffic_mb"),
            F.coalesce(
                F.sum((parsed_flag & ok).cast("long")), F.lit(0)
            ).alias("success_cnt"),
            F.coalesce(
                F.sum(
                    (
                        parsed_flag
                        & (~ok | F.col("status_code").isNull())
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("other_cnt"),
        ).select(
            "visitors", "resources", "line_cnt", "traffic_mb",
            "success_cnt", "other_cnt",
        )

    # --- hot_url (app.py:157-175), hot_ip (app.py:177-205) ----------------
    def hot_url(self, k: int = 10) -> DataFrame:
        return top_k_ranked(count_by(self.parsed, "url"), "cnt", k, tiebreak="url")

    def hot_ip(self, k: int = 14) -> DataFrame:
        return top_k_ranked(count_by(self.parsed, "host"), "cnt", k, tiebreak="host")

    def ip_ranking(self, k: int = 51) -> DataFrame:
        return top_k_ranked(count_by(self.parsed, "host"), "cnt", k, tiebreak="host")

    # --- hot_geo / good_geo / bad_geo (app.py:123-155, 460-536) ------------
    def hot_geo(self, k: int = 51) -> DataFrame:
        if self.geo_dim is None:
            raise ValueError("hot_geo requires a geo dimension table")
        hosts = top_k(count_by(self.parsed, "host"), "cnt", k, tiebreak="host")
        return geo_enrich(hosts, self.geo_dim, fact_key="host")

    def _class_geo(self, prediction: float, k: int) -> DataFrame:
        if self.scored is None or self.geo_dim is None:
            raise ValueError("class geo views require scored frame + geo dim")
        cls = self.scored.where(F.col("prediction") == prediction)
        hosts = top_k(count_by(cls, "host"), "cnt", k, tiebreak="host")
        return geo_enrich(hosts, self.geo_dim, fact_key="host")

    def good_geo(self, k: int = 51) -> DataFrame:
        return self._class_geo(0.0, k)

    def bad_geo(self, k: int = 51) -> DataFrame:
        return self._class_geo(1.0, k)

    # --- pies (app.py:207-254) --------------------------------------------
    def status_code_pie(self, k: int = 101) -> DataFrame:
        return top_k(count_by(self.parsed, "status_code"), "cnt", k, tiebreak="status_code")

    def req_method_pie(self, k: int = 101) -> DataFrame:
        return top_k(count_by(self.parsed, "req_method"), "cnt", k, tiebreak="req_method")

    # --- req_count_timeline (app.py:256-281) -------------------------------
    def req_count_timeline(self) -> DataFrame:
        """Per-second series, time-ordered, with display string (T8) — the
        reference zranges the whole ZSET and re-sorts client-side."""
        ts = count_by_second(self.parsed)
        return ts.select(
            F.col("second"),
            F.date_format("second", "yyyy-MM-dd HH:mm:ss").alias("second_str"),
            F.col("cnt"),
        ).orderBy("second")

    # --- good/bad counters (app.py:309-343) --------------------------------
    def class_counts(self) -> DataFrame:
        if self.scored is None:
            raise ValueError("class_counts requires the scored frame")
        return self.scored.groupBy("prediction").agg(F.count(F.lit(1)).alias("cnt"))

    # --- url_cate_count_timeline (app.py:425-458) ---------------------------
    def class_timeline(self, ordered: bool = True) -> DataFrame:
        """Good vs bad per-second timeline, zero-filled.

        Single-pass conditional aggregation: one scan, one shuffle. The
        reference materializes two Redis hashes and full-outer-merges them
        client-side (flask/app.py:425-458); the output is identical — any
        second present has ≥1 record, and the absent class counts 0, which
        is exactly the full-outer zero-fill (that two-feed merge shape
        itself is pinned by `j2_timeline_full_outer`). At 100 TB this
        halves the scan and drops a shuffle+join.

        ``ordered=False`` skips the display sort — a global range
        exchange + sort that exists purely for dashboard presentation;
        callers that hash, join, or re-aggregate the timeline (the
        catalog's order-insensitive oracle compare included) shouldn't
        pay a full extra shuffle for row order they ignore (r18,
        optimization guide §2.4: an orderBy used only to make output
        deterministic is an accidental exchange)."""
        if self.scored is None:
            raise ValueError("class_timeline requires the scored frame")
        tl = (
            self.scored.where(F.col("prediction").isin(0.0, 1.0))
            .groupBy(F.date_trunc("second", "ts").alias("second"))
            .agg(
                F.sum((F.col("prediction") == 0.0).cast("long")).alias("good_cnt"),
                F.sum((F.col("prediction") == 1.0).cast("long")).alias("bad_cnt"),
            )
        )
        return tl.orderBy("second") if ordered else tl

    # --- good/bad detail feeds (app.py:345-423) -----------------------------
    def class_detail(self, prediction: float, k: int = 50) -> DataFrame:
        """Latest k scored records of a class — the Kafka-tail panels."""
        if self.scored is None:
            raise ValueError("class_detail requires the scored frame")
        return (
            self.scored.where(F.col("prediction") == prediction)
            .orderBy(F.desc("ts"), F.asc("host"))
            .limit(k)
        )

    # --- scored feed re-chunk (S4; app.py:345-423 Kafka→SocketIO loop) ----
    def scored_feed_json(
        self, prediction: float | None = None, k: int = 50
    ) -> DataFrame:
        """S4 engine-side: the latest-k scored records (optionally one
        class), each serialized to ONE JSON payload string — exactly the
        per-record chunks the reference's poller reads off Kafka and
        re-emits over SocketIO. The socket transport stays out of engine
        scope; any pusher can collect this view on its own schedule."""
        if self.scored is None:
            raise ValueError("scored_feed_json requires the scored frame")
        base = (
            self.scored
            if prediction is None
            else self.scored.where(F.col("prediction") == prediction)
        )
        latest = base.orderBy(F.desc("ts"), F.asc("host")).limit(k)
        return latest.select(F.to_json(F.struct("*")).alias("payload"))

    def all_views(self) -> dict[str, DataFrame]:
        """The queryable catalog (geo/class views included when inputs
        allow) — name → DataFrame, ready for a poller to collect."""
        views: dict[str, DataFrame] = {
            "count_board": self.count_board(),
            "hot_url": self.hot_url(),
            "hot_ip": self.hot_ip(),
            "ip_ranking": self.ip_ranking(),
            "status_code_pie": self.status_code_pie(),
            "req_method_pie": self.req_method_pie(),
            "req_count_timeline": self.req_count_timeline(),
        }
        if self.geo_dim is not None:
            views["hot_geo"] = self.hot_geo()
        if self.scored is not None:
            views["good_count_bad_count"] = self.class_counts()
            views["url_cate_count_timeline"] = self.class_timeline()
            views["good_detail"] = self.class_detail(0.0)
            views["bad_detail"] = self.class_detail(1.0)
            if self.geo_dim is not None:
                views["good_geo"] = self.good_geo()
                views["bad_geo"] = self.bad_geo()
        return views
