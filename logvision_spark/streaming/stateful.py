"""Custom stateful streaming operators via applyInPandasWithState —
the escape hatch for semantics the built-in windowed aggregations can't
express (SURVEY.md §2.9 / task north-star: custom stateful operators).

Example operator: per-host *visit tracking with running totals* — state
survives across micro-batches per key, emits one updated summary row per
key per trigger, and expires via processing-time timeout. The built-in
`session_window` closes sessions by event-time gap only; this keeps
arbitrary Python state (visit count, cumulative bytes, last-seen) and
demonstrates the full GroupState lifecycle (create → update → timeout).

Scale: state is partitioned by the grouping key across executors
(StateStore-backed), batches arrive Arrow-encoded; keep per-key state
small (a dict of scalars here) and always set timeouts — keys that never
expire are the reference's unbounded-Redis mistake re-created in Spark.
"""

from __future__ import annotations

from collections.abc import Iterator
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

VISIT_STATE_SCHEMA = "visits LONG, total_bytes LONG, last_seen TIMESTAMP"
VISIT_OUTPUT_SCHEMA = (
    "host STRING, visits LONG, total_bytes LONG, last_seen TIMESTAMP"
)


def _track_visits(
    key: tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # emit the final summary and drop the key's state
        visits, total, last = state.get
        state.remove()
        yield pd.DataFrame(
            [(key[0], visits, total, last)],
            columns=["host", "visits", "total_bytes", "last_seen"],
        )
        return

    visits, total, last = state.get if state.exists else (0, 0, None)
    for pdf in batches:
        visits += len(pdf)
        total += int(pdf["bytes"].fillna(0).sum())
        # max() over an all-NULL chunk is NaT, and NaT comparisons are
        # always False — once stuck as `last`, real timestamps from
        # later chunks could never replace it (review finding)
        batch_last = pdf["ts"].max()
        if not pd.isna(batch_last):
            last = (
                batch_last
                if last is None or pd.isna(last) or batch_last > last
                else last
            )
    state.update((visits, total, last))
    state.setTimeoutDuration(60_000)  # expire idle hosts after 60 s
    yield pd.DataFrame(
        [(key[0], visits, total, last)],
        columns=["host", "visits", "total_bytes", "last_seen"],
    )


def visit_tracker(parsed: DataFrame) -> DataFrame:
    """Per-host running visit summary with custom cross-batch state.
    Works on a streaming parsed-log DataFrame; each trigger emits the
    updated (host, visits, total_bytes, last_seen) row for hosts seen in
    that trigger, and a final row when a host times out."""
    from pyspark.sql import functions as F

    src = parsed.where(F.col("parsed")).select("host", "ts", "bytes")
    return src.groupBy("host").applyInPandasWithState(
        _track_visits,
        outputStructType=VISIT_OUTPUT_SCHEMA,
        stateStructType=VISIT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


USER_TOTALS_APWS_SCHEMA = "user_id LONG, n_events LONG, value_cents LONG"
_USER_TOTALS_STATE_SCHEMA = "n_events LONG, value_cents LONG"


def _accumulate_user_totals(
    key: tuple[int], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:  # NoTimeout conf — unreachable, defensive
        state.remove()
        return
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += int(pdf["cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
    )


def user_totals_apws(events: DataFrame) -> DataFrame:
    """Per-user running (count, integer-cents) totals via
    ``applyInPandasWithState`` — the same semantics as the stateful-v2
    ``user_totals_tws`` template, on the API that needs no protobuf.
    Cents are rounded JVM-side BEFORE the Python boundary so the
    accumulation is integer-exact regardless of batch boundaries and
    summation order — which is what lets a custom-stateful operator
    carry an EXACT batch-SQL oracle instead of a behavior test.
    Update-mode emission: one cumulative row per key per trigger it
    appears in; the final row per key equals the batch aggregate."""
    from pyspark.sql import functions as F

    staged = events.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return staged.groupBy("user_id").applyInPandasWithState(
        _accumulate_user_totals,
        outputStructType=USER_TOTALS_APWS_SCHEMA,
        stateStructType=_USER_TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 arbitrary-stateful-v2): typed, composable
# per-key state primitives (ValueState/ListState/MapState + timers) behind
# a StatefulProcessor class — the successor to applyInPandasWithState's
# single opaque state tuple. Requires the RocksDB state store provider.
# ---------------------------------------------------------------------------

USER_TOTALS_SCHEMA = "user_id LONG, n_events LONG, value_cents LONG"


def _user_totals_processor():
    """Running per-user totals as a StatefulProcessor: one ValueState row
    per key accumulates (count, integer cents) across micro-batches and
    emits the updated totals each trigger. Cents arrive pre-rounded from
    the JVM side so the Python sum is integer-exact (no FP order
    sensitivity across batch boundaries)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n_events LONG, value_cents LONG"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._totals.get() or (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return UserTotals()


def user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-cents) totals via
    ``transformWithStateInPandas`` — the Spark 4 stateful-v2 template:
    named typed state slots per key (vs applyInPandasWithState's one
    tuple), per-key timers available for TTL/eviction, RocksDB-backed so
    state scales past executor memory. Update-mode emission: one row per
    key per trigger it appears in."""
    from pyspark.sql import functions as F

    staged = events.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return staged.groupBy("user_id").transformWithStateInPandas(
        _user_totals_processor(),
        outputStructType=USER_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs `google.protobuf` for its state
    server protocol (not bundled with pyspark); absent in minimal
    installs, in which case callers fall back to
    ``applyInPandasWithState`` (visit_tracker above)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False
