"""Zipf-skew soak of the multiplexed counter sink (r15 verdict item 4).

The reference's production counter shape is Zipfian — its host/url
ZSETs (streaming.scala:104-149, 176-186) follow web-traffic power laws
— while every multiplex A/B so far (experiments/
measure_counter_multiplex.py) used near-uniform key mixes. This soak
drives streaming/multiplex.py's production path UNMODIFIED with a
~10 M-row Zipf(s=1.2) key stream at AvailableNow and answers, with
measurements, whether the hot counter needs AQE skew handling or the
salted-agg tooling (operators/skew.py:86).

Why the melt should be skew-immune BY CONSTRUCTION: the hot path is
one hash aggregation groupBy(counter, member) with map-side partial
aggregation — a Zipf-hot member collapses to at most ONE row per map
task before the exchange, so the reduce side receives <= #map-tasks
rows for the hot key no matter how many input rows carry it. AQE
skew-join handling is about JOIN-side row explosion; salting is about
reducer-side row concentration — neither condition can arise in a
partial-aggregated counter melt. The soak verifies that reasoning
holds end-to-end (parse -> melt -> shuffle -> collect -> KV apply),
because "should" has been wrong before (the r4 single-sort as-of was
reverted on measurement).

Instrumentation (production code untouched):
- per-trigger TOTAL from a timing wrapper around ``store.merge``;
- the KV APPLY STALL from a lock proxy that records hold durations
  (merge's under-lock apply loop dominates its lock holds);
- melt+agg+collect = total - stall;
- per-arm AGGREGATE EXECUTOR RUN TIME via the UI REST API (the honest
  scale signal on a co-tenant box — see measure_counter_multiplex.py).

Correctness gates BEFORE any timing is reported (conventions:
experiments/README.md): each arm's streamed store must equal a
batch-backfilled store over the same corpus bit-for-bit (the
stream/batch equivalence property the tests pin), and the salted
probe's result must equal the plain aggregation's.

MEASURED (this box, local[32], 10 M rows x 8 files, 4 triggers/arm,
100 k hosts / 10 k urls, Zipf s=1.2 on both keys; rank-1 host carries
19.64% of all rows = 1,963,824 rows; min over 2 interleaved reps per
arm, per-arm REST metrics scoped to the arm's own stages with settle
sleeps — an earlier unscoped read reported the 10 M-row equality
gate's stage as the arm's balance; prior unscoped campaigns also saw a
co-tenant burst inflate one drain's trigger 0 to 253.9 s on
byte-identical code, which is why the interleaved reps exist):

  arm      wall(s)  exec(core-s)  melt+agg/trigger(s)         kv-stall/trigger(s)
  uniform   39.5     854.1        11.18, 7.65, 7.00, 7.02     0.37, 0.42, 0.38, 0.46
  zipf      34.2     760.6         8.83, 6.99, 7.68, 6.50     0.42, 0.34, 0.47, 0.30

  -> A 19.6%-hot-key Zipf stream prices AT OR BELOW the uniform
     stream: per-trigger melt+agg within noise of uniform (steady
     triggers 6.5-7.7 s both arms), aggregate executor time 0.89x,
     wall 0.87x. Partial aggregation collapses the hot member to <= 1
     row per map task BEFORE the exchange, so reducer input is bounded
     by (distinct members x map tasks), never input rows — 1.96 M
     hot-host rows arrive at the reduce side as at most 32 partial
     rows.
  -> Reducer balance, scoped to the arm's own melt exchange:
     max/median shuffle-read across the 32 reduce tasks is 1.02
     (uniform) vs 1.39 (zipf), IDENTICAL across both reps. The zipf
     imbalance is NOT hot-member concentration (32 partial rows,
     kilobytes); it is bucket-occupancy variance: the power-law corpus
     surfaces fewer distinct members per trigger with per-member
     partial-row counts spread 1..32 (uniform's are near-constant
     ~25), so hashing them into 32 buckets leaves higher byte variance
     — on an exchange that is smaller and CHEAPER in absolute terms
     (exec 0.89x). At production scale the distinct set per trigger
     grows and this variance shrinks; nothing here needs fixing.
  -> The KV apply stall tracks DISTINCT members per batch, never
     hot-member row count: both arms stall 0.30-0.47 s/trigger at
     ~100 k-member batches, with zipf's later triggers (fewer new
     members) at the low end.
  -> Salted probe on the hot counter (same zipf corpus, parse cached
     so only the agg differs, min-of-5, result-equality-gated): plain
     groupBy(host).count() 0.86 s wall / 0.6 core-s vs salted_agg(16
     buckets) 0.98 s / 0.4 core-s — parity within the noise band
     (the direction flips between campaigns). There is nothing for the
     salt to spread: the partial agg already bounded the hot key at
     one row per map task, and the salted form only adds a second
     shuffle of partials.
  -> CONCLUSION, recorded in ARCHITECTURE.md "Counter serving
     topology": the multiplexed counter path needs NO AQE skew
     handling and NO salting at any COUNTER key skew — map-side
     combine is the skew defense and it is already on. salted_agg
     (operators/skew.py:86) stays the tool for aggs whose partials
     cannot collapse map-side (e.g. exact distinct-count per hot key),
     and salted_skew_join for hot JOIN keys — different shapes, where
     rows genuinely concentrate.

Run: PYTHONPATH=/root/repo python experiments/measure_multiplex_skew.py
(~12 min; writes ~2.3 GB of corpus under /tmp; run alone.)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from logvision_spark.operators.skew import salted_agg  # noqa: E402
from logvision_spark.parser import parse_access_log  # noqa: E402
from logvision_spark.streaming.multiplex import (  # noqa: E402
    KVCounterStore,
    log_counter_specs,
    melted_counter_deltas,
    start_multiplexed_counter_sink,
)

N_ROWS = int(os.environ.get("LV_SKEW_ROWS", 10_000_000))
N_FILES = int(os.environ.get("LV_SKEW_FILES", 8))
FILES_PER_TRIGGER = int(os.environ.get("LV_SKEW_FPT", 2))
ZIPF_S = float(os.environ.get("LV_SKEW_S", 1.2))
N_HOSTS = 100_000
N_URLS = 10_000
if N_ROWS % N_FILES or N_FILES % FILES_PER_TRIGGER:
    raise SystemExit("row/file/trigger knobs must divide evenly")

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic uniform 64-bit mix (conventions: never rand())."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    p = np.arange(1, n + 1, dtype=np.float64) ** -s
    return np.cumsum(p) / p.sum()


def _ranks(i: np.ndarray, n: int, s: float, stream: int,
           zipf: bool) -> np.ndarray:
    """Key rank per row: Zipf via inverse-CDF over a splitmix uniform,
    or uniform over the same n-key pool (same cardinality, no skew)."""
    u = _splitmix64(i * np.uint64(2654435761) + np.uint64(stream))
    if zipf:
        unif = (u >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        return np.searchsorted(_zipf_cdf(n, s), unif).astype(np.int64)
    return (u % np.uint64(n)).astype(np.int64)


def _write_corpus(zipf: bool) -> str:
    d = tempfile.mkdtemp(prefix=f"lv_skew_{'zipf' if zipf else 'unif'}_")
    rows_per_file = N_ROWS // N_FILES
    for fidx in range(N_FILES):
        i = np.arange(fidx * rows_per_file, (fidx + 1) * rows_per_file,
                      dtype=np.uint64)
        host = _ranks(i, N_HOSTS, ZIPF_S, 1, zipf)
        url = _ranks(i, N_URLS, ZIPF_S, 2, zipf)
        ii = i.astype(np.int64)
        sec = ii * 86400 // N_ROWS
        with open(f"{d}/part{fidx}.log", "w") as f:
            chunk = 200_000
            for lo in range(0, len(ii), chunk):
                hi = lo + chunk
                f.write("\n".join(
                    f"10.{h >> 16 & 255}.{h >> 8 & 255}.{h & 255} - "
                    f"u{j % 97} "
                    f"[10/Oct/2020:{s_ // 3600:02d}:{(s_ // 60) % 60:02d}:"
                    f"{s_ % 60:02d} +0000] "
                    f'"GET /p{u_} HTTP/1.1" {200 + (j % 5)} {j % 100000} '
                    f'"http://ref.example/" "skew-agent/1.0"'
                    for h, u_, j, s_ in zip(
                        host[lo:hi], url[lo:hi], ii[lo:hi], sec[lo:hi]
                    )
                ) + "\n")
    return d


class _HoldTimingLock:
    """Context-manager lock proxy recording hold durations — merge()'s
    apply loop dominates its holds, so per-trigger stall = sum of holds
    between the wrapper's before/after marks."""

    def __init__(self):
        import threading

        self._l = threading.Lock()
        self.holds: list[float] = []

    def __enter__(self):
        self._l.acquire()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.holds.append(time.perf_counter() - self._t0)
        self._l.release()
        return False


def _executor_run_time_ms() -> int:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        return sum(s.get("executorRunTime", 0) for s in json.load(r))


def _completed_stage_ids() -> set[int]:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        return {s["stageId"] for s in json.load(r)}


def _shuffle_read_balance(exclude_ids: set[int]) -> float | None:
    """max/median shuffle-read bytes across tasks of the LARGEST
    completed shuffle-read stage SUBMITTED SINCE ``exclude_ids`` was
    captured — reducer concentration would show here first. Scoped to
    the arm: the app-cumulative stage list also holds the other arm's
    (and the 10 M-row equality gate's) larger stages, and an unscoped
    max would read those instead (r16 review)."""
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    best = max(
        (s for s in stages
         if s.get("shuffleReadBytes", 0) > 0
         and s["stageId"] not in exclude_ids),
        key=lambda s: s["shuffleReadBytes"],
        default=None,
    )
    if best is None:
        return None
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages/"
        f"{best['stageId']}/{best['attemptId']}/taskList?length=1000"
    ) as r:
        tasks = json.load(r)
    reads = sorted(
        t.get("taskMetrics", {})
        .get("shuffleReadMetrics", {})
        .get("remoteBytesRead", 0)
        + t.get("taskMetrics", {})
        .get("shuffleReadMetrics", {})
        .get("localBytesRead", 0)
        for t in tasks
    )
    if not reads or reads[len(reads) // 2] == 0:
        return None
    return reads[-1] / reads[len(reads) // 2]


def _expected_store(corpus: str) -> KVCounterStore:
    """Batch-backfilled ground truth over the same corpus — the
    stream/batch equivalence the correctness gate compares against."""
    exp = KVCounterStore()
    exp.backfill(
        melted_counter_deltas(
            parse_access_log(spark.read.text(corpus)), log_counter_specs()
        )
    )
    return exp


def run_arm(label: str, corpus: str, gate: bool = True) -> dict:
    store = KVCounterStore()
    lock = _HoldTimingLock()
    store._lock = lock  # instrumentation only; semantics identical
    triggers: list[dict] = []

    def timed_write(deltas, batch_id):
        h0 = len(lock.holds)
        n0 = len(store._counters.get("host", {}))
        t0 = time.perf_counter()
        store.merge(deltas, batch_id)
        total = time.perf_counter() - t0
        stall = sum(lock.holds[h0:])
        triggers.append({
            "batch": batch_id,
            "total_s": round(total, 3),
            "stall_s": round(stall, 3),
            "melt_agg_s": round(total - stall, 3),
            "new_hosts": len(store._counters.get("host", {})) - n0,
        })

    ck = tempfile.mkdtemp(prefix=f"lv_skew_ck_{label}_")
    # settle: stage-completion REST reporting is asynchronous, so give
    # the PREVIOUS work's stages time to land before the baseline diff
    # (otherwise their run time is silently credited to this arm)
    time.sleep(2.0)
    exec0 = _executor_run_time_ms()
    pre_ids = _completed_stage_ids()
    t0 = time.perf_counter()
    q = start_multiplexed_counter_sink(
        parse_access_log(
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
            .load(corpus)
        ),
        log_counter_specs(),
        timed_write,
        checkpoint_dir=ck,
        available_now=True,
    )
    if not q.awaitTermination(3600):
        raise TimeoutError(f"{label} arm did not drain")
    wall = time.perf_counter() - t0
    time.sleep(2.0)  # same settle on the closing read
    exec_ms = _executor_run_time_ms() - exec0
    balance = _shuffle_read_balance(pre_ids)

    # correctness gate: streamed store == batch-backfilled store
    # (once per corpus — the gate itself is a full batch pass)
    if gate:
        exp = _expected_store(corpus)
        assert store.persist_state()[0] == exp.persist_state()[0], (
            f"{label}: streamed store != batch ground truth"
        )
    totals = store.persist_state()[0]
    hot = max(
        (v for (c, m), v in totals.items() if c == "host"), default=0
    )
    out = {
        "arm": label,
        "wall_s": round(wall, 1),
        "exec_core_s": round(exec_ms / 1000, 1),
        "triggers": triggers,
        "hot_host_rows": hot,
        "hot_share_pct": round(100 * hot / N_ROWS, 2),
        "distinct_hosts": len(
            {m for (c, m) in totals if c == "host"}
        ),
        "shuffle_read_max_over_median": (
            round(balance, 2) if balance else None
        ),
    }
    shutil.rmtree(ck, ignore_errors=True)
    print(json.dumps(out))
    return out


def salted_probe(corpus: str) -> dict:
    """Is salting needed on the hot counter? Plain vs salted_agg on the
    Zipf host counter over a CACHED parsed input (isolating the
    aggregation — where salting could act — from the parse both arms
    share), result-equality-gated, min-of-5 each. Stage-completion
    reporting in the REST API is asynchronous, so each executor-time
    diff reads after a settle sleep."""
    df = parse_access_log(spark.read.text(corpus)).where("parsed").cache()
    df.count()  # materialize off the clock
    plain_q = df.groupBy("host").count()
    salted_q = salted_agg(
        df, "host", F.count(F.lit(1)), F.sum("_partial")
    ).withColumnRenamed("merged", "count")

    plain_rows = {r["host"]: r["count"] for r in plain_q.collect()}
    salted_rows = {r["host"]: r["count"] for r in salted_q.collect()}
    assert plain_rows == salted_rows, "salted result != plain result"

    out = {}
    for name, q in (("plain", plain_q), ("salted", salted_q)):
        best, best_exec = float("inf"), float("inf")
        for _ in range(5):
            time.sleep(1.0)
            e0 = _executor_run_time_ms()
            t0 = time.perf_counter()
            q.collect()
            best = min(best, time.perf_counter() - t0)
            time.sleep(1.0)
            best_exec = min(best_exec, (_executor_run_time_ms() - e0) / 1000)
        out[name] = {"wall_s": round(best, 2),
                     "exec_core_s": round(best_exec, 1)}
    df.unpersist()
    print(json.dumps({"salted_probe": out}))
    return out


def main() -> None:
    print(f"generating 2 x {N_ROWS} rows ({N_FILES} files each, "
          f"zipf s={ZIPF_S}, {N_HOSTS} hosts / {N_URLS} urls)...")
    unif = _write_corpus(zipf=False)
    zipf = _write_corpus(zipf=True)
    try:
        # JVM/codegen warm-up OFF the clock (scan -> parse -> melt ->
        # shuffle -> collect): without this the FIRST arm's trigger 0
        # absorbs one-time codegen/classload (measured ~48 s at 10 M)
        # and the arm totals stop being comparable
        melted_counter_deltas(
            parse_access_log(spark.read.text(f"{unif}/part0.log")),
            log_counter_specs(),
        ).collect()
        # TWO reps per arm, interleaved U,Z,U,Z: this box carries
        # bursty co-tenant load (measured swings load1 1.2 -> 21.8
        # WITHIN one drain), so a single rep's arm total measures the
        # window, not the arm. Per-arm figures below are min-of-reps
        # (wall, exec) and per-trigger min across reps — the repo's
        # standard co-tenant defense (min-of-N inside one warm JVM).
        reps = [
            run_arm("uniform", unif),
            run_arm("zipf", zipf),
            run_arm("uniform", unif, gate=False),
            run_arm("zipf", zipf, gate=False),
        ]
        probe = salted_probe(zipf)
        zarm = reps[1]
        print("\nSUMMARY (per arm: min over 2 reps)")
        for arm in ("uniform", "zipf"):
            rs = [r for r in reps if r["arm"] == arm]
            ts_min = [
                min(rep["triggers"][i]["melt_agg_s"] for rep in rs)
                for i in range(len(rs[0]["triggers"]))
            ]
            st_min = [
                min(rep["triggers"][i]["stall_s"] for rep in rs)
                for i in range(len(rs[0]["triggers"]))
            ]
            r = rs[0]
            print(
                f"  {arm:8s} wall {min(x['wall_s'] for x in rs):6.1f}s  "
                f"exec {min(x['exec_core_s'] for x in rs):7.1f} core-s  "
                f"melt+agg/trigger {ts_min}  stall/trigger {st_min}  "
                f"hot-share {r['hot_share_pct']}%  "
                f"shuffle max/med "
                f"{max(x['shuffle_read_max_over_median'] or 0 for x in rs)}"
            )
        print(
            f"  salted probe: plain {probe['plain']['wall_s']}s/"
            f"{probe['plain']['exec_core_s']}core-s vs salted "
            f"{probe['salted']['wall_s']}s/"
            f"{probe['salted']['exec_core_s']}core-s "
            f"(hot host = {zarm['hot_host_rows']} rows)"
        )
    finally:
        shutil.rmtree(unif, ignore_errors=True)
        shutil.rmtree(zipf, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
