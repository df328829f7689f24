"""Measured scaling curves for the five most expensive catalog queries
(r16 verdict item 3): dedup_drop_list_16band, dedup_clusters,
a_user_trend_slope, ivf_topk_batch, dedup_drop_list at 1x/2x/4x/8x the
sf0.1 fixture, plus a direct A/B of the hot-shingle cap (dedup.py
capped_shingles) under document-frequency doubling.

Corpus construction (deterministic, derived from the read-only sf0.1
fixtures — never rand()):

- documents at scale m: the 5,000-doc sf0.1 table plus m-1 replicas
  whose every token carries a per-replica suffix ("tok" -> "tok~r") and
  whose doc_ids shift by r*1e6. Suffixing makes replica vocabularies
  DISJOINT, so each replica reproduces the original corpus's internal
  near-dup structure exactly and adds zero cross-replica candidates:
  the drop list must scale EXACTLY m-proportionally, which the script
  gates before any timing is reported. This isolates the engine's
  scaling from the corpus's (a plain m-fold copy would plant m-1 exact
  twins per doc and grow candidate pairs quadratically in m by
  construction, measuring the corpus, not the plan).
- events at scale m: user_id/event_id shift by r*1e6, ts/value/type
  unchanged — m x the user groups at the original per-group size, the
  shape grouped_trend_slope shuffles on.
- embeddings at scale m: vec_id shifts by r*1e6 and components roll by
  (r*7) % 64 — same norm and distribution, decorrelated replicas; the
  3 query vectors (vec_id < 3) stay fixed while the base grows m-fold.

The LIMITATION of disjoint-vocab replication is that no shingle's
document frequency grows with m — exactly the failure mode the
hot-shingle cap exists for. The cap A/B therefore uses a second corpus:
the scaled documents with ONE unsuffixed 10-token stop phrase prepended
to every doc_id % 10 == 0 (10% of docs, all replicas), so the phrase's
8 trigrams have df = 500*m — under the default 1000 cap at m=1,
exactly AT it at m=2, and 2x/4x OVER at m=4/8. ngram_jaccard_pairs (the
pair source dedup_clusters consumes) runs with the cap on vs off at
each scale; the off arm's shared-shingle join must go quadratic in the
hot-doc count while the on arm stays m-proportional once the cap
engages.

Protocol (experiments/ conventions): scaled fixture dirs are written
once off the clock (documents/events/embeddings parquet under
$LV_SCALE_DIR, default /tmp/lv_scale_curves), the catalog's shared
shingle cache is materialized off the clock per dir exactly as bench.py
does (its build time is reported separately — it is itself a scaling
data point), every equality/proportionality gate passes BEFORE a
timing is accepted, each (query, scale) point is the min of 2 in-JVM
runs, and the per-query scaling exponent is the least-squares slope of
log2(sec) over log2(m).

Run: SPARK_GRAFT_DRIVER_MEM=16g PYTHONPATH=/root/repo \
     python experiments/measure_scale_curves.py
(defaults reproduce the MEASURED table below: LV_SCALES=1,2,4,8;
LV_SCALE_FORCE=1 overrides the quiet-box probe gate,
LV_SCALE_MAX_ST/_MT move its thresholds)

MEASURED (this box, local[32], min-of-2 per point, sf0.1 base,
2026-08-16 probe-gated campaign: before-probe st=1.2146 mt=1.7661 —
inside both idle plateaus — after-probe st=1.52 mt=5.47, so co-tenant
load ARRIVED during the tail and every late reading is an upper
bound; see ARCHITECTURE.md "Scaling curves" for the reading):

    query                       1x      2x      4x      8x  exponent
    dedup_drop_list_16band    3.546   4.762   8.815  17.550     0.78
    dedup_clusters            3.006   2.544   4.631   5.304     0.33
    a_user_trend_slope        3.069   3.269   2.593   3.128    -0.03
    ivf_topk_batch            1.599   1.783   2.413   2.365     0.21
    dedup_drop_list           2.299   3.104   4.691   5.307     0.42
    shingle-cache build       3.226   1.015   1.201   1.221   (first
      build pays JVM warmup; the warm 2x->8x steps, 1.02 -> 1.22 s
      for 4x the rows, are the meaningful ones)

    A 1x/2x/4x-only campaign in the round's post-bench quiet window
    reproduced the same shape within the documented between-JVM band
    (16band 4.10/7.85/9.73, drop_list 2.16/5.12/6.27, clusters
    2.41/2.75/4.86, ivf 1.49/1.66/2.33, trend flat), and an earlier
    CONTENDED campaign read the 16band m=8 point at 52 s — the probe
    bracket is what separates that artifact from the 17.55 s
    (= 1.99x its m=4 value, exactly one doubling) measured here.

    CAVEAT, found while chasing that 52 s artifact (full mechanism in
    measure_shuffle_sys_storms.py): shuffle-heavy runs on this box
    are bimodal — kernel memory-compaction storms burn 30-56% of all
    cpu in SYS time on identical plans in spin-probe-quiet windows.
    The published 16band points are therefore UPPER bounds; its 8x
    min over every quiet-gated run this round is 7.66 s, BELOW the
    best 4x reading, so the true data-dependent exponent is smaller
    than the 0.78 fitted here and the sub-linear conclusion is
    conservative in the direction that matters.

    r19 RE-RUN (VERDICT item 7; 16band only, probe-gated entry
    st=1.0905 mt=1.6224 / exit st=1.2873 mt=1.7226 — both ends under
    the thresholds — campaign sys% 19.4, below the 25 storm mark):
    2.532 / 1.857 / 2.295 / 6.471 s at m=1/2/4/8, fitted exponent
    0.44. The 8x point (6.47 s) is the new minimum across every
    probe-gated campaign — below r18's quiet-gated 7.66 s min and far
    below the contended 17.55 s that fitted 0.78 — so the published
    0.78 stays a valid UPPER bound and the data-dependent exponent is
    materially smaller (0.44 on this window; 0.90 fitting only the
    warm 2x->8x points). The 1x reading carries first-run JVM warmup.
    A second r19 campaign (quiet-gated entry, but campaign sys% 28.9
    ABOVE the 25 storm threshold - upper bounds except as minima)
    read 1.310/3.786/4.181/4.459 (fit 0.54); its m=1/m=8 points are
    new cross-campaign minima, putting the 8x floor at 4.46 s and
    the min-per-point fit across all probe-gated campaigns at 0.56.

    All proportionality gates held exactly at every scale: drop
    lists 244/488/976/1952 rows, clusters 5k/10k/20k/40k, trend
    slope 1500/3000/6000/12000 users, ivf recall_ok 3/3.

    hot-shingle cap A/B (ngram_jaccard_pairs on the hot corpus;
    phrase df = 500/1000/2000/4000 at m=1/2/4/8, cap = 1000):
      m=1: cap-on 2.369 s / 112,374 pairs  cap-off  1.918 s / 112,374
      m=2: cap-on 2.465 s / 443,485 pairs  cap-off  2.333 s / 443,485
      m=4: cap-on 2.774 s /   2,324 pairs  cap-off  3.206 s / 1,761,918
      m=8: cap-on 5.266 s /   4,648 pairs  cap-off 10.885 s / 7,023,628
    At m=1 (df 500) and m=2 (df 1000 == cap; the filter drops only
    df > cap) both arms keep the phrase shingles and agree exactly —
    and the shared pair count already grows ~C(500m,2): 112,374 ->
    443,485 is 3.95x for 2x the docs. From m=4 the capped arm drops
    the phrase and goes exactly linear (2,324 -> 4,648 = 2x), while
    the uncapped arm quadruples per doubling through three doublings
    (443,485 -> 1,761,918 -> 7,023,628; 3.97x/3.99x) — 1,511x the
    capped arm's output at m=8, where the WALL gap emerges too
    (10.9 s vs 5.3 s, same window, ratio robust to the shared late
    contention). The quadratic is in the CANDIDATE VOLUME, which is
    what explodes downstream shuffles and verify joins at corpus
    scale — C(50M,2)-shaped hot blocks at 100 TB are an outage, not
    a job. The cap is load-bearing, and it engages exactly where
    designed.

The four data-bound queries' exponents sit in 0.21-0.78 over three
doublings — SUB-linear at this fixture scale because per-stage
constants (task scheduling, codegen, the fixed 3-query IVF probe
spine and KMeans fit) still dominate 5k-40k-row inputs; the
data-dependent terms (banded shuffle volume, star-contract
iterations, per-cell candidate scans) grow m-proportionally on top
of that floor: the most data-bound query (16band) converges to
exactly 2x per doubling at the top of the range, the linear
asymptote. a_user_trend_slope is FLAT (-0.03): at 100k-800k events
the applyInPandas stage is pure per-stage constant (Arrow round-trip
+ Python worker spin-up), the measured shape that motivated keeping
the regr_slope built-in variant as the production path. Nothing is
super-linear anywhere in the range; the known quadratic risk
(uncapped hot shingles) is demonstrated and bounded by the cap above.
"""

import math
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from logvision_spark.catalog import CATALOG, _shared_shingles  # noqa: E402
from logvision_spark.operators.dedup import ngram_jaccard_pairs  # noqa: E402

BASE = os.environ.get("LV_SCALE_BASE", "/root/testdata/sf0.1")
OUT = os.environ.get("LV_SCALE_DIR", "/tmp/lv_scale_curves")
SCALES = tuple(
    int(m) for m in os.environ.get("LV_SCALES", "1,2,4,8").split(",")
)
STRIDE = 1_000_000  # id offset per replica (>> any fixture id)
QUERIES = [
    "dedup_drop_list_16band",
    "dedup_clusters",
    "a_user_trend_slope",
    "ivf_topk_batch",
    "dedup_drop_list",
]
# r19: a targeted re-run (the 16band quiet-window exponent, r18
# verdict item 7) need not pay the full 5-query campaign or the cap
# A/B tail — LV_SCALE_QUERIES narrows the list, LV_SCALE_SKIP_CAP
# skips the A/B; defaults reproduce the full campaign unchanged.
if os.environ.get("LV_SCALE_QUERIES"):
    QUERIES = [
        q for q in os.environ["LV_SCALE_QUERIES"].split(",") if q in QUERIES
    ]
SKIP_CAP = bool(os.environ.get("LV_SCALE_SKIP_CAP"))
HOT_PHRASE = "the quick brown fox jumps over the lazy dog again"  # 10 toks
CAP = 1000  # the operators' default max_doc_freq

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config(
        "spark.driver.memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    )
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def _suffixed_docs(m: int):
    """sf0.1 documents + (m-1) disjoint-vocab replicas (see module doc)."""
    base = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = [base.select("doc_id", "text", "lang", "source", "n_chars")]
    for r in range(1, m):
        suf = F.lit(f"~{r}")
        parts.append(
            base.select(
                (F.col("doc_id") + r * STRIDE).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split("text", " "), lambda t: F.concat(t, suf)
                    ),
                ).alias("text"),
                "lang",
                "source",
                F.length(
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split("text", " "),
                            lambda t: F.concat(t, suf),
                        ),
                    )
                ).alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _build_dir(m: int) -> str:
    """Write the scale-m fixture dir once; reused across runs."""
    d = os.path.join(OUT, f"x{m}")
    marker = os.path.join(d, "_built")
    if os.path.exists(marker):
        return d
    _suffixed_docs(m).coalesce(max(1, m)).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    ev_parts = [ev]
    for r in range(1, m):
        ev_parts.append(
            ev.withColumn("event_id", F.col("event_id") + r * STRIDE)
            .withColumn("user_id", F.col("user_id") + r * STRIDE)
        )
    evs = ev_parts[0]
    for p in ev_parts[1:]:
        evs = evs.unionByName(p)
    evs.coalesce(max(1, m)).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    em_parts = [emb]
    for r in range(1, m):
        roll = (r * 7) % 64
        rolled = F.concat(
            F.slice("embedding", roll + 1, 64 - roll),
            F.slice("embedding", 1, roll),
        ).cast("array<float>")
        em_parts.append(
            emb.select(
                (F.col("vec_id") + r * STRIDE).alias("vec_id"),
                rolled.alias("embedding"),
                "label",
            )
        )
    embs = em_parts[0]
    for p in em_parts[1:]:
        embs = embs.unionByName(p)
    embs.coalesce(max(1, m)).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    with open(marker, "w") as f:
        f.write(f"m={m} base={BASE}\n")
    return d


def _hot_docs(m: int):
    """The scaled corpus with the unsuffixed stop phrase prepended to
    10% of docs — phrase-trigram df = 500*m (see module doc)."""
    docs = spark.read.parquet(os.path.join(_build_dir(m), "documents.parquet"))
    return docs.withColumn(
        "text",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(10)) == 0,
            F.concat(F.lit(HOT_PHRASE + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )


def _fit_exponent(points: dict[int, float]) -> float:
    """Least-squares slope of log2(sec) over log2(m); NaN below two
    distinct scales (nothing to fit)."""
    xs = [math.log2(m) for m in sorted(points)]
    ys = [math.log2(points[m]) for m in sorted(points)]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den if den else float("nan")


def _box_probe() -> tuple[float, float]:
    """(1-thread, 32-process) fixed-work spin readings from bench.py —
    the same instruments the bench retry gate trusts. Recorded before
    and after every campaign because this host carries co-tenant load:
    an 8x re-run of this script read 2-5x the quiet-window figures
    while the st probe read 2.1-2.7 vs the 1.07 idle floor. A campaign
    whose probes sit above ~1.3 st is measuring the neighbors, not the
    plans."""
    import bench

    return bench._calibrate(), bench._calibrate_mt()


def main() -> None:
    # /proc/stat kernel-time bracket over the whole campaign (r18
    # verdict item 7: publish the exponent WITH sys% evidence beside
    # it — the spin probes are blind to the box's memory-compaction
    # sys-storms; bench.py's storm flag splits the modes at 25%)
    import bench

    cpu0 = bench._proc_cpu_jiffies()
    st0, mt0 = _box_probe()
    print(f"box probe before: st={st0} mt={mt0}")
    # BOTH probes gate: the 1-thread spin always finds a free core
    # under co-tenant load (r15/r16 bench lesson) — during this
    # script's development the box read st=1.30 (borderline) while
    # the 32-process probe read 2.30 vs its 1.54 idle floor and every
    # query measured 2-3x its quiet figure
    noisy = (st0 and st0 > float(os.environ.get("LV_SCALE_MAX_ST", "1.25"))) \
        or (mt0 and mt0 > float(os.environ.get("LV_SCALE_MAX_MT", "1.85")))
    if noisy:
        print("box is NOT quiet (probe above LV_SCALE_MAX_ST/_MT); "
              "set LV_SCALE_FORCE=1 to measure anyway")
        if not os.environ.get("LV_SCALE_FORCE"):
            spark.stop()
            sys.exit(3)

    results: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    cache_secs: dict[int, float] = {}
    base_counts: dict[str, int] = {}

    # proportionality gates reference the SMALLEST scale run this
    # campaign, so LV_SCALES need not include 1 and need not ascend
    scales = sorted(SCALES)
    m0 = scales[0]

    for m in scales:
        d = _build_dir(m)
        n_docs = spark.read.parquet(f"{d}/documents.parquet").count()
        assert n_docs == 5000 * m, (m, n_docs)

        # shared shingle cache off the clock, exactly like bench.py —
        # but its build time is itself a scaling point, so record it
        t0 = time.perf_counter()
        _shared_shingles(spark, d).count()
        cache_secs[m] = round(time.perf_counter() - t0, 4)

        for q in QUERIES:
            rows = CATALOG[q].builder(spark, d).collect()
            # ---- proportionality / correctness gates BEFORE timing ----
            if q in ("dedup_drop_list", "dedup_drop_list_16band",
                     "dedup_clusters", "a_user_trend_slope"):
                if m == m0:
                    base_counts[q] = len(rows)
                assert len(rows) * m0 == base_counts[q] * m, (
                    q, m, len(rows), base_counts[q]
                )
            if q == "ivf_topk_batch":
                assert len(rows) == 3 and all(r["recall_ok"] for r in rows), (
                    q, m, rows,
                )
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                CATALOG[q].builder(spark, d).collect()
                best = min(best, time.perf_counter() - t0)
            results[q][m] = round(best, 4)
            print(f"  m={m} {q}: {results[q][m]} s ({len(rows)} rows)",
                  flush=True)

    print(f"\n{'query':<26s}" + "".join(f"{m}x".rjust(9) for m in scales)
          + "  exponent")
    for q in QUERIES:
        exp = _fit_exponent(results[q])
        print(f"{q:<26s}"
              + "".join(f"{results[q][m]:9.3f}" for m in scales)
              + f"{exp:10.2f}")
    cexp = _fit_exponent(cache_secs)
    print(f"{'shingle-cache build':<26s}"
          + "".join(f"{cache_secs[m]:9.3f}" for m in scales)
          + f"{cexp:10.2f}")

    # ---- hot-shingle cap A/B under df doubling ----
    if SKIP_CAP:
        scales = []
    else:
        print("\nhot-shingle cap A/B (ngram_jaccard_pairs, phrase df = "
              f"500*m, cap = {CAP}):")
    for m in scales:
        hot = _hot_docs(m).persist()
        hot.count()
        row = {}
        for label, cap in (("cap-on", CAP), ("cap-off", None)):
            best, pairs = float("inf"), None
            for _ in range(2):
                t0 = time.perf_counter()
                got = ngram_jaccard_pairs(
                    hot, threshold=0.05, max_doc_freq=cap
                ).count()
                best = min(best, time.perf_counter() - t0)
                assert pairs is None or pairs == got
                pairs = got
            row[label] = (round(best, 3), pairs)
        hot.unpersist()
        print(f"  m={m}: cap-on {row['cap-on'][0]} s / {row['cap-on'][1]:,} "
              f"pairs   cap-off {row['cap-off'][0]} s / "
              f"{row['cap-off'][1]:,} pairs", flush=True)

    st1, mt1 = _box_probe()
    print(f"\nbox probe after: st={st1} mt={mt1} "
          f"(before: st={st0} mt={mt0}) — figures are quiet-window "
          f"evidence only if both ends sit near the idle floor")
    sys_pct = bench._sys_pct_between(cpu0, bench._proc_cpu_jiffies())
    print(f"campaign sys%: {sys_pct} (storm threshold "
          f"{bench._SYS_STORM_PCT}; quiet children read ~3-12)")
    spark.stop()


if __name__ == "__main__":
    main()
