"""Interleaved A/B: j2_timeline_full_outer old form (group/join on the
26-char formatted hour string, planner SMJ) vs r19 form (group/join on
the truncated timestamp, SHUFFLE_HASH, format once post-join). Arms
alternate per round in ONE JVM; result equality asserted every round.
MEASURED: see OPTIMIZATION_r19.md j2 section."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from logvision_spark.session import get_spark
from logvision_spark import catalog
from logvision_spark.sources.readers import load_table
from logvision_spark.operators.joins import timeline_full_outer

SF = "/root/testdata/sf0.1"
ROUNDS = 10


def old_form(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    hour = F.date_format(
        F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ).alias("hour")
    e = (
        ev.where(F.col("event_type") == "error")
        .groupBy(hour)
        .agg(F.count(F.lit(1)).alias("error_cnt"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(hour)
        .agg(F.count(F.lit(1)).alias("purchase_cnt"))
    )
    return timeline_full_outer(
        e, p, key="hour", good_alias="error_cnt", bad_alias="purchase_cnt"
    )


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    new_fn = catalog.queries()["j2_timeline_full_outer"]
    arms = {"old": lambda: old_form(spark, SF), "new": lambda: new_fn(spark, SF)}
    for fn in arms.values():
        fn().collect()  # JIT both arms off the clock
    ref, times = None, {"old": [], "new": []}
    for i in range(2 * ROUNDS):
        arm = "new" if i % 2 == 0 else "old"
        spark.sparkContext.setJobDescription(f"j2[{arm}] {i}")
        t0 = time.perf_counter()
        rows = arms[arm]().collect()
        times[arm].append(time.perf_counter() - t0)
        got = sorted(map(tuple, rows))
        assert ref is None or got == ref, f"arm {arm} diverged"
        ref = got
    for arm, ts in times.items():
        ts = sorted(ts)
        print(f"{arm:4s} min={ts[0]:.3f} p50={ts[len(ts)//2]:.3f} all={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
