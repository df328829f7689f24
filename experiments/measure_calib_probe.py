"""Validate bench.py's fixed-work calibration probe as a drift signal.

r12's judge burned forensic effort proving a +26% pass-1 core total was
box drift, not regression (both parse JVMs read -20% on byte-identical
parser.py). r13 added `_calibrate()` — a 10 M-iteration single-threaded
pure-Python spin timed at child start — so future rounds can separate
box drift from plan changes arithmetically. This experiment measures
whether the probe actually CO-MOVES with Spark query times when the box
degrades, by imposing controlled CPU contention (K background spinner
processes) and timing both the probe and two fixed catalog queries at
each level.

MEASURED FINDING (this box; range over three runs, two r13 + one
r14): the relationship is one-sided, with a host-state-dependent
magnitude. At 2x core oversubscription (32 spinners beside the
32-thread session) the queries inflate 1.27-1.83x while the
single-threaded probe reads 1.00-1.47x — and in EVERY run the probe
under-reads the query inflation (r13: probe ~1.0-1.14x vs queries
1.27-1.56x; r14, on a day the host itself probed ~15% slow at idle:
probe 1.47x vs queries 1.69-1.83x). One extra runnable thread on a
32-core box usually still gets most of a core, so co-tenant CORE
STEALING is at best partially visible to the probe; how much of it
leaks through depends on host state. The invariant that matters is
the direction: the probe is a LOWER bound on the box slowdown, so
normalizing query times by the calib ratio UNDER-corrects — it can
never manufacture a fake improvement, only leave residual inflation.
When the spinners die, query times return to (about) baseline,
confirming the inflation was contention, not ordering drift.
What the probe does track is whole-box single-thread speed (frequency/
thermal/page-cache class drift) — exactly the r12 failure mode, where
the single-JVM parse figures dropped 20% on byte-identical code. The
honest usage rule, recorded in ARCHITECTURE's bench notes: an INFLATED
calib_sec confirms box drift and licenses arithmetic normalization; a
FLAT calib_sec with inflated queries means co-tenant contention, which
the min-of-passes comparator (not the probe) is the defense against.

MEASURED FINDING, r16 (the N-process companion closes the blind spot):
bench.py's `_calibrate_mt` — the same fixed-work spin in N=32
concurrent processes — measured at the same levels: under 32 spinners
the 1-thread probe reads 1.21x while the companion reads **1.96x**, at
or above the query inflation itself (1.62x / 1.22x), and it reverses
with the spinners (1.06x at the trailing zero). Gated: the companion
must read at least as inflated as the 1-thread probe under load AND
cross the retry gate's 1.15x band — i.e. it FIRES under exactly the
co-tenant core stealing the 1-thread spin can sleep through (r15: st
probed 1.166 "healthy" while queries ran ~1.5-2.7x). The pairing rule:
the 1-thread probe is the box-speed instrument (normalization), the
N-process companion is the contention instrument (retry gating);
bench.py gates its one-shot child respawn on EITHER.

Design notes: levels run 0 -> 32 -> 0 so the final level proves
REVERSIBILITY — if query times return to baseline after the spinners
die, the mid-level inflation was contention, not JIT/ordering drift
(an earlier draft read a spurious 0.84x "speedup" at a sub-saturation
level because residual JIT warmth outpaced 8 spinners on 32 cores).

Conventions (experiments/README.md): correctness gate before any
timing — each query's collected checksum must be identical across
contention levels; min-of-N inside one warm JVM; knobs at the top.

Run: PYTHONPATH=/root/repo python experiments/measure_calib_probe.py
(~3 min; spawns up to 32 background spinners — run alone.)
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CONTENTION = [0, 32, 0]  # spinner processes; final 0 = reversibility probe
QUERIES = ["q1_pricing_summary", "dedup_drop_list"]  # scan-agg + shuffle-heavy
REPS = 3  # min-of-N per level (co-tenant noise floor)
# r16: 3 -> 6 after a measured spurious failure — with 3, q1's baseline
# still carried residual JIT warmth (it read 1.07 s at the baseline
# level and 0.48 s at the trailing recovery level, so the "sped up
# under load" direction gate fired on warmth, not contention; the
# module docstring's earlier-draft note describes the same mechanism)
WARMUP_REPS = 6  # drain JIT/codegen warmth before any timed level

_SPIN_SRC = "while True:\n x = 0\n for i in range(1000000): x = (x * 31 + i) & 0xFFFFFFFF\n"


def _checksum(rows) -> int:
    # order-insensitive content hash: the gate, not the measurement
    return sum(hash(tuple(r)) & 0xFFFFFFFFFFFF for r in rows) & 0xFFFFFFFFFFFFFFFF


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from bench import _calibrate, _calibrate_mt
    from logvision_spark import get_spark
    from logvision_spark.catalog import CATALOG

    spark = get_spark("calib-probe-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen off the clock at zero contention — enough
    # reps that the timed levels sit on the JIT plateau (the
    # reversibility level at the end is the check that they did)
    for _ in range(WARMUP_REPS):
        for q in QUERIES:
            CATALOG[q].builder(spark, SF_DIR).collect()
    _calibrate()

    baseline_sums: dict[str, int] = {}
    results: list[tuple[int, float, dict[str, float]]] = []
    for k in CONTENTION:
        # spinners start INSIDE the try, one at a time: if Popen #n
        # fails partway, the finally still reaps the n-1 already
        # running — an orphaned `while True` process would silently
        # corrupt every later measurement on the box (review finding)
        spinners: list[subprocess.Popen] = []
        try:
            for _ in range(k):
                spinners.append(
                    subprocess.Popen(
                        [sys.executable, "-c", _SPIN_SRC],
                        stdout=subprocess.DEVNULL,
                        stderr=subprocess.DEVNULL,
                    )
                )
            time.sleep(1.0)  # let the spinners actually land on cores
            calib = min(_calibrate() for _ in range(REPS))
            # the r16 N-process companion, measured at the same levels:
            # min-of-REPS like every other figure; None (platform
            # can't run it) simply drops the mt gates below
            mt_reads = [_calibrate_mt() for _ in range(REPS)]
            calib_mt = (
                min(v for v in mt_reads if v is not None)
                if any(v is not None for v in mt_reads) else None
            )
            qsecs: dict[str, float] = {}
            for q in QUERIES:
                best, rows = float("inf"), None
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    rows = CATALOG[q].builder(spark, SF_DIR).collect()
                    best = min(best, time.perf_counter() - t0)
                # correctness gate: contention must not change answers
                s = _checksum(rows)
                if q in baseline_sums:
                    assert s == baseline_sums[q], f"{q} checksum drifted at K={k}"
                baseline_sums[q] = s
                qsecs[q] = round(best, 4)
            results.append(
                (k, round(calib, 4),
                 round(calib_mt, 4) if calib_mt is not None else None,
                 qsecs)
            )
        finally:
            for p in spinners:
                p.send_signal(signal.SIGTERM)
            for p in spinners:
                p.wait()
    spark.stop()

    base_calib = results[0][1]
    base_mt = results[0][2]
    base_q = results[0][3]
    print(f"\ncontention sweep at {SF_DIR} (min-of-{REPS} per level):")
    print(f"{'spinners':>8} {'calib_sec':>10} {'calib_x':>8}"
          f" {'mt_sec':>8} {'mt_x':>6}", end="")
    for q in QUERIES:
        print(f" {q + '_sec':>22} {'x':>6}", end="")
    print()
    for k, calib, calib_mt, qsecs in results:
        mtx = (f"{calib_mt / base_mt:>6.2f}"
               if calib_mt is not None and base_mt else f"{'-':>6}")
        print(f"{k:>8} {calib:>10} {calib / base_calib:>8.2f}"
              f" {calib_mt if calib_mt is not None else '-':>8} {mtx}",
              end="")
        for q in QUERIES:
            print(f" {qsecs[q]:>22} {qsecs[q] / base_q[q]:>6.2f}", end="")
        print()

    # gates: (a) at full oversubscription neither the probe nor any
    # query runs FASTER than baseline (direction); (b) after the
    # spinners die, query times return to within 15% of baseline —
    # the mid-level inflation was contention, not JIT/ordering drift.
    # Derived from the knob, not hardcoded indices: "loaded" is the
    # heaviest level, "recovered" is the trailing zero the sweep must
    # end on (review finding — a [0, 8, 16, 32, 0] rerun would have
    # asserted against the wrong levels)
    assert CONTENTION[0] == 0 and CONTENTION[-1] == 0 and max(CONTENTION) > 0
    _, loaded_calib, loaded_mt, loaded_q = results[
        CONTENTION.index(max(CONTENTION))
    ]
    # 0.95, not 0.98: the probe's measured lower bound under 32 spinners
    # is 1.00x on this box, so 0.98 sat at the edge of its own behavior
    # and an ordinary noise excursion could fail the experiment
    # spuriously (r13 ADVICE). The finding being validated is the
    # MAGNITUDE gap (probe ~1.0x vs queries 1.3-1.6x), not a strict
    # >=1.00 direction — the gate only needs to catch the probe reading
    # materially FASTER under load, which would invalidate the rule.
    assert loaded_calib >= base_calib * 0.95, (
        f"probe sped up under load: {loaded_calib} vs {base_calib}"
    )
    for q in QUERIES:
        assert loaded_q[q] >= base_q[q], f"{q} sped up under load"
    _, _, _, recovered_q = results[-1]
    for q in QUERIES:
        assert recovered_q[q] <= base_q[q] * 1.15, (
            f"{q} did not recover: {recovered_q[q]} vs base {base_q[q]}"
        )
    # r16 gates for the N-process companion (the probe the r15
    # blind spot demanded): at full oversubscription it must (a) read
    # at least as inflated as the 1-thread probe — it saturates the
    # cores the spinners are stealing — and (b) cross the retry gate's
    # 1.15x trigger band, i.e. it FIRES under exactly the contention
    # the 1-thread spin can sleep through.
    if base_mt is not None and loaded_mt is not None:
        st_x = loaded_calib / base_calib
        mt_x = loaded_mt / base_mt
        assert mt_x >= st_x * 0.95, (
            f"mt probe less sensitive than st under load: {mt_x:.2f} "
            f"vs {st_x:.2f}"
        )
        assert mt_x > 1.15, (
            f"mt probe did not cross the retry band under full "
            f"oversubscription: {mt_x:.2f}"
        )
    print("\ngates passed: inflation under load is directional for probe "
          "and queries, reverses when the spinners die, and checksums "
          "are identical at every level. Note the MAGNITUDE gap (probe "
          f"{loaded_calib / base_calib:.2f}x vs queries "
          + ", ".join(f"{loaded_q[q] / base_q[q]:.2f}x" for q in QUERIES)
          + (f"; N-process companion {loaded_mt / base_mt:.2f}x"
             if base_mt is not None and loaded_mt is not None else "")
          + "): the probe tracks box speed, not co-tenant core stealing "
          "— the N-process companion is the instrument that sees the "
          "stealing; see the module docstring for the usage rule.")


if __name__ == "__main__":
    main()
