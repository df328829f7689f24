"""Measure the KV store's file persistence pair at board scale.

r14 shipped `KVCounterStore.persist_state_to(path)` / `restore_from(path)`
— the property-pinned JSON byte codec written via write-then-rename.
The properties prove correctness on ≤20-row stores; a production store
is the reference's Redis ZSET catalog, where ONE counter can hold a
million members (the board-read experiment's shape). This measures what
a restart actually costs at that size and gates every figure on a full
round-trip equality check first.

What is timed, separately, so the cost splits cleanly:
- `persist_state()` alone — the under-lock C-level dict copy + flatten
  (the live writer's stall window is ONLY the copy part of this);
- `persist_state_to()` — copy + JSON encode + mkstemp write + file
  fsync + rename + DIRECTORY fsync (the full durable publish path as
  shipped after the r14 fsync hardening and the r15 unique-tmp +
  dir-fsync ADVICE fixes — the measured figure includes every disk
  barrier the production call pays);
- `restore_from()` — read + parse + rebuild nested dicts.

Conventions (experiments/README.md): deterministic corpus (member
names and deltas derived from a polynomial hash, never rand()),
equality gates BEFORE any timing is reported, min-of-N per figure,
knobs at the top.

MEASURED (r15 builder box, bench calib probe 1.3345 vs the 0.946
healthy floor = ~1.4x slow — figures are upper bounds; min-of-3): at
1,000,000 members across 4 counters the state file is 31.9 MB;
persist_state() 0.65 s (the in-memory triple alone),
persist_state_to() 4.64 s — NOW INCLUDING the file fsync, the rename
and the directory fsync the shipped code pays (the r14 figure of
3.68 s was taken before the fsync landed and its docstring still said
"fsync-less"; this re-measure closes that gap, r14 verdict item 3) —
restore_from() 3.50 s. A full restart round-trip is ~8 s at a size
where the board-read path needs 58 ms per top-k read. The pair is a
cold-start/shutdown cost, not a per-batch one: nothing here sits on
the foreachBatch hot path, and the live writer's merge stall window
is only the under-lock C-level copy inside persist_state(), not the
encode/write/fsync tail.

Run: PYTHONPATH=/root/repo python experiments/measure_persist_file.py
(~1 min, pure Python — no Spark session.)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

N_MEMBERS = 1_000_000  # total members across all counters
N_COUNTERS = 4  # one hot board + siblings, the serving-layer shape
N_BATCHES = 5  # merges before persisting (fence position > 0)
REPS = 3  # min-of-N per timed figure


class _Deltas:
    """merge() consumes anything with .collect() -> dict rows (the
    tests' stand-in pattern); keeps the experiment Spark-free."""

    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


def _member(i: int) -> str:
    # deterministic, hash-spread member ids (convention: never rand())
    return f"m{(i * 1103515245 + 12345) & 0x7FFFFFFF:08x}"


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from logvision_spark.streaming.multiplex import KVCounterStore

    store = KVCounterStore()
    per_batch = N_MEMBERS // N_BATCHES
    for b in range(N_BATCHES):
        rows = [
            {
                "counter": f"board{(b * per_batch + i) % N_COUNTERS}",
                "member": _member(b * per_batch + i),
                "delta": ((b * per_batch + i) * 2654435761) % 100_000,
            }
            for i in range(per_batch)
        ]
        store.merge(_Deltas(rows), b)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "kv_state.json")

        # ---- correctness gate BEFORE any timing is reported ----
        store.persist_state_to(path)
        restored = KVCounterStore.restore_from(path)
        assert restored.snapshot() == store.snapshot(), "totals drifted"
        assert (
            restored.high_water_batch_id == store.high_water_batch_id
        ), "fence drifted"
        # live-begun carries: both must refuse an unforced backfill
        for s in (store, restored):
            try:
                s.backfill(_Deltas([{"counter": "x", "member": "y",
                                     "delta": 1}]))
            except RuntimeError:
                pass
            else:
                raise AssertionError("backfill guard did not carry over")
        assert os.listdir(d) == ["kv_state.json"], "tmp residue"
        size_mb = os.path.getsize(path) / 1e6

        # ---- timings (min-of-REPS each) ----
        t_copy = min(
            _timed(lambda: store.persist_state()) for _ in range(REPS)
        )
        t_write = min(
            _timed(lambda: store.persist_state_to(path))
            for _ in range(REPS)
        )
        t_read = min(
            _timed(lambda: KVCounterStore.restore_from(path))
            for _ in range(REPS)
        )

    n = sum(store.zcard(f"board{c}") for c in range(N_COUNTERS))
    print(
        f"\n{n:,} members / {N_COUNTERS} counters, fence at batch "
        f"{store.high_water_batch_id}, state file {size_mb:.1f} MB "
        f"(min-of-{REPS}):"
    )
    print(f"  persist_state()    (copy+flatten)        {t_copy:8.3f} s")
    print(f"  persist_state_to() (+ encode+write)      {t_write:8.3f} s")
    print(f"  restore_from()     (read+parse+rebuild)  {t_read:8.3f} s")
    print(
        "\ngates passed: round-trip snapshot/fence/guard equality at "
        "full size, no .tmp residue. Cold-start cost, not hot-path: "
        "nothing here runs inside foreachBatch."
    )


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
