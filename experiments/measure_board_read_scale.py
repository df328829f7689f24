"""Measure the in-memory board-read stand-in's limit as a NUMBER
(r9 verdict item 6): `KVCounterStore.zrevrange` sorts the whole counter
dict per read — fine for tests and demos, but the serving docs say
"production = a real ZSET (Redis sorted set: O(log n) insert, O(log n +
k) zrevrange)" and that pointer deserves a measured point, not a vibe.

What this measures: median wall latency of `zrevrange(counter, 10)`,
`zscore`, and the r12 per-counter polling reads (`snapshot_counter` —
one inner-dict copy; `zcard` — O(1) len) over stores of
10 k / 100 k / 1 M members in the hot counter,
PLUS a second counter of equal size. Under the r10 flat
(counter, member)-keyed dict, every read scanned and filtered BOTH
counters (858 ms per zrevrange(10) at 1 M members); the r11 per-counter
layout scopes the read to one counter's dict, so the sibling is free —
and a third timing (`zrevrange` of a 150-member board beside the 1 M
sibling) pins exactly that isolation. Correctness gate before timing:
the top-10 must equal heapq.nlargest under the same
(-total, member is None, member) key.

No Spark: the store is populated through `merge()` with a 6-line deltas
stub (merge only calls .collect(); dict rows support the r["counter"]
access real Rows do), so the numbers isolate the READ path.

Run:  python experiments/measure_board_read_scale.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logvision_spark.streaming.multiplex import KVCounterStore  # noqa: E402

REPEATS = 7


class _FakeDeltas:
    """Stand-in for the post-aggregation deltas DataFrame: merge() only
    calls .collect(), and dict rows support the r["counter"] access the
    real Row objects do — keeps this experiment Spark-free and decoupled
    from the test suite (it previously imported the Hypothesis property
    tests' stub, which required pytest+hypothesis just to measure)."""

    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


def _build(n_members: int) -> KVCounterStore:
    store = KVCounterStore()
    # deterministic totals with heavy ties (the board's worst case: the
    # tie-break comparator runs on member strings) across TWO equal-size
    # counters — under the flat layout zrevrange('user', k) paid a scan
    # of both; the per-counter layout should make the sibling free —
    # plus a SMALL 150-member board, the realistic serving shape (a user
    # board beside a huge url counter), to pin the isolation directly
    rows = []
    for c in ("user", "url"):
        rows += [
            {"counter": c, "member": f"m{i:07d}", "delta": 1 + (i % 1000)}
            for i in range(n_members)
        ]
    rows += [
        {"counter": "small_board", "member": f"u{i:03d}", "delta": 1 + i}
        for i in range(150)
    ]
    store.merge(_FakeDeltas(rows), 0)
    return store


def _timeit(fn) -> float:
    samples = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> None:
    print(
        f"{'members/counter':>16} {'zrevrange(10)':>14} {'zscore':>12}"
        f" {'150-mem board':>14} {'snap_counter':>14} {'zcard':>10}"
    )
    for n in (10_000, 100_000, 1_000_000):
        store = _build(n)
        # equality gate BEFORE timing: stand-in top-10 ≡ a FULL SORT
        # under the catalog tie-break (independent oracle — zrevrange
        # itself is heap-select since r12, so the gate must not share
        # its algorithm), for the hot counter AND the small board
        # (one snapshot, hoisted — it flattens the whole store); the
        # per-counter reads must equal that snapshot's counter slice
        snap = store.snapshot()
        for counter in ("user", "small_board"):
            got = store.zrevrange(counter, 10)
            slice_ = {m: v for (c, m), v in snap.items() if c == counter}
            want = sorted(
                slice_.items(),
                key=lambda r: (-r[1], r[0] is None, r[0] or ""),
            )[:10]
            assert got == want, (counter, got[:3], want[:3])
            assert store.snapshot_counter(counter) == slice_
            assert store.zcard(counter) == len(slice_)
        t_board = _timeit(lambda: store.zrevrange("user", 10))
        t_score = _timeit(lambda: store.zscore("user", "m0000042"))
        t_small = _timeit(lambda: store.zrevrange("small_board", 10))
        t_snapc = _timeit(lambda: store.snapshot_counter("user"))
        t_card = _timeit(lambda: store.zcard("user"))
        print(
            f"{n:>16,} {t_board * 1e3:>11.1f} ms {t_score * 1e6:>9.2f} µs"
            f" {t_small * 1e6:>11.2f} µs {t_snapc * 1e3:>11.2f} ms"
            f" {t_card * 1e6:>7.2f} µs"
        )

    # ---- the ALL-TIED degenerate board (r14 verdict optional 6) ----
    # every member at the same total: the threshold pass keeps all n
    # candidates, so before r15 the outside tail comparator-sorted 1 M
    # tuples per read; the bounded name-key heap replaces that. The
    # under-lock copy is unchanged by design (a counting pass to bound
    # it would tax every healthy read — see the zrevrange docstring).
    tied = KVCounterStore()
    tied.merge(
        _FakeDeltas(
            [
                {"counter": "tied", "member": f"m{i:07d}", "delta": 7}
                for i in range(1_000_000)
            ]
        ),
        0,
    )
    got = tied.zrevrange("tied", 10)
    want = sorted(
        ((m, v) for (c, m), v in tied.snapshot().items()),
        key=lambda r: (-r[1], r[0] is None, r[0] or ""),
    )[:10]
    assert got == want, (got[:3], want[:3])
    t_tied = _timeit(lambda: tied.zrevrange("tied", 10))
    print(f"\nall-tied 1M-member zrevrange(10): {t_tied * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
