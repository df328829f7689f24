"""Measure the in-memory board-read stand-in's limit as a NUMBER
(r9 verdict item 6): `KVCounterStore.zrevrange` sorts the whole counter
dict per read — fine for tests and demos, but the serving docs say
"production = a real ZSET (Redis sorted set: O(log n) insert, O(log n +
k) zrevrange)" and that pointer deserves a measured point, not a vibe.

What this measures: median wall latency of `zrevrange(counter, 10)` and
`zscore` over stores of 10 k / 100 k / 1 M members in the hot counter
(plus a second counter of equal size, so the read also pays the
full-dict scan that filters by counter name — the actual implementation
cost, not a best case). Correctness gate before timing: the top-10 must
equal heapq.nlargest under the same (-total, member is None, member)
key.

No Spark: the store is populated through `merge()` with the Hypothesis
property tests' `_FakeDeltas` stub, so the numbers isolate the READ
path.

Run:  python experiments/measure_board_read_scale.py
"""

from __future__ import annotations

import heapq
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logvision_spark.streaming.multiplex import KVCounterStore  # noqa: E402
from tests.test_multiplex_properties import _FakeDeltas  # noqa: E402

REPEATS = 7


def _build(n_members: int) -> KVCounterStore:
    store = KVCounterStore()
    # deterministic totals with heavy ties (the board's worst case: the
    # tie-break comparator runs on member strings) across TWO counters,
    # so zrevrange('user', k) pays the real filter-by-counter scan
    rows = []
    for c in ("user", "url"):
        rows += [
            {"counter": c, "member": f"m{i:07d}", "delta": 1 + (i % 1000)}
            for i in range(n_members)
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
    print(f"{'members/counter':>16} {'zrevrange(10)':>14} {'zscore':>12}")
    for n in (10_000, 100_000, 1_000_000):
        store = _build(n)
        # equality gate BEFORE timing: stand-in top-10 ≡ nlargest under
        # the catalog tie-break
        got = store.zrevrange("user", 10)
        want = heapq.nsmallest(
            10,
            ((m, v) for (c, m), v in store.snapshot().items() if c == "user"),
            key=lambda r: (-r[1], r[0] is None, r[0] or ""),
        )
        assert got == want, (got[:3], want[:3])
        t_board = _timeit(lambda: store.zrevrange("user", 10))
        t_score = _timeit(lambda: store.zscore("user", "m0000042"))
        print(f"{n:>16,} {t_board * 1e3:>11.1f} ms {t_score * 1e6:>9.2f} µs")


if __name__ == "__main__":
    main()
