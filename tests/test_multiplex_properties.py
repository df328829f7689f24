"""Property-based melt equivalence: for ARBITRARY row data and counter
specs, `melted_counter_deltas` must equal running each spec as its own
groupBy — NULL members kept, NULL weights dropped, `when` predicates
honored, totals exact in integer units. The example-based tests pin the
log-schema catalog; this pins the OPERATOR for any spec a user writes.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from logvision_spark.streaming.multiplex import (
    CounterSpec,
    melted_counter_deltas,
)

# small alphabets on purpose: collisions are the interesting case
member = st.one_of(st.none(), st.sampled_from(["a", "b", "c", ""]))
weight = st.one_of(st.none(), st.integers(-5, 5))
flag = st.booleans()
row = st.tuples(member, weight, flag)

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=st.lists(row, min_size=1, max_size=25))
@SET
def test_melt_equals_per_spec_groupbys(spark, rows):
    df = spark.createDataFrame(
        rows, "m string, w long, f boolean"
    )
    specs = [
        # plain count over every row
        CounterSpec("cnt_all", F.col("m")),
        # weighted, gated on the flag (NULL weights must drop)
        CounterSpec("w_flagged", F.col("m"), weight=F.col("w"),
                    when=F.col("f")),
        # fixed-member total (the "totals" shape)
        CounterSpec("totals", F.lit("sum_w"), weight=F.col("w")),
    ]
    got = {
        (r["counter"], r["member"]): r["delta"]
        for r in melted_counter_deltas(df, specs).collect()
    }

    expect = {}
    for r in df.groupBy("m").agg(F.count(F.lit(1)).alias("d")).collect():
        expect[("cnt_all", r["m"])] = r["d"]
    for r in (
        df.where(F.col("f") & F.col("w").isNotNull())
        .groupBy("m").agg(F.sum("w").alias("d")).collect()
    ):
        expect[("w_flagged", r["m"])] = r["d"]
    tot = df.agg(F.sum("w").alias("d")).collect()[0]["d"]
    if tot is not None:
        expect[("totals", "sum_w")] = tot

    assert got == expect


@given(rows=st.lists(row, min_size=1, max_size=25))
@SET
def test_melt_split_merge_equals_whole(spark, rows):
    """Delta additivity — the property the KV merge relies on: melting
    two halves and adding deltas equals melting the whole."""
    df = spark.createDataFrame(rows, "m string, w long, f boolean")
    specs = [
        CounterSpec("cnt", F.col("m")),
        CounterSpec("w", F.col("m"), weight=F.col("w"), when=F.col("f")),
    ]
    whole = {
        (r["counter"], r["member"]): r["delta"]
        for r in melted_counter_deltas(df, specs).collect()
    }
    n = max(1, len(rows) // 2)
    merged: dict = {}
    for part in (rows[:n], rows[n:]):
        if not part:
            continue
        pdf = spark.createDataFrame(part, "m string, w long, f boolean")
        for r in melted_counter_deltas(pdf, specs).collect():
            k = (r["counter"], r["member"])
            merged[k] = merged.get(k, 0) + r["delta"]
    assert merged == whole


class _FakeDeltas:
    """Stand-in for the post-aggregation deltas DataFrame: merge() only
    calls .collect(), and dict rows support the r[\"counter\"] access the
    real Row objects do — lets the fence property run WITHOUT Spark."""

    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


# Structured Streaming's delivery contract for foreachBatch: batch_ids
# arrive in non-decreasing order, where a repeat or drop-back is an
# at-least-once REDELIVERY of work already applied (checkpoint replay).
delivery = st.lists(st.integers(0, 6), min_size=1, max_size=12).map(sorted)


@given(ids=delivery, shuffle=st.randoms())
@settings(max_examples=200, deadline=None)
def test_high_water_fence_applies_each_batch_exactly_once(ids, shuffle):
    """For ANY non-decreasing delivery with replays — including replays
    arriving late, below the high-water mark — the merged state must
    equal applying each DISTINCT batch exactly once (the exactly-once
    contract the fence exists to restore over at-least-once delivery)."""
    from logvision_spark.streaming.multiplex import KVCounterStore

    # inject some below-high-water redeliveries while preserving the
    # "replay only what was already seen" invariant: any prefix still
    # never contains an id that has not been delivered before it
    replayed = list(ids)
    for i in range(1, len(replayed)):
        if shuffle.random() < 0.3:
            replayed.insert(i, shuffle.choice(replayed[:i]))

    store = KVCounterStore()
    for b in replayed:
        # payload is a deterministic function of the batch id, so a
        # double-applied replay is guaranteed to corrupt a total
        store.merge(
            _FakeDeltas([
                {"counter": "c", "member": f"m{b % 3}", "delta": b + 1},
                {"counter": "totals", "member": "n", "delta": 1},
            ]),
            b,
        )

    expect: dict = {}
    for b in sorted(set(replayed)):
        for key, d in ((("c", f"m{b % 3}"), b + 1), (("totals", "n"), 1)):
            expect[key] = expect.get(key, 0) + d
    assert store.snapshot() == expect
    assert store.high_water_batch_id == max(replayed)


def test_backfill_refused_during_inflight_first_merge():
    """The TOCTOU window the review found: merge() holds no lock during
    its collect and only advances the high-water mark AFTER applying, so
    a guard keyed on high_water alone would let a backfill racing the
    FIRST batch's in-flight collect pass both checks and double-count.
    Reproduced deterministically: the merge's own collect() call
    attempts the backfill — it must be refused (the live-begun flag is
    raised under the lock BEFORE the collect), and the merge itself must
    still apply."""
    from logvision_spark.streaming.multiplex import KVCounterStore

    store = KVCounterStore()
    refused = {}

    class _CollectRacesBackfill:
        def collect(self):
            # at this instant batch 0 is mid-flight: fence passed,
            # high_water still -1
            assert store.high_water_batch_id == -1
            try:
                store.backfill(
                    _FakeDeltas(
                        [{"counter": "c", "member": "dup", "delta": 1}]
                    )
                )
            except RuntimeError as exc:
                refused["err"] = str(exc)
            return [{"counter": "c", "member": "m", "delta": 7}]

    store.merge(_CollectRacesBackfill(), 0)
    assert "BEFORE attaching" in refused["err"]
    assert store.snapshot() == {("c", "m"): 7}  # merge applied once, no dup
    assert store.high_water_batch_id == 0


@given(
    n_backfills=st.integers(0, 3),
    ids=delivery,
    shuffle=st.randoms(),
    late_force=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_backfill_contract_over_any_cutover(
    n_backfills, ids, shuffle, late_force
):
    """The r10 ordering guard as a property: ANY number of backfills
    BEFORE the first live merge apply additively without touching the
    fence; any delivery-with-replays after them is fenced exactly-once;
    and a LATE backfill — at-least-one-merge-later — always raises and
    leaves state byte-identical, unless the operator forces it (the
    declared provably-disjoint override), in which case it applies and
    the fence still reads the live high-water mark."""
    from logvision_spark.streaming.multiplex import KVCounterStore

    store = KVCounterStore()
    expect: dict = {}
    for j in range(n_backfills):
        store.backfill(
            _FakeDeltas(
                [{"counter": "c", "member": f"a{j % 2}", "delta": j + 1}]
            )
        )
        expect[("c", f"a{j % 2}")] = expect.get(("c", f"a{j % 2}"), 0) + j + 1
    assert store.high_water_batch_id == -1  # backfills never advance it

    replayed = list(ids)
    for i in range(1, len(replayed)):
        if shuffle.random() < 0.3:
            replayed.insert(i, shuffle.choice(replayed[:i]))
    for b in replayed:
        store.merge(
            _FakeDeltas([{"counter": "c", "member": f"a{b % 2}",
                          "delta": b + 1}]),
            b,
        )
    for b in sorted(set(replayed)):
        expect[("c", f"a{b % 2}")] = expect.get(("c", f"a{b % 2}"), 0) + b + 1

    late = _FakeDeltas([{"counter": "c", "member": "late", "delta": 5}])
    if late_force:
        store.backfill(late, force=True)
        expect[("c", "late")] = 5
    else:
        before = store.snapshot()
        with pytest.raises(RuntimeError, match="BEFORE attaching"):
            store.backfill(late)
        assert store.snapshot() == before  # refusal is atomic
    assert store.snapshot() == expect
    assert store.high_water_batch_id == max(replayed)


# a backfill tranche as the deltas merge()/backfill() consume: counter,
# member (NULLs and collisions with the live alphabet on purpose), delta
tranche_row = st.tuples(
    st.sampled_from(["c", "totals"]),
    st.one_of(st.none(), st.sampled_from(["a0", "a1", "x", ""])),
    st.integers(-5, 5),
)
tranche = st.lists(tranche_row, min_size=0, max_size=10)


def _agg(rows_by_key: dict, rows) -> None:
    for c, m, d in rows:
        rows_by_key[(c, m)] = rows_by_key.get((c, m), 0) + d


@given(tranche_a=tranche, ids=delivery, shuffle=st.randoms(),
       tranche_b=tranche)
@settings(max_examples=200, deadline=None)
def test_forced_late_backfill_of_disjoint_tranche_is_additive(
    tranche_a, ids, shuffle, tranche_b
):
    """The one legitimate `force=True` use the docstring names
    (multiplex.py backfill: "loading a second archive tranche the live
    stream provably does not watch"), pinned as a property: for ANY
    early tranche + ANY fenced live delivery-with-replays + ANY second
    tranche whose ROWS are disjoint from the streamed input (members may
    and do collide — disjointness is about files, not keys), a forced
    late backfill must apply additively, leave the fence at the live
    high-water mark, and end with store ≡ ONE batch aggregation over
    tranche_a ∪ distinct-live-batches ∪ tranche_b (the merged-state ≡
    batch-agg-over-union equivalence the module docstring promises)."""
    from logvision_spark.streaming.multiplex import KVCounterStore

    store = KVCounterStore()
    expect: dict = {}

    if tranche_a:
        store.backfill(
            _FakeDeltas(
                [{"counter": c, "member": m, "delta": d}
                 for c, m, d in tranche_a]
            )
        )
        _agg(expect, tranche_a)

    replayed = list(ids)
    for i in range(1, len(replayed)):
        if shuffle.random() < 0.3:
            replayed.insert(i, shuffle.choice(replayed[:i]))
    for b in replayed:
        store.merge(
            _FakeDeltas([{"counter": "c", "member": f"a{b % 2}",
                          "delta": b + 1}]),
            b,
        )
    _agg(expect, (("c", f"a{b % 2}", b + 1) for b in sorted(set(replayed))))

    # live has begun (delivery is non-empty), so this backfill is LATE —
    # unforced it must raise (pinned elsewhere); forced it must apply
    store.backfill(
        _FakeDeltas(
            [{"counter": c, "member": m, "delta": d}
             for c, m, d in tranche_b]
        ),
        force=True,
    )
    _agg(expect, tranche_b)

    assert store.snapshot() == expect
    assert store.high_water_batch_id == max(replayed)


def test_reads_race_merges_without_tearing():
    """The class docstring's thread-safety promise, exercised: one
    writer thread applies 400 distinct batches while reader threads
    hammer snapshot/zrevrange/zscore/to-high-water the whole time. No
    read may raise, every snapshot must be internally CONSISTENT (each
    batch writes the same delta to two counters, so any torn read —
    e.g. the r11 outside-lock flatten accidentally exposing a half-
    applied batch — shows up as the pair diverging), and the final
    state must equal all batches applied exactly once."""
    import threading

    from logvision_spark.streaming.multiplex import KVCounterStore

    store = KVCounterStore()
    n_batches = 400
    errors: list[BaseException] = []
    stop = threading.Event()

    def _writer():
        for b in range(n_batches):
            # the same delta lands in BOTH counters under the one lock,
            # so ("a", m) and ("b", m) can never legally diverge
            store.merge(
                _FakeDeltas([
                    {"counter": "a", "member": f"m{b % 5}", "delta": 1},
                    {"counter": "b", "member": f"m{b % 5}", "delta": 1},
                ]),
                b,
            )

    def _reader():
        try:
            while not stop.is_set():
                snap = store.snapshot()
                a = {m: v for (c, m), v in snap.items() if c == "a"}
                b = {m: v for (c, m), v in snap.items() if c == "b"}
                assert a == b, "torn snapshot: paired counters diverged"
                store.zrevrange("a", 3)
                store.zscore("b", "m0")
                # two lock takes — a merge may land between them, so the
                # only racing invariant is growth (members never removed)
                assert store.zcard("a") <= len(store.snapshot_counter("a"))
                store.high_water_batch_id
        except BaseException as exc:  # surfaced to the main thread
            errors.append(exc)

    readers = [threading.Thread(target=_reader) for _ in range(4)]
    writer = threading.Thread(target=_writer)
    for t in readers:
        t.start()
    writer.start()
    writer.join(60)
    stop.set()
    for t in readers:
        t.join(10)
    assert not writer.is_alive() and not any(t.is_alive() for t in readers)
    assert not errors, errors[:1]
    expect = {}
    for b in range(n_batches):
        for c in ("a", "b"):
            k = (c, f"m{b % 5}")
            expect[k] = expect.get(k, 0) + 1
    assert store.snapshot() == expect
    assert store.high_water_batch_id == n_batches - 1


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["c1", "c2"]),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c", ""])),
            st.integers(1, 9),
        ),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(0, 8),
)
@settings(max_examples=200, deadline=None)
def test_zrevrange_is_the_deterministic_topk(rows, k):
    """The board read the driver now checks (stream_board_top_users):
    zrevrange(counter, k) must equal the first k of that counter's
    members under (total DESC, member ASC, NULL member last) — the same
    tie-break every ORDER BY..LIMIT in the catalog uses, for ANY
    accumulated state including NULL members and score ties."""
    from logvision_spark.streaming.multiplex import KVCounterStore

    store = KVCounterStore()
    store.merge(
        _FakeDeltas(
            [{"counter": c, "member": m, "delta": d} for c, m, d in rows]
        ),
        0,
    )
    for counter in ("c1", "c2"):
        totals: dict = {}
        for c, m, d in rows:
            if c == counter:
                totals[m] = totals.get(m, 0) + d
        model = sorted(
            totals.items(), key=lambda r: (-r[1], r[0] is None, r[0] or "")
        )[:k]
        assert store.zrevrange(counter, k) == model


def test_zrevrange_all_tied_heavy_path_matches_full_sort():
    """The degenerate board read (r14 verdict optional 6): when ties at
    the k-th value flood the candidate set past 4k, zrevrange switches
    to a bounded name-key heap instead of comparator-sorting all n
    candidates. The selection must stay EXACTLY the full-sort answer —
    same members, same order, NULL last — across the shapes that stress
    the split: all-tied, mixed above/tied, k larger than the board, and
    a NULL member sitting at the threshold."""
    from logvision_spark.streaming.multiplex import KVCounterStore

    # all-tied: 5,000 members at the same total, plus a NULL member
    store = KVCounterStore()
    rows = [
        {"counter": "b", "member": f"m{i:05d}", "delta": 7}
        for i in range(5000)
    ] + [{"counter": "b", "member": None, "delta": 7}]
    store.merge(_FakeDeltas(rows), 0)

    def model(k):
        totals = {r["member"]: r["delta"] for r in rows}
        return sorted(
            totals.items(), key=lambda r: (-r[1], r[0] is None, r[0] or "")
        )[:k]

    for k in (1, 10, 100, 6000):  # 6000 > board size: return everything
        assert store.zrevrange("b", k) == model(k)

    # mixed: a few strictly-above members over a huge tied plateau,
    # where need = k - |above| lands mid-plateau
    store2 = KVCounterStore()
    rows2 = (
        [{"counter": "b", "member": f"top{i}", "delta": 100 + i}
         for i in range(3)]
        + [{"counter": "b", "member": f"t{i:05d}", "delta": 50}
           for i in range(4000)]
        + [{"counter": "b", "member": None, "delta": 50}]
    )
    store2.merge(_FakeDeltas(rows2), 0)
    totals2 = {r["member"]: r["delta"] for r in rows2}
    for k in (3, 4, 10, 64):
        expect = sorted(
            totals2.items(), key=lambda r: (-r[1], r[0] is None, r[0] or "")
        )[:k]
        assert store2.zrevrange("b", k) == expect


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["c1", "c2"]),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c", ""])),
            st.integers(1, 9),
        ),
        min_size=0,
        max_size=30,
    ),
)
@settings(max_examples=200, deadline=None)
def test_snapshot_counter_and_zcard_match_the_flat_snapshot(rows):
    """The per-counter polling reads (flask/app.py:264,425-426 zrange →
    dict; :100-103 zcard): for ANY accumulated state, snapshot_counter(c)
    must equal the c-slice of the flat snapshot() contract and zcard(c)
    its cardinality; an unknown counter reads {} / 0 (Redis missing-key
    semantics, not an error); and the returned dict is a COPY — mutating
    it must not write through to the live store."""
    from logvision_spark.streaming.multiplex import KVCounterStore

    store = KVCounterStore()
    if rows:
        store.merge(
            _FakeDeltas(
                [{"counter": c, "member": m, "delta": d} for c, m, d in rows]
            ),
            0,
        )
    flat = store.snapshot()
    for counter in ("c1", "c2", "missing"):
        sliced = {m: v for (c, m), v in flat.items() if c == counter}
        board = store.snapshot_counter(counter)
        assert board == sliced
        assert store.zcard(counter) == len(sliced)
        board["__poisoned__"] = 10**9
        assert store.snapshot_counter(counter) == sliced  # copy, not view


@given(
    # min_size=0, unlike `delivery`: the no-live-merges history is the
    # case that pins restore()'s guard-open branch (backfill-only state
    # restores with high_water == -1 and backfill still allowed)
    ids=st.lists(st.integers(0, 6), min_size=0, max_size=12).map(sorted),
    shuffle=st.randoms(),
    pre_backfill=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_restore_carries_fence_and_backfill_guard(ids, shuffle, pre_backfill):
    """Restart at the STORE level (r11 verdict item 6): for ANY history —
    optional pre-live backfill, then any delivery-with-replays — a store
    restored from persisted (snapshot, high_water) state must

    1. hold identical totals,
    2. fence every already-applied batch_id as a no-op (exactly-once
       survives the restart under at-least-once redelivery),
    3. refuse an unforced backfill iff the persisted history includes
       live merges (restarting must not reopen the ordering guard;
       force=True still applies),
    4. apply the next UNSEEN batch exactly as the original would —
       original-kept-running and restored-then-resumed end bit-identical.
    """
    from logvision_spark.streaming.multiplex import KVCounterStore

    def deltas_for(b):
        return _FakeDeltas([
            {"counter": "c", "member": f"m{b % 3}", "delta": b + 1},
            {"counter": "totals", "member": "n", "delta": 1},
        ])

    original = KVCounterStore()
    if pre_backfill:
        original.backfill(
            _FakeDeltas([{"counter": "c", "member": "m0", "delta": 100}])
        )
    replayed = list(ids)
    for i in range(1, len(replayed)):
        if shuffle.random() < 0.3:
            replayed.insert(i, shuffle.choice(replayed[:i]))
    for b in replayed:
        original.merge(deltas_for(b), b)

    # the atomic triple (one lock acquisition) and the minimal
    # two-accessor pair must agree whenever no merge is in flight at
    # persistence time — the pair's torn-read caveat needs a mid-collect
    # race, pinned deterministically in
    # test_persist_state_is_atomic_where_the_accessor_pair_tears
    state, hw, live = original.persist_state()
    assert (state, hw) == (original.snapshot(), original.high_water_batch_id)
    assert live == (len(replayed) > 0)
    persisted = (state, hw)
    restored = KVCounterStore.restore(state, hw, live)
    assert restored.snapshot() == KVCounterStore.restore(*persisted).snapshot()

    # 1. identical totals and fence position
    assert restored.snapshot() == persisted[0]
    assert restored.high_water_batch_id == persisted[1]

    # 2. every already-applied id is fenced in the restored store
    for b in set(replayed):
        restored.merge(deltas_for(b), b)
    assert restored.snapshot() == persisted[0]

    # 3. unforced backfill refuses iff live merges happened pre-restart;
    #    force applies either way
    bf = _FakeDeltas([{"counter": "bf", "member": "x", "delta": 1}])
    if replayed:
        with pytest.raises(RuntimeError, match="BEFORE attaching"):
            restored.backfill(bf)
        assert restored.snapshot() == persisted[0]
    else:
        # backfill-only (or empty) history restores with the guard open
        restored.backfill(bf)
        assert restored.snapshot().get(("bf", "x")) == 1
    restored.backfill(bf, force=True)

    # 4. the next unseen batch applies identically in both stores
    nxt = (max(replayed) if replayed else -1) + 1
    original.backfill(bf, force=True)
    if not replayed:  # mirror the unforced branch applied to restored
        original.backfill(bf)
    original.merge(deltas_for(nxt), nxt)
    restored.merge(deltas_for(nxt), nxt)
    assert restored.snapshot() == original.snapshot()
    assert restored.high_water_batch_id == original.high_water_batch_id == nxt


def test_persist_state_is_atomic_where_the_accessor_pair_tears():
    """Why restore() wants persist_state()'s triple, not the two public
    accessors read back-to-back: a merge landing between snapshot() and
    high_water_batch_id yields totals WITHOUT the fence move — restored,
    the redelivered batch is fenced as already-applied and its counts
    are silently lost. Reproduced deterministically by persisting from
    inside the first merge's collect() (fence passed, totals not yet
    applied, high_water still -1): persist_state() captures a coherent
    pre-batch state WITH the live-begun guard raised, so the restored
    store refuses an unforced backfill and replays batch 0 correctly,
    while the naive pair (completed AFTER the merge: stale snapshot,
    fresh high_water) restores a store that loses batch 0 forever
    (review finding)."""
    from logvision_spark.streaming.multiplex import KVCounterStore

    store = KVCounterStore()
    captured = {}

    class _CollectPersists:
        def collect(self):
            # batch 0 mid-flight: live_begun raised, nothing applied yet
            captured["triple"] = store.persist_state()
            captured["stale_snapshot"] = store.snapshot()
            return [{"counter": "c", "member": "m", "delta": 7}]

    store.merge(_CollectPersists(), 0)

    # the triple is coherent: empty totals, fence untouched, guard UP
    state, hw, live = captured["triple"]
    assert (state, hw, live) == ({}, -1, True)
    restored = KVCounterStore.restore(state, hw, live)
    with pytest.raises(RuntimeError, match="BEFORE attaching"):
        restored.backfill(
            _FakeDeltas([{"counter": "c", "member": "dup", "delta": 1}])
        )
    restored.merge(
        _FakeDeltas([{"counter": "c", "member": "m", "delta": 7}]), 0
    )
    assert restored.snapshot() == store.snapshot() == {("c", "m"): 7}
    assert restored.high_water_batch_id == 0

    # the torn pair: snapshot from inside the collect + high_water read
    # after the merge completed — restoring it fences the redelivered
    # batch 0 as a no-op and its counts never arrive
    torn = KVCounterStore.restore(
        captured["stale_snapshot"], store.high_water_batch_id
    )
    torn.merge(
        _FakeDeltas([{"counter": "c", "member": "m", "delta": 7}]), 0
    )
    assert torn.snapshot() == {}  # batch 0 lost — the failure mode pinned


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["totals", "hosts", "ünïcode-board"]),
            st.one_of(
                st.none(),
                st.text(min_size=0, max_size=8),  # includes "" and non-ASCII
            ),
            st.integers(-(10**12), 10**12),
        ),
        min_size=0,
        max_size=20,
    ),
    n_batches=st.integers(0, 3),
)
@settings(max_examples=200, deadline=None)
def test_persist_state_round_trips_through_json_bytes(rows, n_batches):
    """The in-memory restore property feeds persist_state()'s triple
    straight back to restore(); a real deployment writes it to DISK,
    and the triple's flat dict has TUPLE keys — which json.dumps
    rejects outright — so the on-disk shape needs an explicit codec
    (r12 verdict item 5). Pin the shape itself, spelled out inline and
    independent of the store's own persist_state_to/restore_from pair
    (which ships this codec; the sibling property below runs THROUGH
    that pair and a real file): the flat dict as a list
    of [counter, member, value] records (member may be null; JSON
    list→tuple on decode), high_water and live_begun verbatim. A store
    restored from the PARSED bytes must be indistinguishable from one
    restored from the live triple — totals, fence, and backfill guard.
    """
    from logvision_spark.streaming.multiplex import KVCounterStore

    import json as _json

    original = KVCounterStore()
    for b in range(n_batches):
        original.merge(
            _FakeDeltas(
                [{"counter": c, "member": m, "delta": d} for c, m, d in rows]
            ),
            b,
        )

    state, hw, live = original.persist_state()
    # tuple keys are exactly why the codec exists: raw dumps must fail
    with pytest.raises(TypeError):
        _json.dumps(state if state else {("a", "b"): 1})
    payload = _json.dumps(
        {
            "totals": [[c, m, v] for (c, m), v in state.items()],
            "high_water": hw,
            "live_begun": live,
        },
        ensure_ascii=False,
    ).encode("utf-8")

    decoded = _json.loads(payload.decode("utf-8"))
    restored = KVCounterStore.restore(
        {(c, m): v for c, m, v in decoded["totals"]},
        decoded["high_water"],
        decoded["live_begun"],
    )

    assert restored.snapshot() == original.snapshot()
    assert restored.high_water_batch_id == original.high_water_batch_id
    # guard parity: an unforced backfill is accepted/refused identically
    bf_rows = [{"counter": "bf", "member": "x", "delta": 1}]
    if n_batches:
        for s in (original, restored):
            with pytest.raises(RuntimeError, match="BEFORE attaching"):
                s.backfill(_FakeDeltas(bf_rows))
    else:
        original.backfill(_FakeDeltas(bf_rows))
        restored.backfill(_FakeDeltas(bf_rows))
    # next unseen batch applies identically post-round-trip
    original.merge(_FakeDeltas(bf_rows), n_batches)
    restored.merge(_FakeDeltas(bf_rows), n_batches)
    assert restored.snapshot() == original.snapshot()


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["totals", "hosts", "ünïcode-board"]),
            st.one_of(
                st.none(),
                st.text(min_size=0, max_size=8),
            ),
            st.integers(-(10**12), 10**12),
        ),
        min_size=0,
        max_size=20,
    ),
    n_batches=st.integers(0, 3),
)
@settings(max_examples=50, deadline=None)
def test_persist_state_to_round_trips_through_a_real_file(rows, n_batches):
    """``persist_state_to``/``restore_from``: the byte codec the sibling
    property pins, actually WRITTEN to and read back from disk (r13
    verdict optional 5 — closing the gap between "codec tested" and
    "file actually written"). Totals, fence, and backfill guard survive
    the file; the write leaves no ``.tmp`` residue (the os.replace
    crash-safety mechanic); and re-persisting after more merges
    replaces the file so a second restore sees the newer state, not the
    first write."""
    import os as _os
    import tempfile

    from logvision_spark.streaming.multiplex import KVCounterStore

    original = KVCounterStore()
    for b in range(n_batches):
        original.merge(
            _FakeDeltas(
                [{"counter": c, "member": m, "delta": d} for c, m, d in rows]
            ),
            b,
        )

    with tempfile.TemporaryDirectory() as d:
        path = _os.path.join(d, "kv_state.json")
        original.persist_state_to(path)
        assert not _os.path.exists(path + ".tmp")
        restored = KVCounterStore.restore_from(path)

        assert restored.snapshot() == original.snapshot()
        assert restored.high_water_batch_id == original.high_water_batch_id
        # guard parity: an unforced backfill is accepted/refused alike
        bf_rows = [{"counter": "bf", "member": "x", "delta": 1}]
        if n_batches:
            for s in (original, restored):
                with pytest.raises(RuntimeError, match="BEFORE attaching"):
                    s.backfill(_FakeDeltas(bf_rows))
        else:
            original.backfill(_FakeDeltas(bf_rows))
            restored.backfill(_FakeDeltas(bf_rows))
        # fence parity: next unseen batch applies identically
        original.merge(_FakeDeltas(bf_rows), n_batches)
        restored.merge(_FakeDeltas(bf_rows), n_batches)
        assert restored.snapshot() == original.snapshot()

        # overwrite path: persisting the advanced state replaces the
        # file atomically and a fresh restore reflects it
        original.persist_state_to(path)
        again = KVCounterStore.restore_from(path)
        assert again.snapshot() == original.snapshot()
        assert again.high_water_batch_id == original.high_water_batch_id


def test_failed_persist_leaves_previous_file_intact_and_no_residue(
    monkeypatch,
):
    """A persist that dies between the tmp write and the publish (the
    crash window ``os.replace`` exists to close) must leave (a) the
    PREVIOUS state file byte-identical — a restart restores the old
    state, never a torn one — and (b) zero tmp residue in the
    directory: the unique-mkstemp rewrite (r14 ADVICE) unlinks its own
    tmp file on failure instead of abandoning a fixed ``.tmp`` sibling
    that a concurrent writer could have published half-written."""
    import os as _os
    import tempfile

    from logvision_spark.streaming.multiplex import KVCounterStore

    store = KVCounterStore()
    store.merge(
        _FakeDeltas([{"counter": "c", "member": "m", "delta": 7}]), 0
    )
    with tempfile.TemporaryDirectory() as d:
        path = _os.path.join(d, "kv_state.json")
        store.persist_state_to(path)
        before = open(path, "rb").read()

        store.merge(
            _FakeDeltas([{"counter": "c", "member": "m", "delta": 5}]), 1
        )
        real_replace = _os.replace

        def dying_replace(src, dst):
            raise OSError("simulated crash before publish")

        monkeypatch.setattr(_os, "replace", dying_replace)
        with pytest.raises(OSError, match="simulated crash"):
            store.persist_state_to(path)
        monkeypatch.setattr(_os, "replace", real_replace)

        # previous file untouched, restorable, and the directory holds
        # ONLY it — the failed writer's mkstemp file was unlinked
        assert open(path, "rb").read() == before
        assert _os.listdir(d) == ["kv_state.json"]
        old = KVCounterStore.restore_from(path)
        assert old.snapshot() == {("c", "m"): 7}
        assert old.high_water_batch_id == 0

        # the store itself is unharmed: a clean persist now publishes
        # the newer state
        store.persist_state_to(path)
        assert KVCounterStore.restore_from(path).snapshot() == {
            ("c", "m"): 12
        }
        assert _os.listdir(d) == ["kv_state.json"]


def test_persisted_file_mode_follows_umask_and_hard_crash_residue_swept():
    """Two review findings on the r15 mkstemp rewrite: (a) mkstemp
    creates 0600, and os.replace preserves the tmp's mode — without the
    fchmod the published state file silently tightened from
    umask-governed (typically 0644) to owner-only, breaking any
    deployment where a different user (dashboard, backup) reads it;
    (b) an attempt killed HARD between mkstemp and publish cannot
    unlink its own tmp, and unique names would accumulate one file per
    crashed attempt — the explicit boot-time sweep_stale_tmp removes
    them (NOT restore_from: that read path is legal beside live
    persists, where a sweep would unlink a writer's in-flight file —
    the concurrency stress test below pins that usage)."""
    import os as _os
    import stat
    import tempfile

    from logvision_spark.streaming.multiplex import KVCounterStore

    store = KVCounterStore()
    store.merge(
        _FakeDeltas([{"counter": "c", "member": "m", "delta": 1}]), 0
    )
    with tempfile.TemporaryDirectory() as d:
        path = _os.path.join(d, "kv_state.json")
        umask = _os.umask(0o022)
        try:
            store.persist_state_to(path)
        finally:
            _os.umask(umask)
        mode = stat.S_IMODE(_os.stat(path).st_mode)
        assert mode == 0o644, oct(mode)

        # hard-crash residue: orphaned mkstemp siblings (and nothing
        # else) are removed by the explicit boot-time sweep
        for leftover in ("kv_state.json.abc123.tmp",
                         "kv_state.json.zzz999.tmp"):
            open(_os.path.join(d, leftover), "w").write("half-written")
        open(_os.path.join(d, "unrelated.txt"), "w").write("keep me")
        assert KVCounterStore.sweep_stale_tmp(path) == 2
        got = KVCounterStore.restore_from(path)
        assert got.snapshot() == store.snapshot()
        assert sorted(_os.listdir(d)) == ["kv_state.json", "unrelated.txt"]
        assert KVCounterStore.sweep_stale_tmp(path) == 0  # idempotent


def test_concurrent_persists_never_publish_a_torn_file():
    """The interleaving the unique-mkstemp rewrite exists to kill (r14
    ADVICE): with a FIXED sibling tmp name, two concurrent persists to
    the same path share the tmp file — one writer's os.replace can
    publish the other's half-written bytes. Here three writer threads
    persist the same store to the same path in a tight loop while a
    merger thread keeps advancing it, and a reader thread restores
    from the file continuously. Every successful read must decode to a
    COHERENT atomic triple: the store's invariant (one +1 delta per
    batch on the probe member) forces probe_total == high_water + 1 in
    every honestly-captured snapshot, so a torn or interleaved file
    surfaces as either a JSON decode error or a broken equality. The
    ~30k-member payload makes each write long enough that fixed-name
    interleaving would actually be hit."""
    import os as _os
    import tempfile
    import threading

    from logvision_spark.streaming.multiplex import KVCounterStore

    store = KVCounterStore()
    # bulk payload at batch 0 so each persist writes ~1 MB (a wide
    # interleave window), plus the probe member the invariant tracks
    bulk = [
        {"counter": "bulk", "member": f"m{i:05d}", "delta": i + 1}
        for i in range(30_000)
    ] + [{"counter": "probe", "member": "p", "delta": 1}]
    store.merge(_FakeDeltas(bulk), 0)

    stop = threading.Event()
    errors: list[BaseException] = []

    with tempfile.TemporaryDirectory() as d:
        path = _os.path.join(d, "kv_state.json")
        store.persist_state_to(path)  # reader never sees ENOENT

        def merger():
            try:
                b = 1
                while not stop.is_set() and b < 400:
                    store.merge(
                        _FakeDeltas(
                            [{"counter": "probe", "member": "p",
                              "delta": 1}]
                        ),
                        b,
                    )
                    b += 1
            except BaseException as exc:  # pragma: no cover
                errors.append(exc)

        def writer():
            try:
                for _ in range(12):
                    store.persist_state_to(path)
            except BaseException as exc:  # pragma: no cover
                errors.append(exc)

        def reader():
            try:
                while not stop.is_set():
                    got = KVCounterStore.restore_from(path)
                    snap = got.snapshot()
                    assert snap[("probe", "p")] == (
                        got.high_water_batch_id + 1
                    ), "torn state published"
            except BaseException as exc:  # pragma: no cover
                errors.append(exc)

        workers = [threading.Thread(target=merger)] + [
            threading.Thread(target=writer) for _ in range(3)
        ]
        watcher = threading.Thread(target=reader)
        for t in workers + [watcher]:
            t.start()
        for t in workers:
            t.join()
        stop.set()
        watcher.join()
        assert not errors, errors[:3]

        # quiesced: a final persist/restore round-trips exactly, and
        # the directory holds ONLY the published file — every
        # concurrent writer cleaned up its own tmp
        store.persist_state_to(path)
        final = KVCounterStore.restore_from(path)
        assert final.snapshot() == store.snapshot()
        assert final.high_water_batch_id == store.high_water_batch_id
        assert _os.listdir(d) == ["kv_state.json"]


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
