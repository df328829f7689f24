#!/usr/bin/env python
"""REJECTED r19 prototype (r18 verdict item 3, second and FINAL Arrow
attempt — do not revisit): single-pass Arrow shingle+hash via byte
slices of the UTF-8 text + the system libxxhash (canonical XXH64,
bit-identical to Spark's xxhash64 seed 42; differential: 24/24 configs
multiset-equal at sf0.01/sf0.1 + edge docs, experiments/
diff_shingle_arrow_r19.py).

Measured (noop sink, 8 interleaved same-JVM rounds at sf0.1, the
component alone):
    jvm (shipped)       min=0.439 p50=0.529
    jvm + spread        min=0.234 p50=0.265   <- adopted (guide §2.5)
    arrow               min=0.562 p50=0.718
    arrow + spread      min=0.405 p50=0.514
The Arrow body loses to the JVM explode+hash in BOTH parallelism
regimes — to_pylist + the per-shingle Python loop costs more than the
interpreted-HOF concat it replaces — and the real bottleneck was never
the hash: the 594 KB documents parquet scans as ONE partition, so the
whole explode ran single-threaded. The fix that shipped is
dedup._spread_small_input (scale-adaptive round-robin spread, no-op at
scale). This file keeps the rejected operator runnable for the record;
it is NOT part of logvision_spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _xxh64_lib():
    """ctypes handle to the system xxHash library (canonical XXH64).
    Spark's ``xxhash64`` implements the same specification (its XXH64
    is tested against the reference vectors upstream), so
    ``XXH64(utf8_bytes, len, 42)`` reinterpreted as a signed 64-bit int
    is bit-identical to ``F.xxhash64(string_col)`` — pinned by
    experiments/diff_shingle_arrow_r19.py (24/24 configs).
    Raises OSError where no xxhash shared library exists; callers fall
    back to the JVM expression path (correctness never depends on this
    fast path)."""
    import ctypes
    import ctypes.util

    name = ctypes.util.find_library("xxhash") or "libxxhash.so.0"
    lib = ctypes.CDLL(name)
    lib.XXH64.restype = ctypes.c_uint64
    lib.XXH64.argtypes = [
        ctypes.c_void_p,
        ctypes.c_size_t,
        ctypes.c_uint64,
    ]
    return lib


def _shingle_hash_arrow_batches(
    batches, id_col: str, text_col: str, n: int, outer: bool,
    with_chash: bool,
):
    """mapInArrow body for `hashed_shingle_rows`: per-doc distinct
    n-word shingle hashes, the shingle STRINGS never materialized.

    The key identity: ``split(text, ' ')`` tokens joined back with
    single spaces reproduce the original character sequence exactly
    (split keeps empty tokens, concat_ws re-inserts one separator), so
    the n-token shingle string IS the byte slice of the UTF-8 text
    between token boundary offsets — and 0x20 never occurs inside a
    multi-byte UTF-8 sequence, so byte-level boundary search is
    correct for any unicode text. Each distinct slice (per-doc dedup on
    the BYTES, mirroring array_distinct on the strings — not on the
    hash, so even a colliding pair keeps the JVM path's row count) is
    hashed in place via the canonical XXH64 with Spark's seed 42:
    no slice concatenation, no string allocation, one C call per
    shingle."""
    import ctypes

    import numpy as np
    import pyarrow as pa

    lib = _xxh64_lib()
    xxh = lib.XXH64
    fields = [("shingle", pa.int64())]
    if with_chash:
        fields = [("_chash", pa.int64())] + fields
    for batch in batches:
        tbl = pa.Table.from_batches([batch])
        ids = tbl.column(id_col).to_pylist()
        texts = tbl.column(text_col).to_pylist()
        out_ids: list = []
        out_h: list = []
        out_ch: list = []
        for did, t in zip(ids, texts):
            if t is None:
                # split(NULL) -> NULL -> explode emits nothing; the
                # outer form keeps one NULL-shingle row. xxhash64 SKIPS
                # null inputs (the seed, 42, passes through) — mirror it.
                if outer:
                    out_ids.append(did)
                    out_h.append(None)
                    if with_chash:
                        out_ch.append(42)
                continue
            b = t.encode("utf-8")
            base = ctypes.cast(ctypes.c_char_p(b), ctypes.c_void_p).value
            if with_chash:
                ch = xxh(base, len(b), 42)
                ch = ch - (1 << 64) if ch >= (1 << 63) else ch
            arr = np.frombuffer(b, dtype=np.uint8)
            sp = np.flatnonzero(arr == 32)
            # token k spans [starts[k], ends[k]) in byte offsets
            starts = np.concatenate(([0], sp + 1))
            ends = np.concatenate((sp, [len(b)]))
            nt = len(starts)
            if nt < n:
                if outer:
                    out_ids.append(did)
                    out_h.append(None)
                    if with_chash:
                        out_ch.append(ch)
                continue
            seen: set = set()
            seen_add = seen.add
            for s, e in zip(starts[: nt - n + 1].tolist(),
                            ends[n - 1:].tolist()):
                sl = b[s:e]
                if sl in seen:
                    continue
                seen_add(sl)
                h = xxh(base + s, e - s, 42)
                out_ids.append(did)
                out_h.append(h - (1 << 64) if h >= (1 << 63) else h)
                if with_chash:
                    out_ch.append(ch)
        cols = [pa.array(out_ids, type=tbl.column(id_col).type)]
        if with_chash:
            cols.append(pa.array(out_ch, type=pa.int64()))
        cols.append(pa.array(out_h, type=pa.int64()))
        yield pa.RecordBatch.from_arrays(
            cols,
            schema=pa.schema(
                [(id_col, tbl.column(id_col).type)] + fields
            ),
        )


def hashed_shingle_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    outer: bool = False,
    with_chash: bool = False,
) -> DataFrame:
    """(id, xxhash64(shingle)) rows in ONE vectorized Arrow pass — the
    fused formulation of ``exploded_shingles(...)`` + ``F.xxhash64``
    (r19; guide §4.2): the JVM path builds every shingle string through
    an interpreted higher-order ``transform`` (no codegen for HOFs, an
    n-way concat copy per shingle) only to hash and discard it, while
    shingles are byte SLICES of the document's UTF-8 text, hashable in
    place via the system xxHash C library (bit-identical to Spark's
    ``xxhash64``, seed 42 — see `_xxh64_lib`). Only (id, text) crosses
    the Python boundary; per-doc dedup is on the slice bytes, exactly
    ``array_distinct``'s string equality.

    ``outer=True`` mirrors ``explode_outer``: docs with < n tokens (or
    NULL text) keep one NULL-shingle row. ``with_chash=True`` adds a
    ``_chash`` = xxhash64(full text) column computed in the same pass —
    the content-hash carry `minhash_exact_groups` needs, without its
    own scan. Falls back to the JVM expression path when no xxhash
    shared library is loadable DRIVER-side (local mode shares the
    executors' filesystem; on a cluster, ship libxxhash or rely on the
    fallback)."""
    try:
        _xxh64_lib()
    except OSError:
        carry = ("_chash",) if with_chash else ()
        src = df
        if with_chash:
            src = df.select(
                F.col(id_col),
                F.xxhash64(F.col(text_col)).alias("_chash"),
                F.col(text_col),
            )
        from logvision_spark.operators.dedup import exploded_shingles
        sh = exploded_shingles(src, id_col, text_col, n, outer=outer,
                               carry=carry)
        pre = F.when(
            F.col("shingle").isNotNull(), F.xxhash64(F.col("shingle"))
        ).alias("shingle")
        return sh.select(id_col, *carry, pre)

    def body(batches):
        return _shingle_hash_arrow_batches(
            batches, id_col, text_col, n, outer, with_chash
        )

    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, "
        + ("_chash long, " if with_chash else "")
        + "shingle long"
    )
    return df.select(id_col, text_col).mapInArrow(body, schema)


