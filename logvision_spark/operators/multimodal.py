"""Multimodal column plumbing (north-star extension).

Image/audio/video assets are opaque ``binary`` columns plus typed metadata
(schemas.MEDIA_SCHEMA). Heavy per-asset work (decode, resize, feature
extraction, frame sampling) runs as Arrow-batched ``mapInPandas`` /
``mapInArrow`` (the latter zero-copy on both sides for the hot
feature-extraction path). For the fixed-offset header formats the codec
is REAL and zero-dependency (``use_fake=False``): BMP + farbfeld +
binary-netpbm (P5 PGM / P6 PPM) header decode, nearest-neighbor 24-bpp
BMP resize, and integer-exact pixel histograms — all over raw Arrow
buffers, no PIL. Entropy-coded formats (JPEG/PNG) and model-based
feature extraction keep honest ``NotImplementedError`` gates (no
image/audio libraries ship in this container; swapping PIL/ffmpeg in is
a one-function change), and a deterministic fake (``use_fake=True``)
remains for plumbing tests.

Scale notes:
- binary payloads dominate row size → repartition so that
  rows_per_partition × avg_asset_size ≈ 128 MB before any mapInPandas
  (``right_size_partitions``); otherwise one task drags a multi-GB Arrow
  batch.
- metadata-only transforms (filtering by mime/width, joining labels)
  must NOT touch the payload column — column pruning keeps the scan cheap;
  these helpers select narrow schemas explicitly.
- batch bodies are numpy/pandas VECTOR ops (scatter-add histograms,
  np.repeat expansions, C-looped bytes accessors), not per-row Python.
  Measured floor at sf0.1 (5k docs, 1 partition): the parquet scan is
  ~0.17 s and the fixed Arrow/Python-worker round trip ~0.18 s, so
  wall time there reflects per-stage constants, not the batch body —
  the vectorization matters at real asset counts, where the body is
  the only term that scales.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_IMAGE_SCHEMA = (
    "asset_id long, width int, height int, channels int, decode_ok boolean"
)
FRAME_SAMPLE_SCHEMA = "asset_id long, frame_idx int, frame_ts_ms long"

HAVE_CODECS = False  # flipped when real decode libs are wired in


def _sliced_batches(batches, max_rows: int):
    """Re-chunk an Arrow RecordBatch stream so no batch exceeds
    ``max_rows`` rows. Used where an output column's int32 offsets bound
    the per-batch payload (rows × bytes_per_row must stay < 2^31).
    Slices are zero-copy views; downstream buffer arithmetic must (and
    does) honor ``array.offset``."""
    for whole in batches:
        if whole.num_rows <= max_rows:
            yield whole
            continue
        for s in range(0, whole.num_rows, max_rows):
            yield whole.slice(s, max_rows)


def _binary_view(rb, id_col: str = "asset_id", payload_col: str = "payload"):
    """(ids_int64_arrow, offsets_int64, data_uint8) view of a
    RecordBatch's binary column — the ONE implementation of the subtle
    buffer arithmetic every Arrow kernel here needs (honors slice
    offsets via ``pay.offset``, treats nulls as empty payloads, picks
    int32/int64 offsets by binary type). Previously copy-pasted six
    times; the fuzz-found OOB-gather class of bug now has a single
    fix point (review finding)."""
    import numpy as np
    import pyarrow as pa

    n = rb.num_rows
    ids = rb.column(rb.schema.get_field_index(id_col))
    if ids.type != pa.int64():  # mapInArrow does not coerce
        ids = ids.cast(pa.int64())
    pay = rb.column(rb.schema.get_field_index(payload_col))
    if pay.null_count:
        pay = pay.fill_null(b"")
    off_dtype = np.int64 if pa.types.is_large_binary(pay.type) else np.int32
    bufs = pay.buffers()
    offsets = np.frombuffer(
        bufs[1], dtype=off_dtype, count=pay.offset + n + 1
    )[pay.offset :].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return ids, offsets, data


def _parse_bmp_24bpp(b):
    """Validate + parse one uncompressed 24-bpp BMP payload (numpy uint8
    view): returns (w, h, px_off, stride, ah) or None. The ONE header
    contract shared by pixel_histograms and the real resize — the
    vectorized gates in _decode_bmp mirror it (review finding: two
    verbatim copies previously had to stay in lockstep by hand)."""
    if len(b) < 54 or b[0] != 0x42 or b[1] != 0x4D:
        return None
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    px_off = int.from_bytes(b[10:14], "little")
    ah = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if (
        bpp != 24
        or w <= 0
        or h == 0
        or px_off < 54
        or px_off + stride * ah > len(b)
    ):
        return None
    return w, h, px_off, stride, ah


_PNM_WS = frozenset(b" \t\n\r\x0b\x0c")


def _parse_netpbm(b):
    """Validate + parse one binary-netpbm header (P5 = PGM grayscale,
    P6 = PPM RGB): returns (w, h, channels, maxval, raster_off) or None.
    Netpbm headers are ASCII with VARIABLE offsets — magic, then three
    whitespace-separated decimal fields (width, height, maxval), with
    ``#``-to-newline comments allowed wherever whitespace is, then
    exactly ONE whitespace byte before the raster — so unlike the BMP /
    farbfeld fixed-offset gathers this cannot vectorize; callers gate
    vectorized on the 2-byte magic and hand only matching rows here
    (same per-row budget as _parse_bmp_24bpp's use in pixel_histograms).
    Header-decode contract (mirrors the BMP vectorized gate): dims and
    maxval are validated, raster length is not. Accepts ``b`` as bytes
    or a numpy uint8 view."""
    n = len(b)
    if n < 2 or b[0] != 0x50 or int(b[1]) not in (0x35, 0x36):
        return None
    vals: list[int] = []
    i, seen_sep = 2, False
    while i < n and len(vals) < 3:
        c = int(b[i])
        if c in _PNM_WS:
            seen_sep = True
            i += 1
        elif c == 0x23:  # '#': comment runs to end of line, acts as a
            while i < n and int(b[i]) not in (0x0A, 0x0D):  # separator
                i += 1
        elif 0x30 <= c <= 0x39:
            if not seen_sep:
                return None  # token must follow whitespace/comment
            v = 0
            while i < n and 0x30 <= int(b[i]) <= 0x39:
                v = v * 10 + (int(b[i]) - 0x30)
                if v > 0x7FFFFFFF:  # would wrap the int32 output cast
                    return None
                i += 1
            vals.append(v)
            seen_sep = False
        else:
            return None
    if len(vals) < 3 or i >= n or int(b[i]) not in _PNM_WS:
        return None  # exactly one whitespace byte precedes the raster
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not 1 <= maxval <= 65535:
        return None  # maxval > 255 ⇒ 2-byte BE samples (still 1/3 chans)
    return w, h, (3 if int(b[1]) == 0x36 else 1), maxval, i + 1


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real image decode: derives plausible
    dimensions from the payload bytes. Replace with PIL/opencv in prod."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    w = 16 + (payload[0] if len(payload) > 0 else 0) % 64
    h = 16 + (payload[-1] if len(payload) > 0 else 0) % 64
    return w, h, 3


def decode_images(df: DataFrame, use_fake: bool = True) -> DataFrame:
    """Decode image payloads → dimensions. Arrow-batched mapInArrow over
    (asset_id, payload); output is metadata-only (payload dropped — do not
    carry binaries past the decode boundary).

    ``use_fake=False`` runs a REAL zero-dependency codec for three
    header formats: BMP (BITMAPFILEHEADER + BITMAPINFOHEADER — 'BM'
    magic at 0, LE int32 width at 18, LE int32 height at 22 (negative ⇒
    top-down; reported as |height|), LE uint16 bits-per-pixel at 28)
    and farbfeld ("farbfeld" magic, BE uint32 dims at 8/12, always
    16-bit RGBA ⇒ 4 channels) gathered vectorized from the same Arrow
    buffers the fake path uses, plus binary netpbm (P5 PGM ⇒ 1 channel,
    P6 PPM ⇒ 3 channels) whose variable-offset ASCII header cannot
    vectorize: those rows are gated vectorized on the 2-byte magic and
    only the matches take the bounded per-row ``_parse_netpbm`` scan.
    Unrecognized / truncated / unsupported-bpp payloads decode_ok=False
    with NULL dims, same contract as the fake path's empty-payload
    case. Formats that need entropy decode (JPEG/PNG) still require
    PIL/opencv, absent here."""

    def _decode_bmp(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue  # 0-byte offsets buffer: nothing to decode
            ids, offsets, data = _binary_view(rb)
            starts = offsets[:-1]
            lens = np.diff(offsets)
            idx = np.where(lens > 0, starts, 0)

            def _u8(o):
                # clamp: rows failing a length gate gather a dummy
                # in-bounds byte — but the values buffer itself can be
                # SHORTER than one header when every payload in the
                # batch is small, so the clamp must bound the read, not
                # just redirect it (fuzz-found)
                if not len(data):
                    return np.zeros(n, np.int64)
                return data[np.minimum(idx + o, len(data) - 1)].astype(np.int64)

            def _i32le(o):
                u = (_u8(o) | (_u8(o + 1) << 8) | (_u8(o + 2) << 16) | (_u8(o + 3) << 24))
                return u.astype(np.uint32).view(np.int32).astype(np.int64)

            def _u32be(o):
                return (_u8(o) << 24) | (_u8(o + 1) << 16) | (_u8(o + 2) << 8) | _u8(o + 3)

            # BMP: 54 = 14-byte file header + 40-byte BITMAPINFOHEADER
            bmp_w = _i32le(18)
            bmp_h = _i32le(22)
            bpp = _u8(28) | (_u8(29) << 8)
            bmp_ok = (
                (lens >= 54)
                & (_u8(0) == 0x42)
                & (_u8(1) == 0x4D)  # 'BM'
                & (bmp_w > 0)
                & (bmp_h != 0)
                # |height| must survive the int32 output cast: height
                # -2^31 is a valid LE i32 whose abs wraps back negative
                & (np.abs(bmp_h) <= 0x7FFFFFFF)
                & ((bpp == 8) | (bpp == 24) | (bpp == 32))
            )
            # farbfeld: 8-byte magic, BE u32 width at 8, height at 12,
            # always 16-bit RGBA (4 channels)
            ff_magic = np.ones(n, dtype=bool)
            for o, c in enumerate(b"farbfeld"):
                ff_magic &= _u8(o) == c
            ff_w = _u32be(8)
            ff_h = _u32be(12)
            # BE u32 dims above 2^31-1 would wrap in the int32 output
            # cast — reject them as undecodable rather than emit garbage
            ff_ok = (
                (lens >= 16) & ff_magic
                & (ff_w > 0) & (ff_h > 0)
                & (ff_w <= 0x7FFFFFFF) & (ff_h <= 0x7FFFFFFF)
            )

            # netpbm P5/P6: vectorized gate on the 2-byte magic; only
            # matching rows (none in a non-netpbm corpus) pay the
            # per-row ASCII header scan — the same row-gated budget as
            # _parse_bmp_24bpp in pixel_histograms
            pnm_cand = (
                (lens >= 2)
                & (_u8(0) == 0x50)  # 'P'
                & ((_u8(1) == 0x35) | (_u8(1) == 0x36))  # '5' | '6'
            )
            pnm_w = np.zeros(n, np.int64)
            pnm_h = np.zeros(n, np.int64)
            pnm_c = np.zeros(n, np.int64)
            pnm_ok = np.zeros(n, dtype=bool)
            for i in np.nonzero(pnm_cand)[0]:
                parsed = _parse_netpbm(
                    data[starts[i] : starts[i] + lens[i]]
                )
                if parsed is not None:
                    pnm_w[i], pnm_h[i], pnm_c[i] = parsed[:3]
                    pnm_ok[i] = True

            ok = bmp_ok | ff_ok | pnm_ok  # magics differ: disjoint masks
            width = np.where(bmp_ok, bmp_w, np.where(ff_ok, ff_w, pnm_w))
            height = np.where(
                bmp_ok, np.abs(bmp_h), np.where(ff_ok, ff_h, pnm_h)
            )
            channels = np.where(bmp_ok, bpp // 8, np.where(ff_ok, 4, pnm_c))
            mask = ~ok
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(width.astype(np.int32), mask=mask),
                    pa.array(height.astype(np.int32), mask=mask),
                    pa.array(channels.astype(np.int32), mask=mask),
                    pa.array(ok),
                ],
                names=["asset_id", "width", "height", "channels", "decode_ok"],
            )

    def _decode(batches):
        # mapInArrow: length / first byte / last byte come straight from
        # the binary array's (offsets, data) buffers — no per-row object
        # traffic at all; same arithmetic as _fake_decode (kept above as
        # the single-asset reference / real-codec swap point)
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                # a zero-row batch has a 0-byte offsets buffer — nothing
                # to decode, and frombuffer(count=1) would raise
                continue
            ids, offsets, data = _binary_view(rb)
            lens = np.diff(offsets)
            ok = lens > 0
            safe_start = np.where(ok, offsets[:-1], 0)
            safe_end = np.where(ok, offsets[1:] - 1, 0)
            first = data[safe_start] if len(data) else np.zeros(n, np.uint8)
            last = data[safe_end] if len(data) else np.zeros(n, np.uint8)
            mask = ~ok
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array((16 + first % 64).astype(np.int32), mask=mask),
                    pa.array((16 + last % 64).astype(np.int32), mask=mask),
                    pa.array(np.full(n, 3, dtype=np.int32), mask=mask),
                    pa.array(ok),
                ],
                names=["asset_id", "width", "height", "channels", "decode_ok"],
            )

    narrow = df.select("asset_id", "payload")
    return narrow.mapInArrow(
        _decode if use_fake else _decode_bmp, schema=DECODED_IMAGE_SCHEMA
    )


def _le_hex(v, nbytes: int):
    """hex string of ``v`` as ``nbytes`` little-endian bytes (JVM exprs)."""
    parts = [
        F.lpad(F.hex(F.pmod(F.shiftright(v, 8 * i), F.lit(256))), 2, "0")
        for i in range(nbytes)
    ]
    return F.concat(*parts)


def bmp_payload(width, height, pixel_bytes=None):
    """binary Column holding a REAL minimal BMP for the given dims:
    'BM' + 14-byte file header + 40-byte BITMAPINFOHEADER (24 bpp,
    uncompressed), with ``pixel_bytes`` (binary Column) appended as pixel
    data when given. Pure JVM expressions (hex-compose + unhex): lets
    tests and catalog fixtures synthesize decodable images with no media
    library — the exact counterpart of ``decode_images(use_fake=False)``,
    which reads these headers back."""
    header_hex = F.concat(
        F.lit("424D"),  # magic 'BM'
        F.lit("00000000"),  # file size (unchecked by header readers)
        F.lit("00000000"),  # reserved
        F.lit("36000000"),  # pixel-data offset = 54
        F.lit("28000000"),  # BITMAPINFOHEADER size = 40
        _le_hex(width, 4),
        _le_hex(height, 4),
        F.lit("0100"),  # planes = 1
        F.lit("1800"),  # bits per pixel = 24
        F.lit("0" * 48),  # compression/img size/ppm/palette fields
    )
    header = F.unhex(header_hex)
    return header if pixel_bytes is None else F.concat(header, pixel_bytes)


def pnm_payload(width, height, pixel_bytes=None, gray=False):
    """binary Column holding a REAL minimal binary-netpbm image for the
    given dims: ``P6`` (PPM RGB) or ``P5`` (PGM grayscale, ``gray=True``)
    magic + ASCII ``<w> <h>`` + ``255`` maxval, newline-separated, with
    ``pixel_bytes`` (binary Column) appended as the raster when given.
    Pure JVM expressions (string-compose + encode): the ASCII-header
    counterpart of ``bmp_payload``, read back by
    ``decode_images(use_fake=False)`` via ``_parse_netpbm``."""
    header = F.encode(
        F.concat(
            F.lit("P5\n" if gray else "P6\n"),
            width.cast("string"),
            F.lit(" "),
            height.cast("string"),
            F.lit("\n255\n"),
        ),
        "UTF-8",
    )
    return header if pixel_bytes is None else F.concat(header, pixel_bytes)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: emits (asset_id, frame_idx, ts) rows
    from duration metadata — 1:N row expansion through mapInPandas. The
    actual frame extraction is the stubbed codec call; the row-shape
    contract (explode-by-duration) is the part Spark cares about."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # vectorized 1:N expansion: frame counts per asset → np.repeat ids,
        # per-asset frame index via a cumulative-offset subtraction
        import numpy as np

        for pdf in batches:
            dur = pd.to_numeric(pdf["duration_ms"], errors="coerce")
            keep = dur.notna().to_numpy()
            ids = pdf["asset_id"].to_numpy()[keep]
            d = dur.to_numpy(dtype="float64")[keep].astype("int64")
            counts = np.maximum(0, (d + every_ms - 1) // every_ms)
            total = int(counts.sum())
            offsets = np.repeat(np.cumsum(counts) - counts, counts)
            idx = np.arange(total, dtype="int64") - offsets
            yield pd.DataFrame(
                {
                    "asset_id": np.repeat(ids, counts),
                    "frame_idx": idx.astype("int32"),
                    "frame_ts_ms": idx * every_ms,
                }
            )

    return df.select("asset_id", "duration_ms").mapInPandas(
        _sample, schema=FRAME_SAMPLE_SCHEMA
    )


FEATURE_SCHEMA = "asset_id long, feature array<float>"
RESIZE_SCHEMA = "asset_id long, width int, height int, payload binary"


def extract_features(df: DataFrame, dim: int = 64, use_fake: bool = True) -> DataFrame:
    """Feature extraction plumbing: payload → fixed-dim embedding. The
    model call is stubbed with a deterministic byte-histogram projection
    (same payload → same vector); output feeds directly into
    operators/similarity.py (array<float> contract)."""
    if not use_fake and not HAVE_CODECS:
        raise NotImplementedError(
            "real feature extraction needs a vision/audio model runtime; "
            "call with use_fake=True for the plumbing path"
        )

    def _feat(batches):
        # mapInArrow, zero-copy both directions: the payload bytes are
        # read straight out of the Arrow binary array's (offsets, data)
        # buffers — no per-row bytes objects — and the output list<float>
        # column is assembled from the flat histogram matrix with a
        # constant-stride offsets vector — no per-row boxing of numpy
        # rows into an object column (which cost ~40% of this stage's
        # wall time in the mapInPandas form at sf0.1). One bincount does
        # the histogram (buffered — ~2× np.add.at's unbuffered scatter).
        import numpy as np
        import pyarrow as pa

        # output list offsets are int32 ELEMENT indexes: cap rows so
        # n*dim < 2^31 (resize has the byte-side guard; this is the
        # element-side one — review finding: no cap here before)
        for rb in _sliced_batches(batches, max(1, (2**31 - 1) // dim)):
            n = rb.num_rows
            if n == 0:
                continue  # 0-byte offsets buffer: nothing to featurize
            ids, offsets, data = _binary_view(rb)
            data = data[offsets[0] : offsets[-1]]
            lens = np.diff(offsets)
            flat = np.repeat(np.arange(n), lens) * dim + (data % dim)
            hist = np.bincount(flat, minlength=n * dim).reshape(n, dim)
            hist[lens == 0, 0] = 1  # empty payload ≡ b"\x00" histogram
            hist = hist.astype("float32")
            norms = np.linalg.norm(hist, axis=1)
            norms[norms == 0] = 1.0
            feats = hist / norms.astype("float32")[:, None]
            feature = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * dim),
                pa.array(feats.ravel(), type=pa.float32()),
            )
            yield pa.RecordBatch.from_arrays(
                [ids, feature],
                schema=pa.schema(
                    [("asset_id", ids.type), ("feature", pa.list_(pa.float32()))]
                ),
            )

    return df.select("asset_id", "payload").mapInArrow(_feat, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, target_w: int = 32, target_h: int = 32, use_fake: bool = True
) -> DataFrame:
    """Resize plumbing: payload → resized payload + new dims. The fake
    path truncates/pads the byte payload to target_w*target_h (schema
    and batch shape are the real contract).

    ``use_fake=False`` is a REAL zero-dependency resize for 24-bpp
    uncompressed BMP payloads: nearest-neighbor over the actual pixel
    grid (bottom-up rows, 4-byte row padding, BGR order all honored),
    emitting a well-formed BMP of the target size that
    ``decode_images(use_fake=False)`` round-trips. Source dims vary per
    asset, so the gather index is built per row — but each row's resize
    is one vectorized numpy fancy-index over target_h×target_w pixels,
    which is the same work profile a PIL call would have at this
    boundary. Non-BMP / non-24-bpp payloads yield a NULL payload row
    (resize_ok semantics via width/height NULLs), mirroring the decode
    contract. JPEG/PNG still need PIL."""
    if not use_fake:
        return _resize_bmp_real(df, target_w, target_h)

    n_bytes = target_w * target_h
    if n_bytes > 2**31 - 1:
        # one output row alone would overflow the int32 offsets vector;
        # the old max(1, …//n_bytes) clamp silently "allowed" it
        raise ValueError(
            f"target {target_w}x{target_h} = {n_bytes} bytes/row exceeds "
            "the int32 Arrow offset range; use a smaller target"
        )

    def _resize(batches):
        # mapInArrow truncate-or-pad, zero-copy both directions: input
        # bytes are gathered straight from the binary array's buffers
        # into one zero-initialized (rows × n_bytes) matrix; the output
        # binary column is rebuilt from that matrix's flat buffer with
        # constant-stride offsets. Resize is the payload-OUT op, so the
        # per-row bytes-object materialization the pandas form paid on
        # emit was its dominant row-scaling cost.
        import numpy as np
        import pyarrow as pa

        # Output offsets are int32 (pa.binary()): cap rows per emitted
        # batch so n * n_bytes can never overflow 2^31 into negative
        # offsets (silent corruption). int64 math for the bound itself.
        max_rows = max(1, int((2**31 - 1) // max(1, n_bytes)))

        for rb in _sliced_batches(batches, max_rows):
            n = rb.num_rows
            if n == 0:
                continue  # 0-byte offsets buffer: nothing to resize
            ids, offsets, data = _binary_view(rb)
            starts = offsets[:-1]
            eff = np.minimum(np.diff(offsets), n_bytes)
            mat = np.zeros((n, n_bytes), dtype=np.uint8)
            total = int(eff.sum())
            if total:
                row_of = np.repeat(np.arange(n), eff)
                prefix = np.concatenate(([0], np.cumsum(eff[:-1])))
                intra = np.arange(total) - np.repeat(prefix, eff)
                mat[row_of, intra] = data[np.repeat(starts, eff) + intra]
            payload = pa.Array.from_buffers(
                pa.binary(),
                n,
                [
                    None,
                    pa.py_buffer(
                        (np.arange(n + 1, dtype=np.int32) * n_bytes).tobytes()
                    ),
                    pa.py_buffer(mat.tobytes()),
                ],
            )
            const = np.full(n, 0, dtype=np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(const + target_w),
                    pa.array(const + target_h),
                    payload,
                ],
                names=["asset_id", "width", "height", "payload"],
            )

    return df.select("asset_id", "payload").mapInArrow(_resize, schema=RESIZE_SCHEMA)


PIXEL_HIST_SCHEMA = "asset_id long, bucket int, cnt long"


def pixel_histograms(df: DataFrame, dim: int = 64) -> DataFrame:
    """REAL pixel-level feature primitive, zero dependencies: for 24-bpp
    uncompressed BMP payloads, the intensity histogram over the ACTUAL
    pixel bytes — header and row padding excluded, top-down/bottom-up
    irrelevant to a histogram — as sparse integer rows
    ``(asset_id, bucket, cnt)`` with bucket = intensity*dim/256.
    Integer-exact cross-engine (the driver oracle rebuilds the same
    counts), which is why this primitive exists alongside
    ``extract_features``' normalized float embedding: counts hash
    bit-for-bit, norms don't. Non-BMP payloads emit no rows."""

    def _kernel(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids_arrow, offsets, data = _binary_view(rb)
            ids = ids_arrow.to_numpy(zero_copy_only=False)
            out_ids, out_buckets, out_cnts = [], [], []
            for i in range(n):
                b = data[offsets[i] : offsets[i + 1]]
                hdr = _parse_bmp_24bpp(b)
                if hdr is None:
                    continue
                w, h, px_off, stride, ah = hdr
                area = b[px_off : px_off + stride * ah].reshape(ah, stride)
                px = area[:, : w * 3].ravel().astype(np.int64)
                hist = np.bincount(px * dim // 256, minlength=dim)
                nz = np.nonzero(hist)[0]
                out_ids.append(np.full(len(nz), ids[i], dtype=np.int64))
                out_buckets.append(nz.astype(np.int32))
                out_cnts.append(hist[nz].astype(np.int64))
            if not out_ids:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_ids)),
                    pa.array(np.concatenate(out_buckets)),
                    pa.array(np.concatenate(out_cnts)),
                ],
                names=["asset_id", "bucket", "cnt"],
            )

    return df.select("asset_id", "payload").mapInArrow(
        _kernel, schema=PIXEL_HIST_SCHEMA
    )


def _resize_bmp_real(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Real nearest-neighbor resize of 24-bpp uncompressed BMP payloads
    (see resize_images(use_fake=False)). Per-row gather is unavoidable
    (source dims differ per asset); each row is one vectorized numpy
    fancy-index. Output BMPs are bottom-up 24-bpp with standard 4-byte
    row padding and round-trip through decode_images(use_fake=False)."""
    out_stride = (target_w * 3 + 3) // 4 * 4
    out_total = 54 + target_h * out_stride
    if out_total > 2**31 - 1:
        raise ValueError(
            f"target {target_w}x{target_h} BMP = {out_total} bytes/row "
            "exceeds the int32 Arrow offset range; use a smaller target"
        )

    def _kernel(batches):
        import struct

        import numpy as np
        import pyarrow as pa

        header_prefix = b"BM" + struct.pack("<IHHI", 0, 0, 0, 54)

        def _out_header():
            return header_prefix + struct.pack(
                "<IiiHHIIIIII", 40, target_w, target_h, 1, 24, 0, 0, 0, 0, 0, 0
            )

        max_rows = max(1, min(65536, (2**31 - 1) // max(1, out_total)))
        for rb in _sliced_batches(batches, max_rows):
            n = rb.num_rows
            if n == 0:
                continue
            ids, offsets, data = _binary_view(rb)
            ty = np.arange(target_h)
            tx3 = np.arange(target_w) * 3
            ch = np.arange(3)
            payloads: list[bytes | None] = []
            for i in range(n):
                b = data[offsets[i] : offsets[i + 1]]
                hdr = _parse_bmp_24bpp(b)
                if hdr is None:
                    payloads.append(None)
                    continue
                w, h, px_off, stride, ah = hdr
                # image-space row of each output row (output is stored
                # bottom-up), mapped into the source's storage order
                out_img_row = target_h - 1 - ty
                src_img_row = (out_img_row * ah) // target_h
                src_store_row = (ah - 1 - src_img_row) if h > 0 else src_img_row
                src_x = (tx3 // 3 * w) // target_w * 3
                idx = (
                    px_off
                    + src_store_row[:, None, None] * stride
                    + src_x[None, :, None]
                    + ch[None, None, :]
                )
                out_img = np.zeros((target_h, out_stride), dtype=np.uint8)
                out_img[:, : target_w * 3] = b[idx].reshape(target_h, target_w * 3)
                payloads.append(_out_header() + out_img.tobytes())
            ok = np.array([p is not None for p in payloads])
            mask = ~ok
            const = np.full(n, 0, dtype=np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(const + target_w, mask=mask),
                    pa.array(const + target_h, mask=mask),
                    pa.array(payloads, type=pa.binary()),
                ],
                names=["asset_id", "width", "height", "payload"],
            )

    return df.select("asset_id", "payload").mapInArrow(
        _kernel, schema=RESIZE_SCHEMA
    )


def right_size_partitions(
    df: DataFrame,
    avg_asset_bytes: int,
    target_partition_bytes: int = 128 << 20,
    n_rows: int | None = None,
) -> DataFrame:
    """Repartition so Arrow batches through mapInPandas stay ~target-sized.
    Call before any payload-carrying pandas stage.

    Row count comes from (in order): the caller (`n_rows`, free when the
    pipeline already knows it), Catalyst's plan statistics (row count if
    available, else sizeInBytes / avg — no extra scan either way). A
    payload-bearing table is exactly the table you don't want to scan
    twice just to count."""
    rows_per_part = max(1, target_partition_bytes // max(1, avg_asset_bytes))
    if n_rows is None:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        if stats.rowCount().isDefined():
            n_rows = int(str(stats.rowCount().get()))
        else:
            # sizeInBytes is Catalyst's (possibly compressed-source)
            # estimate — conservative rounding up keeps batches under
            # target even when it underestimates
            n_rows = max(1, int(str(stats.sizeInBytes())) // max(1, avg_asset_bytes))
    num_parts = max(1, (n_rows + rows_per_part - 1) // rows_per_part)
    # cap: sizeInBytes can wildly overestimate (e.g. in-memory relations);
    # 1M partitions is already beyond any sane single-table fan-out
    return df.repartition(min(num_parts, 1 << 20))


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests (no media libs in the
    container): payload = seeded pseudo-random bytes."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randint(64, 512)))
        dur = rng.randint(1000, 10000) if kind != "image" else None
        rows.append((i, kind, payload, f"{kind}/x-fake", None, None, dur))
    from logvision_spark.schemas import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def pack_assets_by_bytes(
    df: DataFrame,
    id_col: str = "asset_id",
    weight_col: str = "n_bytes",
    budget: int = 4096,
    num_shards: int = 8,
) -> DataFrame:
    """Assign opaque assets to byte-budget bins — the partition-sizing
    step for payload-bearing tables (`right_size_partitions`' static
    sibling): within pmod(id, shards) shards, assets are taken in id
    order and bin = floor(exclusive_prefix_sum(bytes) / budget), so each
    bin holds ~budget bytes and a downstream repartition("shard","bin")
    gives mapInPandas batches a bounded memory footprint. Same
    per-shard-window shape as text.pack_token_bins: never a global
    ordered window."""
    from pyspark.sql import Window

    staged = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("_w"),
        F.pmod(F.col(id_col), F.lit(num_shards)).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("_w").over(w), F.lit(0))
    return staged.select(
        id_col,
        "shard",
        F.col("_w").alias(weight_col),
        F.floor(prior / F.lit(budget)).cast("long").alias("bin_in_shard"),
    )
