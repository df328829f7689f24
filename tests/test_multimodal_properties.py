"""Property tests for the zero-copy mapInArrow multimodal paths: random
payload tables (including nulls, empties, and >target sizes) must agree
byte-for-byte with straightforward per-row Python references — the
buffer-offset arithmetic (gathers, prefix sums, masked scatters) is
exactly the code a row loop can't get wrong, so the references pin it.
"""

from __future__ import annotations

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logvision_spark.operators.multimodal import (
    decode_images,
    extract_features,
    resize_images,
)

payloads = st.lists(
    st.one_of(st.none(), st.binary(min_size=0, max_size=80)),
    min_size=1,
    max_size=24,
)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _media(spark, items):
    return spark.createDataFrame(
        list(enumerate(items)), "asset_id long, payload binary"
    )


def _ref_feature(p: bytes | None, dim: int) -> list[float]:
    b = p if p else b"\x00"
    hist = [0.0] * dim
    for byte in b:
        hist[byte % dim] += 1.0
    norm = math.sqrt(sum(v * v for v in hist)) or 1.0
    return [v / norm for v in hist]


@given(payloads)
@SET
def test_extract_features_matches_per_row_reference(spark, items):
    rows = {r["asset_id"]: r["feature"] for r in extract_features(_media(spark, items), dim=16).collect()}
    assert set(rows) == set(range(len(items)))
    for i, p in enumerate(items):
        expect = _ref_feature(p, 16)
        assert all(
            abs(a - b) < 1e-6 for a, b in zip(rows[i], expect)
        ), f"payload {p!r}: {rows[i]} != {expect}"


@given(payloads, st.integers(min_value=1, max_value=6), st.integers(min_value=1, max_value=6))
@SET
def test_resize_matches_per_row_reference(spark, items, w, h):
    n_bytes = w * h
    rows = {r["asset_id"]: r for r in resize_images(_media(spark, items), w, h).collect()}
    for i, p in enumerate(items):
        expect = (p or b"")[:n_bytes].ljust(n_bytes, b"\x00")
        r = rows[i]
        assert r["payload"] == expect, f"payload {p!r}"
        assert r["width"] == w and r["height"] == h


@given(payloads)
@SET
def test_decode_matches_per_row_reference(spark, items):
    rows = {r["asset_id"]: r for r in decode_images(_media(spark, items)).collect()}
    for i, p in enumerate(items):
        r = rows[i]
        if p:
            assert r["decode_ok"]
            assert r["width"] == 16 + p[0] % 64
            assert r["height"] == 16 + p[-1] % 64
            assert r["channels"] == 3
        else:  # null or empty payload
            assert not r["decode_ok"]
            assert r["width"] is None and r["height"] is None and r["channels"] is None


def test_kernels_tolerate_empty_input(spark):
    """Zero-row input (⇒ possibly a 0-byte Arrow offsets buffer) must not
    raise in any mapInArrow kernel — frombuffer(count=1) on an empty
    buffer would. Regression for the n==0 guard."""
    empty = _media(spark, []).where("asset_id IS NOT NULL")
    assert empty.count() == 0
    assert extract_features(empty, dim=8).count() == 0
    assert resize_images(empty, 4, 4).count() == 0
    assert decode_images(empty).count() == 0


def test_sliced_batches_rechunks_and_preserves_rows():
    """resize's int32-offset guard re-chunks via _sliced_batches: slices
    must cover every row exactly once and stay zero-copy views (nonzero
    array offset), which the kernels' buffer math must honor."""
    import pyarrow as pa

    from logvision_spark.operators.multimodal import _sliced_batches

    rb = pa.RecordBatch.from_pydict(
        {"asset_id": list(range(10)), "payload": [bytes([i]) * i for i in range(10)]},
        schema=pa.schema([("asset_id", pa.int64()), ("payload", pa.binary())]),
    )
    out = list(_sliced_batches(iter([rb]), 3))
    assert [b.num_rows for b in out] == [3, 3, 3, 1]
    assert [b.column(1).offset for b in out] == [0, 3, 6, 9]
    got = [v.as_py() for b in out for v in b.column(1)]
    assert got == [bytes([i]) * i for i in range(10)]
    # small batches pass through untouched
    assert list(_sliced_batches(iter([rb]), 100)) == [rb]


def test_resize_respects_small_output_chunks(spark):
    """Drive resize through batches larger than the int32-offset row cap
    by shrinking Arrow batch size indirectly: with maxRecordsPerBatch=4
    and 10 rows the kernel sees multiple batches AND sliced views; the
    output must still be row-exact."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        items = [bytes([i]) * (i + 1) for i in range(10)]
        rows = {
            r["asset_id"]: r["payload"]
            for r in resize_images(_media(spark, items).coalesce(1), 3, 1).collect()
        }
        for i, p in enumerate(items):
            assert rows[i] == p[:3].ljust(3, b"\x00"), i
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
        else:
            # leaving "4" behind would shrink Arrow batches for every
            # later test in the session-scoped fixture
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def _ref_bmp(w: int, h: int, bpp: int = 24, pixels: bytes = b"") -> bytes:
    import struct

    return (
        b"BM" + struct.pack("<IHHI", 0, 0, 0, 54)
        + struct.pack("<IiiHHIIIIII", 40, w, h, 1, bpp, 0, 0, 0, 0, 0, 0)
        + pixels
    )


def test_bmp_decode_matches_struct_reference(spark):
    """decode_images(use_fake=False) must parse real BMP headers exactly:
    positive and negative (top-down) heights, all supported bpps, and
    reject truncated / non-BMP / odd-bpp payloads with NULL dims."""
    cases = [
        (0, _ref_bmp(17, 23), (17, 23, 3, True)),
        (1, _ref_bmp(640, 480, 32), (640, 480, 4, True)),
        (2, _ref_bmp(5, -9, 8), (5, 9, 1, True)),          # top-down
        (3, _ref_bmp(70000, 3), (70000, 3, 3, True)),      # >2-byte dim
        (4, _ref_bmp(12, 34, 16), (None, None, None, False)),  # bpp 16
        (5, _ref_bmp(0, 10), (None, None, None, False)),   # zero width
        (6, _ref_bmp(10, 20)[:40], (None, None, None, False)),  # truncated
        (7, b"not a bitmap at all, just some text padding!!" * 3,
         (None, None, None, False)),
        # height INT32_MIN: abs() wraps back negative in int32 — must be
        # rejected (r4 ADVICE); INT32_MIN+1 is the valid extreme
        (11, _ref_bmp(5, -(2**31)), (None, None, None, False)),
        (12, _ref_bmp(5, -(2**31 - 1)), (5, 2**31 - 1, 3, True)),
        (8, None, (None, None, None, False)),
        (9, _ref_bmp(3, 4, 24, b"\x01\x02\x03" * 12), (3, 4, 3, True)),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in cases], "asset_id long, payload binary"
    )
    got = {r["asset_id"]: r for r in decode_images(df, use_fake=False).collect()}
    for i, _, (w, h, c, ok) in cases:
        r = got[i]
        assert (r["width"], r["height"], r["channels"], r["decode_ok"]) == (
            w, h, c, ok,
        ), f"case {i}: {r}"


def test_bmp_payload_roundtrips_through_real_decoder(spark):
    """bmp_payload (JVM hex-compose) and the buffer-level decoder must be
    exact inverses, and the bytes must equal the struct.pack reference."""
    from pyspark.sql import functions as F

    from logvision_spark.operators.multimodal import bmp_payload

    df = spark.createDataFrame(
        [(i, 16 + i * 37, 16 + i * 91) for i in range(8)],
        "asset_id long, w int, h int",
    )
    built = df.select(
        "asset_id", "w", "h",
        bmp_payload(F.col("w"), F.col("h"), F.lit(b"\x00\x01\x02")).alias("payload"),
    )
    for r in built.collect():
        assert bytes(r["payload"]) == _ref_bmp(r["w"], r["h"], 24, b"\x00\x01\x02")
    got = {r["asset_id"]: r for r in decode_images(built, use_fake=False).collect()}
    for r in df.collect():
        d = got[r["asset_id"]]
        assert (d["width"], d["height"], d["decode_ok"]) == (r["w"], r["h"], True)


# Independent binary-netpbm header reference: ONE regex over the whole
# header in a deliberately different implementation style from the
# char-walk in multimodal._parse_netpbm, so a tokenizer bug cannot pass
# both sides (r17 ADVICE: the fuzz test's netpbm branch called the
# implementation itself — tautological for that format). Contract it
# encodes, matching the implementation's documented strictness:
#   * magic P5/P6, then three decimal fields, each PRECEDED by a
#     separator run of whitespace and/or '#'-to-end-of-line comments;
#   * after the maxval digits, exactly ONE whitespace byte (no comment
#     run there — the strict plain-netpbm reading; pinned below by
#     test_netpbm_comment_after_maxval_is_rejected_by_contract);
#   * dims 1..2^31-1, maxval 1..65535 (range-checked after the match).
# the (?![^\n\r]) lookahead pins every comment at end-of-line/input:
# without it, regex backtracking can end a comment mid-line and
# resurrect digits inside the comment text as header tokens — the
# first thing the differential fuzz below caught (b"P5 8#c8 8\nxxx"
# parsed as h=8 from INSIDE the comment while the production
# char-walk, which always scans comments to the newline, rejects)
_PNM_SEP = rb"(?:[ \t\n\r\x0b\x0c]|#[^\n\r]*(?![^\n\r]))+"
_PNM_HEAD_RE = re.compile(
    rb"P([56])" + _PNM_SEP + rb"([0-9]+)" + _PNM_SEP + rb"([0-9]+)"
    + _PNM_SEP + rb"([0-9]+)[ \t\n\r\x0b\x0c]"
)


def _ref_parse_netpbm(b) -> tuple[int, int, int, int, int] | None:
    m = _PNM_HEAD_RE.match(bytes(b))
    if m is None:
        return None
    w, h, maxval = (int(m.group(i)) for i in (2, 3, 4))
    if not (1 <= w <= 2**31 - 1 and 1 <= h <= 2**31 - 1
            and 1 <= maxval <= 65535):
        return None
    return w, h, (3 if m.group(1) == b"6" else 1), maxval, m.end()


@given(st.lists(st.one_of(st.none(), st.binary(min_size=0, max_size=120)),
                min_size=1, max_size=16))
@SET
def test_bmp_decoder_never_crashes_on_arbitrary_bytes(spark, items):
    """Fuzz: the real decoder is exposed to untrusted payload bytes; any
    input must produce a row (ok or not), never an exception, and
    decode_ok=True only for payloads carrying one of the three accepted
    magics with a header long enough to validate (BM + 54 bytes,
    farbfeld + 16 bytes, or a P5/P6 netpbm header _ref_parse_netpbm —
    the regex re-implementation above, NOT the production tokenizer —
    also accepts)."""
    df = spark.createDataFrame(
        list(enumerate(items)), "asset_id long, payload binary"
    )
    rows = {r["asset_id"]: r for r in decode_images(df, use_fake=False).collect()}
    assert set(rows) == set(range(len(items)))
    for i, p in enumerate(items):
        r = rows[i]
        if r["decode_ok"]:
            assert p is not None
            assert (
                (len(p) >= 54 and p[:2] == b"BM")
                or (len(p) >= 16 and p[:8] == b"farbfeld")
                or (p[:1] == b"P" and _ref_parse_netpbm(p) is not None)
            )
            assert r["width"] > 0 and r["height"] > 0
        else:
            assert r["width"] is None and r["channels"] is None


def _ref_bmp_pixels(w: int, h: int, seed: int = 0) -> tuple[bytes, "object"]:
    """A real padded 24-bpp BMP with a deterministic pixel pattern;
    returns (payload, image) where image[y][x] = (b, g, r) in IMAGE space
    (row 0 = top)."""
    import numpy as np

    img = (
        (np.arange(h)[:, None, None] * 7 + np.arange(w)[None, :, None] * 13
         + np.arange(3)[None, None, :] * 29 + seed) % 256
    ).astype(np.uint8)
    stride = (w * 3 + 3) // 4 * 4
    area = np.zeros((h, stride), dtype=np.uint8)
    area[:, : w * 3] = img[::-1].reshape(h, w * 3)  # bottom-up storage
    return _ref_bmp(w, h, 24, area.tobytes()), img


def test_real_bmp_resize_is_nearest_neighbor_exact(spark):
    """resize_images(use_fake=False) must equal an independent numpy
    nearest-neighbor reference pixel-for-pixel, across non-multiple-of-4
    widths (row padding), upscales and downscales."""
    import numpy as np

    from logvision_spark.operators.multimodal import resize_images

    cases = [(0, 7, 5), (1, 16, 16), (2, 3, 9), (3, 10, 2)]
    payloads, imgs = {}, {}
    for i, w, h in cases:
        payloads[i], imgs[i] = _ref_bmp_pixels(w, h, seed=i)
    tw, th = 6, 4
    df = spark.createDataFrame(
        [(i, payloads[i]) for i, _, _ in cases], "asset_id long, payload binary"
    )
    got = {r["asset_id"]: r for r in resize_images(df, tw, th, use_fake=False).collect()}
    out_stride = (tw * 3 + 3) // 4 * 4
    for i, w, h in cases:
        r = got[i]
        assert (r["width"], r["height"]) == (tw, th)
        p = bytes(r["payload"])
        assert len(p) == 54 + th * out_stride and p[:2] == b"BM"
        # reference: image-space nearest neighbor
        src = imgs[i]
        ys = (np.arange(th) * h) // th
        xs = (np.arange(tw) * w) // tw
        expect = src[ys][:, xs]  # (th, tw, 3) image space
        area = np.frombuffer(p[54:], dtype=np.uint8).reshape(th, out_stride)
        out_img = area[:, : tw * 3].reshape(th, tw, 3)[::-1]  # bottom-up → image
        assert np.array_equal(out_img, expect), f"case {i}"


def test_real_bmp_resize_roundtrips_and_handles_topdown(spark):
    """Resized output must re-decode with the real decoder at the target
    dims, and a top-down (negative height) source must produce the same
    image as its bottom-up twin."""
    import numpy as np
    import struct

    from logvision_spark.operators.multimodal import resize_images

    up, img = _ref_bmp_pixels(5, 3, seed=9)
    # top-down twin: negate height, store rows in image order
    stride = (5 * 3 + 3) // 4 * 4
    area = np.zeros((3, stride), dtype=np.uint8)
    area[:, : 5 * 3] = img.reshape(3, 5 * 3)
    down = _ref_bmp(5, -3, 24, area.tobytes())
    df = spark.createDataFrame(
        [(0, up), (1, down)], "asset_id long, payload binary"
    )
    out = resize_images(df, 4, 4, use_fake=False)
    rows = {r["asset_id"]: bytes(r["payload"]) for r in out.collect()}
    assert rows[0] == rows[1]  # same image, either storage order
    redecoded = {r["asset_id"]: r for r in decode_images(out, use_fake=False).collect()}
    for i in (0, 1):
        r = redecoded[i]
        assert r["decode_ok"] and (r["width"], r["height"]) == (4, 4)


def test_pixel_histograms_exclude_header_and_padding(spark):
    """pixel_histograms must count ONLY true pixel bytes: the 54-byte
    header and the per-row 4-byte padding (which hold arbitrary values)
    never reach the histogram; non-BMP payloads emit no rows."""
    import numpy as np

    from logvision_spark.operators.multimodal import pixel_histograms

    w, h = 3, 2                  # stride 12, 3 pad bytes per row
    img = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3) * 10
    stride = (w * 3 + 3) // 4 * 4
    area = np.full((h, stride), 255, dtype=np.uint8)  # padding = 0xFF
    area[:, : w * 3] = img[::-1].reshape(h, w * 3)
    bmp = _ref_bmp(w, h, 24, area.tobytes())
    df = spark.createDataFrame(
        [(0, bmp), (1, b"junk" * 40)], "asset_id long, payload binary"
    )
    rows = pixel_histograms(df, dim=64).collect()
    assert {r["asset_id"] for r in rows} == {0}
    got = {r["bucket"]: r["cnt"] for r in rows}
    expect: dict[int, int] = {}
    for v in img.ravel():
        b = int(v) * 64 // 256
        expect[b] = expect.get(b, 0) + 1
    assert got == expect          # 0xFF padding (bucket 63) never counted


def test_farbfeld_decode_matches_struct_reference(spark):
    """The real decoder must also read farbfeld headers: 8-byte magic,
    big-endian u32 dims, fixed 4 channels — and reject truncated or
    wrong-magic variants."""
    import struct

    def ff(w, h, extra=b""):
        return b"farbfeld" + struct.pack(">II", w, h) + extra

    cases = [
        (0, ff(17, 23), (17, 23, 4, True)),
        (1, ff(1, 1, b"\x00" * 8), (1, 1, 4, True)),
        (2, ff(70000, 3), (70000, 3, 4, True)),
        (3, ff(0, 5), (None, None, None, False)),       # zero width
        (4, ff(5, 5)[:12], (None, None, None, False)),  # truncated
        (5, b"farbfelt" + b"\x00" * 8, (None, None, None, False)),  # bad magic
        (6, _ref_bmp(6, 7), (6, 7, 3, True)),           # BMP still works
        # u32 dims past int32 range must be rejected, not wrapped (r4
        # ADVICE: they used to emit decode_ok=True with negative dims)
        (7, ff(0x80000000, 3), (None, None, None, False)),
        (8, ff(3, 0xFFFFFFFF), (None, None, None, False)),
        (9, ff(0x7FFFFFFF, 2), (0x7FFFFFFF, 2, 4, True)),  # boundary ok
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in cases], "asset_id long, payload binary"
    )
    got = {r["asset_id"]: r for r in decode_images(df, use_fake=False).collect()}
    for i, _, (w, h, c, ok) in cases:
        r = got[i]
        assert (r["width"], r["height"], r["channels"], r["decode_ok"]) == (
            w, h, c, ok,
        ), f"case {i}: {r}"


def test_netpbm_decode_matches_reference(spark):
    """The real decoder must also read binary netpbm headers: P6 (PPM,
    3 channels) and P5 (PGM, 1 channel) with whitespace-separated ASCII
    dims, '#' comments, and a maxval gate — and reject malformed
    variants (no separator after magic, zero dims, maxval out of range,
    missing raster separator, ASCII P3, int32-wrapping dims)."""
    cases = [
        (0, b"P6\n17 23\n255\n" + b"x" * (17 * 23 * 3), (17, 23, 3, True)),
        (1, b"P5\n4 5\n255\n" + b"x" * 20, (4, 5, 1, True)),
        (2, b"P6 640 480 255 ", (640, 480, 3, True)),  # all-space form
        (3, b"P6\n# a comment\n8 9\n255\n", (8, 9, 3, True)),
        (4, b"P6\n8 9\n65535\n", (8, 9, 3, True)),   # 2-byte samples
        (5, b"P68 9 255 ", (None, None, None, False)),  # no sep after magic
        (6, b"P6\n0 9\n255\n", (None, None, None, False)),   # zero width
        (7, b"P6\n8 9\n65536\n", (None, None, None, False)),  # maxval gate
        (8, b"P6\n8 9\n255", (None, None, None, False)),  # no raster sep
        (9, b"P3\n8 9\n255\n", (None, None, None, False)),  # ASCII PPM
        (10, b"P6\n2147483648 1\n255\n ", (None, None, None, False)),
        (11, b"P6\n2147483647 1\n255\n ", (2147483647, 1, 3, True)),
        (12, _ref_bmp(6, 7), (6, 7, 3, True)),  # BMP still works beside it
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in cases], "asset_id long, payload binary"
    )
    got = {r["asset_id"]: r for r in decode_images(df, use_fake=False).collect()}
    for i, _, (w, h, c, ok) in cases:
        r = got[i]
        assert (r["width"], r["height"], r["channels"], r["decode_ok"]) == (
            w, h, c, ok,
        ), f"case {i}: {r}"


@given(
    gray=st.booleans(),
    w=st.integers(min_value=1, max_value=2**31 - 1),
    h=st.integers(min_value=1, max_value=2**31 - 1),
    maxval=st.integers(min_value=1, max_value=65535),
    seps=st.lists(
        st.text(alphabet=" \t\n\r\x0b\x0c", min_size=1, max_size=3),
        min_size=3, max_size=3,
    ),
    comment=st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                codec="ascii", exclude_characters="\n\r"
            ),
            max_size=12,
        ),
    ),
)
@settings(max_examples=200, deadline=None)
def test_parse_netpbm_accepts_any_legal_header(
    gray, w, h, maxval, seps, comment
):
    """Pure-Python property: every legal binary-netpbm header — any
    whitespace runs between fields, an optional '#' comment after the
    magic — parses to exactly its (w, h, channels, maxval), and the
    reported raster offset points one byte past the single whitespace
    separator. No Spark in the loop: this pins the tokenizer itself."""
    from logvision_spark.operators.multimodal import _parse_netpbm

    magic = b"P5" if gray else b"P6"
    head = magic
    if comment is not None:
        head += b"#" + comment.encode("ascii") + b"\n"
    head += seps[0].encode() + str(w).encode()
    head += seps[1].encode() + str(h).encode()
    head += seps[2].encode() + str(maxval).encode()
    head += b"\n"
    payload = head + b"\xab\xcd"
    got = _parse_netpbm(payload)
    assert got is not None, payload
    assert got[:4] == (w, h, 1 if gray else 3, maxval)
    assert payload[got[4]:got[4] + 2] == b"\xab\xcd"


@given(st.binary(max_size=64))
@settings(max_examples=300, deadline=None)
def test_parse_netpbm_never_crashes_and_rejects_precisely(b):
    """Pure-Python fuzz: arbitrary bytes never raise, and anything the
    parser accepts really is a legal header (magic, three in-range
    fields, one-whitespace raster separator)."""
    from logvision_spark.operators.multimodal import _PNM_WS, _parse_netpbm

    got = _parse_netpbm(b)
    if got is None:
        return
    w, h, c, maxval, off = got
    assert b[:1] == b"P" and b[1:2] in (b"5", b"6")
    assert c == (1 if b[1:2] == b"5" else 3)
    assert 1 <= w <= 2**31 - 1 and 1 <= h <= 2**31 - 1
    assert 1 <= maxval <= 65535
    assert 2 < off <= len(b) and b[off - 1] in _PNM_WS


@given(st.one_of(
    st.binary(max_size=80),
    # bias toward near-miss headers: raw fuzz almost never produces
    # three whole decimal fields, so build mutilated-but-close ones
    st.tuples(
        st.sampled_from([b"P5", b"P6", b"P4", b"PX"]),
        st.lists(st.sampled_from(
            [b" ", b"\n", b"\t", b"#c\n", b"#\n", b"", b"8", b"255",
             b"65536", b"0", b"007", b"2147483648", b"a", b"#c", b"-1"]
        ), max_size=9),
    ).map(lambda t: t[0] + b"".join(t[1]) + b"\nxxx"),
))
@settings(max_examples=400, deadline=None)
def test_parse_netpbm_agrees_with_independent_reference(b):
    """Differential fuzz: the production char-walk tokenizer and the
    regex reference (_ref_parse_netpbm) must return IDENTICAL results —
    accept/reject, parsed fields, and raster offset — on arbitrary and
    near-miss inputs. This is the non-tautological check the r17 ADVICE
    asked for: the two implementations share no code, so a bug has to
    be made twice, independently, to slip through."""
    from logvision_spark.operators.multimodal import _parse_netpbm

    assert _parse_netpbm(b) == _ref_parse_netpbm(b)


def test_netpbm_comment_after_maxval_is_rejected_by_contract():
    """Strictness, on the record (r17 ADVICE): a '#' comment between
    the maxval token and the raster separator (some spec-lenient
    writers emit it) is REJECTED — the byte after the maxval digits
    must BE the single whitespace raster separator. Both
    implementations agree, so the contract is pinned from two sides;
    relaxing it is a deliberate decision that flips this test, not a
    drive-by."""
    from logvision_spark.operators.multimodal import _parse_netpbm

    strict_no = b"P6\n8 9\n255#c\n" + b"x" * (8 * 9 * 3)
    assert _parse_netpbm(strict_no) is None
    assert _ref_parse_netpbm(strict_no) is None
    # regression: digits INSIDE a comment are comment text, not header
    # tokens — the reference's first draft backtracked a comment to
    # end mid-line and parsed h=8 out of "#c8 8" (caught by the
    # differential fuzz on its first full-suite run)
    in_comment = b"P5 8#c8 8\nxxx"
    assert _parse_netpbm(in_comment) is None
    assert _ref_parse_netpbm(in_comment) is None
    # ...while every earlier separator position admits comment runs
    lenient_yes = b"P6#a\n# b\n8# c\n9\t#d\n255\n" + b"x" * 8
    assert _parse_netpbm(lenient_yes) == (8, 9, 3, 255, 23)
    assert _ref_parse_netpbm(lenient_yes) == (8, 9, 3, 255, 23)


def test_pnm_payload_roundtrips_through_real_decoder(spark):
    """pnm_payload (JVM string-compose) and _parse_netpbm must be exact
    inverses for both magics, and the bytes must equal the hand-built
    reference header."""
    from pyspark.sql import functions as F

    from logvision_spark.operators.multimodal import pnm_payload

    df = spark.createDataFrame(
        [(i, 16 + i * 37, 16 + i * 91, i % 2 == 0) for i in range(8)],
        "asset_id long, w int, h int, gray boolean",
    )
    built = df.select(
        "asset_id", "w", "h", "gray",
        F.when(
            F.col("gray"),
            pnm_payload(F.col("w"), F.col("h"), F.lit(b"\x00\x01\x02"), gray=True),
        )
        .otherwise(pnm_payload(F.col("w"), F.col("h"), F.lit(b"\x00\x01\x02")))
        .alias("payload"),
    )
    for r in built.collect():
        magic = "P5" if r["gray"] else "P6"
        ref = f"{magic}\n{r['w']} {r['h']}\n255\n".encode() + b"\x00\x01\x02"
        assert bytes(r["payload"]) == ref
    got = {r["asset_id"]: r for r in decode_images(built, use_fake=False).collect()}
    for r in df.collect():
        d = got[r["asset_id"]]
        assert (d["width"], d["height"], d["channels"], d["decode_ok"]) == (
            r["w"], r["h"], 1 if r["gray"] else 3, True,
        )


def test_resize_rejects_int32_overflowing_targets(spark):
    """A single output row >= 2^31 bytes can't be represented by int32
    Arrow offsets; the old clamp forced 1 row/batch and still
    overflowed (review finding) — now a clear error, both paths."""
    import pytest

    df = spark.createDataFrame([(1, b"x")], "asset_id long, payload binary")
    for fake in (True, False):
        with pytest.raises(ValueError, match="int32"):
            resize_images(df, 46341, 46341, use_fake=fake)
