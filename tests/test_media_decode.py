"""Real media metadata decode: parse_media_header against generated binary
fixtures with known dimensions (netpbm, BMP, PNG, GIF, JPEG — all public
container specs, parsed without any codec library), plus the end-to-end
Spark path (binary column -> mapInPandas -> HeaderDecoder) and the o19
gate-query shape."""

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from relationaldecomposition_spark.operators import multimodal
from relationaldecomposition_spark.operators.multimodal import (
    HeaderDecoder, parse_media_header)


def make_ppm(w, h, magic=b"P6", comment=False):
    hdr = magic + b"\n"
    if comment:
        hdr += b"# a netpbm comment\n"
    hdr += b"%d %d\n255\n" % (w, h)
    channels = 3 if magic in (b"P3", b"P6") else 1
    return hdr + b"\x7f" * (w * h * channels)


def make_bmp(w, h, bpp=24):
    # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40), no pixel data needed
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, 0, 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40, 0, 0, 54)
    return file_hdr + info


def make_png(w, h, color_type=6, bit_depth=8):
    ihdr = struct.pack(">II", w, h) + bytes([bit_depth, color_type, 0, 0, 0])
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def make_gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"


def make_jpeg(w, h, ncomp=3):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    sof0 = (b"\xff\xc0" + struct.pack(">H", 8 + 3 * ncomp) + b"\x08"
            + struct.pack(">HH", h, w) + bytes([ncomp]) + b"\x01\x11\x00" * ncomp)
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xda\x00\x02" + b"\x00" * 8 + b"\xff\xd9"


CASES = [
    (make_ppm(17, 9), (17, 9, 3, "ppm")),
    (make_ppm(640, 480, comment=True), (640, 480, 3, "ppm")),
    (make_ppm(5, 4, magic=b"P5"), (5, 4, 1, "pgm")),
    (make_ppm(3, 2, magic=b"P1"), (3, 2, 1, "pbm")),
    (make_bmp(800, 600), (800, 600, 3, "bmp")),
    (make_bmp(32, -32, bpp=32), (32, 32, 4, "bmp")),   # top-down BMP
    (make_png(1920, 1080), (1920, 1080, 4, "png")),
    (make_png(12, 34, color_type=2), (12, 34, 3, "png")),
    (make_png(7, 7, color_type=0), (7, 7, 1, "png")),
    (make_gif(101, 55), (101, 55, 3, "gif")),
    (make_jpeg(256, 192), (256, 192, 3, "jpeg")),
    (make_jpeg(64, 48, ncomp=1), (64, 48, 1, "jpeg")),
]


@pytest.mark.parametrize("payload,expect", CASES,
                         ids=[c[1][3] + str(i) for i, c in enumerate(CASES)])
def test_known_headers_parse(payload, expect):
    assert parse_media_header(payload) == expect


@pytest.mark.parametrize("junk", [
    None, b"", b"short", b"not an image at all" * 10,
    b"P9\n3 2\n255\n" + b"x" * 18,          # bad PNM magic
    b"\x89PNG\r\n\x1a\x00" + b"\x00" * 30,  # corrupted PNG signature
    b"\xff\xd8\xff\xda\x00\x02" + b"\x00" * 20,  # JPEG with no SOF
    b"BM" + b"\x00" * 6,                    # truncated BMP
])
def test_junk_yields_nulls(junk):
    assert parse_media_header(junk) == (None, None, None, None)


def test_header_decoder_spark_end_to_end(spark):
    rows = [(i, payload) for i, (payload, _) in enumerate(CASES)]
    rows.append((99, b"garbage bytes, not an image"))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in
           multimodal.extract_features(media, HeaderDecoder()).collect()}
    for i, (payload, (w, h, ch, fmt)) in enumerate(CASES):
        r = got[i]
        assert (r["width"], r["height"], r["channels"], r["format"]) == \
            (w, h, ch, fmt), fmt
        assert r["n_bytes"] == len(payload)
    junk = got[99]
    assert junk["width"] is None and junk["format"] is None
    assert junk["n_bytes"] == len(b"garbage bytes, not an image")


def test_documents_as_ppm_roundtrip(spark):
    """The synthesized PPM bytes must decode to exactly the dims they were
    built with — the o19 gate-query invariant, on a local fixture."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (0, 1, 63, 64, 47, 48, 1000)],
        "doc_id long, text string")
    media = multimodal.documents_as_ppm(docs)
    feats = {r["media_id"]: r for r in
             multimodal.extract_features(media, HeaderDecoder()).collect()}
    for i in (0, 1, 63, 64, 47, 48, 1000):
        r = feats[i]
        w, h = i % 64 + 1, i % 48 + 1
        assert (r["width"], r["height"], r["channels"], r["format"]) == \
            (w, h, 3, "ppm"), i
        # header is "P6\n<w> <h>\n255\n" then exactly 3*w*h pixel bytes
        assert r["n_bytes"] == len(f"P6\n{w} {h}\n255\n") + 3 * w * h


def test_pixel_stats_decoder_matches_python_oracle(spark):
    """PixelStatsDecoder's per-channel means equal a byte-level Python
    re-derivation of the same textured payloads (the o31 gate invariant)."""
    fixture = [(0, "abc"), (5, "hello world"), (66, ""),
               (7, "ünïcode stuff\nnewline")]
    docs = spark.createDataFrame(fixture, "doc_id long, text string")
    media = multimodal.documents_as_ppm_textured(docs)
    got = {r["media_id"]: r for r in
           multimodal.extract_pixel_stats(media).collect()}
    for i, t in fixture:
        w, h = i % 64 + 1, i % 48 + 1
        clean = "".join(c for c in t if " " <= c <= "~") + "x"
        payload = (clean * (64 * 48 * 3 // len(clean) + 1))[: w * h * 3]
        r = got[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        for ch, name in enumerate(("mean_r", "mean_g", "mean_b")):
            codes = [ord(c) for c in payload[ch::3]]
            import math
            exp = math.floor(sum(codes) / len(codes) * 1e6 + 0.5) / 1e6
            assert r[name] == pytest.approx(exp, abs=1e-9), (i, name)


def test_pixel_stats_rejects_non_p6(spark):
    """Grayscale P5, truncated P6, and junk all yield null means (and the
    truncated case keeps its parsed header dims)."""
    p5 = b"P5\n2 2\n255\n" + bytes([1, 2, 3, 4])
    p6_short = b"P6\n4 4\n255\n" + b"xy"          # needs 48 sample bytes
    rows = [(1, p5), (2, p6_short), (3, b"not an image at all......")]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in
           multimodal.extract_pixel_stats(media).collect()}
    assert got[1]["mean_r"] is None and got[1]["width"] is None
    assert got[2]["width"] == 4 and got[2]["height"] == 4
    assert got[2]["mean_r"] is None
    assert got[3]["width"] is None and got[3]["mean_b"] is None


def _pillow_available():
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


def test_pillow_decoder_raises_cleanly_without_pillow():
    """Without Pillow, the decoder fails with NotImplementedError at the
    batch boundary (import-gated — module import never touches PIL)."""
    import pandas as pd
    if _pillow_available():
        pytest.skip("Pillow installed; covered by the agreement test")
    with pytest.raises(NotImplementedError):
        multimodal.PillowDecoder().decode_batch(pd.Series([b"P6\n1 1\n255\nabc"]))


@pytest.mark.skipif(not _pillow_available(), reason="Pillow not installed")
def test_pillow_decoder_agrees_with_header_decoder():
    """Where Pillow exists, its codec-backed decode must agree with the
    pure-Python header parse on the formats both understand."""
    import pandas as pd
    ppm = b"P6\n3 2\n255\n" + bytes(range(18))
    got = multimodal.PillowDecoder().decode_batch(pd.Series([ppm]))
    hdr = multimodal.HeaderDecoder().decode_batch(pd.Series([ppm]))
    assert got.loc[0, "width"] == hdr.loc[0, "width"] == 3
    assert got.loc[0, "height"] == hdr.loc[0, "height"] == 2
    assert got.loc[0, "channels"] == hdr.loc[0, "channels"] == 3


# ---------------------------------------------------------------------------
# perceptual hash (image_phash + dedup.hamming_pairs)
# ---------------------------------------------------------------------------

def _ppm(w, h, pixels):
    """Raw P6 bytes from a flat list of (r, g, b)."""
    body = bytes(v for px in pixels for v in px)
    return f"P6\n{w} {h}\n255\n".encode() + body


def _py_dhash(w, h, pixels, gw=9, gh=8):
    """Independent python re-derivation of the 9x8 integer dHash."""
    gray = [sum(px) for px in pixels]
    sums = [[0] * gw for _ in range(gh)]
    cnts = [[0] * gw for _ in range(gh)]
    for p, g in enumerate(gray):
        x, y = p % w, p // w
        sums[(y * gh) // h][(x * gw) // w] += g
        cnts[(y * gh) // h][(x * gw) // w] += 1
    u = 0
    for r in range(gh):
        for c in range(gw - 1):
            if sums[r][c] * cnts[r][c + 1] > sums[r][c + 1] * cnts[r][c]:
                u |= 1 << (r * (gw - 1) + c)
    return u - (1 << 64) if u >= (1 << 63) else u


def test_image_phash_matches_python_oracle(spark):
    """dhash == the per-pixel python re-derivation, including images
    narrower than the grid (empty cells), the sign bit, and non-P6/
    truncated payloads hashing to null."""
    import random

    rng = random.Random(42)
    fixtures = []
    for mid, (w, h) in enumerate([(32, 24), (9, 8), (4, 3), (1, 1),
                                  (64, 48), (17, 11)]):
        px = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
              for _ in range(w * h)]
        fixtures.append((mid, w, h, px))
    rows = [(mid, _ppm(w, h, px), "image", None)
            for mid, w, h, px in fixtures]
    rows.append((100, b"GIF89a junk", "image", None))          # non-P6
    rows.append((101, b"P6\n4 4\n255\nxx", "image", None))     # truncated
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r["phash"]
           for r in multimodal.image_phash(media, "dhash").collect()}
    for mid, w, h, px in fixtures:
        assert got[mid] == _py_dhash(w, h, px), (mid, w, h)
    assert got[100] is None and got[101] is None
    with pytest.raises(ValueError, match="method"):
        multimodal.image_phash(media, "md5")


def test_image_phash_planted_near_dups_recall(spark):
    """Planted-recall property (round-10 ask #4): textured base images
    plus near-duplicates (a few pixels perturbed) and unrelated images.
    Every planted near-dup pair must surface within the hamming budget
    (recall 1.0) and no unrelated pair may (on this fixture)."""
    import random

    from relationaldecomposition_spark.operators import dedup

    rng = random.Random(7)
    w, h = 32, 24
    rows = []
    planted = set()
    for fam in range(6):
        base = [(rng.randrange(256),) * 3 for _ in range(w * h)]
        rows.append((fam * 10, _ppm(w, h, base), "image", None))
        # near-dup: perturb 20 random pixels slightly
        dup = list(base)
        for _ in range(20):
            i = rng.randrange(w * h)
            v = min(255, dup[i][0] + 8)
            dup[i] = (v, v, v)
        rows.append((fam * 10 + 1, _ppm(w, h, dup), "image", None))
        planted.add((fam * 10, fam * 10 + 1))
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    ph = multimodal.image_phash(media, "dhash")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dedup.hamming_pairs(ph, "media_id", "phash",
                                          bits=64,
                                          max_hamming=10).collect()}
    assert planted <= set(pairs), planted - set(pairs)   # recall 1.0
    assert set(pairs) == planted                          # no false pairs
    # ahash face also separates the families on this fixture
    pa = multimodal.image_phash(media, "ahash")
    pairs_a = {(r["id_a"], r["id_b"])
               for r in dedup.hamming_pairs(pa, "media_id", "phash",
                                            bits=64,
                                            max_hamming=10).collect()}
    assert planted <= pairs_a


def test_hamming_pairs_brute_force_and_guard(spark):
    """hamming_pairs == exact all-pairs xor/bit_count on random 64-bit
    signatures (pigeonhole recall is lossless); nulls drop; the
    max_bucket guard only removes pairs."""
    import random

    from relationaldecomposition_spark.operators import dedup

    rng = random.Random(3)
    sigs = [(i, rng.getrandbits(64) - (1 << 63)) for i in range(80)]
    # clone a few signatures to create hamming-0 clusters
    sigs += [(100 + i, sigs[i][1]) for i in range(5)]
    rows = sigs + [(999, None)]
    df = spark.createDataFrame(rows, "id bigint, sig bigint")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.hamming_pairs(df, "id", "sig", bits=64,
                                        max_hamming=12).collect()}
    want = {}
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            a, b = sigs[i], sigs[j]
            hd = bin((a[1] ^ b[1]) & ((1 << 64) - 1)).count("1")
            if hd <= 12:
                key = (min(a[0], b[0]), max(a[0], b[0]))
                want[key] = hd
    assert got == want and len(got) >= 5
    guarded = {(r["id_a"], r["id_b"])
               for r in dedup.hamming_pairs(df, "id", "sig", bits=64,
                                            max_hamming=12,
                                            max_bucket=2).collect()}
    assert guarded <= set(got)
