"""Perceptual image dedup (ops/multimodal.py dHash + the shared
pigeonhole Hamming band join): hash fixtures on constructed gradients,
near-dup vs unrelated separation, corrupt-member tolerance, and the
dedup_image_phash_pairs catalog entry pinned against the independently
computed planted-group answer."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from outpost_spark.ops.multimodal import (
    dhash_image,
    dhash_pairs,
    encode_png,
    image_dhash,
    planted_image_corpus,
    planted_png,
)

# ── the hash itself ─────────────────────────────────────────────────────


def _grey(arr) -> bytes:
    a = np.asarray(arr, dtype=np.uint8)
    return encode_png(a.reshape(a.shape[0], a.shape[1], 1))


def test_dhash_gradient_fixtures():
    # strictly increasing columns: every left<right comparison is true
    inc = _grey(np.tile(np.arange(0, 180, 10, dtype=np.uint8), (16, 1)))
    assert dhash_image(inc) == -1  # all 64 bits set, two's complement
    # strictly decreasing: no bit set
    dec = _grey(np.tile(np.arange(180, 0, -10, dtype=np.uint8), (16, 1)))
    assert dhash_image(dec) == 0
    # flat image: ties are False -> 0
    flat = _grey(np.full((16, 18), 128, dtype=np.uint8))
    assert dhash_image(flat) == 0


def test_dhash_rgb_matches_luminance_of_grey():
    g = np.tile(np.arange(0, 180, 10, dtype=np.uint8), (16, 1))
    rgb = np.stack([g, g, g], axis=-1)
    assert dhash_image(encode_png(rgb)) == dhash_image(_grey(g))


def test_dhash_near_dup_vs_unrelated():
    base = dhash_image(planted_png(7, 0))
    for tweak in (1, 2, 3):
        ham = bin(
            (base ^ dhash_image(planted_png(7, tweak))) & ((1 << 64) - 1)
        ).count("1")
        assert ham <= 4, f"tweak {tweak}: {ham}"
    other = dhash_image(planted_png(8, 0))
    ham = bin((base ^ other) & ((1 << 64) - 1)).count("1")
    assert ham > 10, ham


def test_dhash_rejects_undecodable():
    with pytest.raises(ValueError):
        dhash_image(b"JUNK: not a png")


# ── palette / 16-bit layouts (round-11: PLTE indexing + high-byte
# downsample in the shared pixel pass) ──────────────────────────────────


def _chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_palette_png(idx, palette, *, bit_depth=8) -> bytes:
    """Hand-rolled palette PNG: (h, w) uint8 indices + (n, 3) palette."""
    import struct
    import zlib

    h, w = idx.shape
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def encode_png16_grey(a16) -> bytes:
    """Hand-rolled 16-bit greyscale PNG from an (h, w) uint16 array."""
    import struct
    import zlib

    h, w = a16.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + a16[y].astype(">u2").tobytes() for y in range(h)
    )
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_palette_png_decodes_and_hashes_like_its_rgb_twin():
    from outpost_spark.ops.multimodal import _png_pixels

    grad = np.tile(np.arange(0, 180, 10, dtype=np.uint8), (16, 1))
    palette = np.stack([np.arange(256)] * 3, axis=-1).astype(np.uint8)
    png_pal = encode_palette_png(grad, palette)
    px = _png_pixels(png_pal)
    assert px.shape == (16, 18, 3)
    assert (px[..., 0] == grad).all()
    # identical content through the palette path and the grey path
    # lands on the SAME dHash — encodings dedup together
    assert dhash_image(png_pal) == dhash_image(_grey(grad))


def test_16bit_png_decodes_via_high_byte_downsample():
    from outpost_spark.ops.multimodal import _png_pixels

    g8 = np.tile(np.arange(0, 180, 10, dtype=np.uint8), (16, 1))
    a16 = (g8.astype(np.uint16) << 8) | 0x7F  # low byte is noise
    png16 = encode_png16_grey(a16)
    px = _png_pixels(png16)
    assert px.shape == (16, 18, 1)
    assert (px[..., 0] == g8).all()
    assert dhash_image(png16) == dhash_image(_grey(g8))


def test_palette_guards():
    from outpost_spark.ops.multimodal import _png_pixels

    grad = np.tile(np.arange(16, dtype=np.uint8), (16, 1))
    # index past the palette end must raise, not read out of bounds
    with pytest.raises(ValueError, match="palette index"):
        _png_pixels(encode_palette_png(grad + 100, np.zeros((16, 3))))


# ── Adam7 interlace + sub-byte layouts (round-11 decode breadth) ────────


def _pack_subbyte_row(vals, bit_depth):
    bits = (
        ((vals.astype(np.uint8)[:, None] >> np.arange(bit_depth - 1, -1, -1)) & 1)
        .astype(np.uint8)
        .reshape(-1)
    )
    return np.packbits(bits).tobytes()


def encode_subbyte_png(vals, bit_depth, *, palette=None) -> bytes:
    """Hand-rolled 1/2/4-bit PNG from (h, w) sample values (greyscale,
    or palette indices when ``palette`` is given)."""
    import struct
    import zlib

    h, w = vals.shape
    color = 3 if palette is not None else 0
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color, 0, 0, 0)
    raw = b"".join(b"\x00" + _pack_subbyte_row(vals[y], bit_depth) for y in range(h))
    out = _MAGIC + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def encode_adam7_png(bytes3d, *, bit_depth=8, color=None) -> bytes:
    """Hand-rolled Adam7-interlaced PNG from an (h, w, bpp) BYTE array
    (bpp = channels * bytes-per-sample); alternates None/Up filters per
    pass row so the interlaced unfilter is actually exercised."""
    import struct
    import zlib

    from outpost_spark.ops.multimodal import _ADAM7

    h, w, bpp = bytes3d.shape
    if color is None:
        color = {1: 0, 2: 0, 3: 2, 4: 6, 6: 2}[bpp]  # grey/grey16/RGB/RGBA/RGB16
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color, 0, 0, 1)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = bytes3d[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for y in range(sub.shape[0]):
            row = sub[y].reshape(-1)
            if y % 2:  # Up filter (prev row of THIS pass)
                raw += b"\x02" + (row - sub[y - 1].reshape(-1)).tobytes()
            else:  # None filter
                raw += b"\x00" + row.tobytes()
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_adam7_rgb_decodes_identically_to_sequential():
    from outpost_spark.ops.multimodal import _png_pixels, encode_png

    rng = np.random.RandomState(19)
    for (h, w) in [(16, 18), (13, 21), (1, 1), (7, 3)]:
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        inter = _png_pixels(encode_adam7_png(px))
        assert inter.shape == (h, w, 3)
        assert (inter == px).all()
        if h >= 8 and w >= 9:  # big enough for the dhash grid
            assert dhash_image(encode_adam7_png(px)) == dhash_image(encode_png(px))


def test_adam7_grey16_high_byte_downsample():
    from outpost_spark.ops.multimodal import _png_pixels

    rng = np.random.RandomState(23)
    a16 = rng.randint(0, 1 << 16, (16, 18)).astype(np.uint16)
    b3d = a16.astype(">u2")[..., None].view(np.uint8).reshape(16, 18, 2)
    px = _png_pixels(encode_adam7_png(b3d, bit_depth=16, color=0))
    assert px.shape == (16, 18, 1)
    assert (px[..., 0] == (a16 >> 8).astype(np.uint8)).all()


def test_subbyte_greyscale_scales_exactly():
    from outpost_spark.ops.multimodal import _png_pixels

    rng = np.random.RandomState(29)
    for bit_depth, scale in [(1, 255), (2, 85), (4, 17)]:
        vals = rng.randint(0, 1 << bit_depth, (16, 18)).astype(np.uint8)
        px = _png_pixels(encode_subbyte_png(vals, bit_depth))
        assert px.shape == (16, 18, 1)
        assert (px[..., 0] == vals * scale).all()


def test_subbyte_palette_indexes_plte():
    from outpost_spark.ops.multimodal import _png_pixels

    rng = np.random.RandomState(31)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (16, 18)).astype(np.uint8)
    px = _png_pixels(encode_subbyte_png(idx, 4, palette=pal))
    assert (px == pal[idx]).all()
    # a 4-bit grey and its palette twin (identity ramp palette) dedup
    vals = rng.randint(0, 16, (16, 18)).astype(np.uint8)
    ramp = np.stack([np.arange(16) * 17] * 3, axis=-1).astype(np.uint8)
    assert dhash_image(encode_subbyte_png(vals, 4)) == dhash_image(
        encode_subbyte_png(vals, 4, palette=ramp)
    )


def test_interlaced_subbyte_rejected():
    from outpost_spark.ops.multimodal import _png_pixels

    vals = np.zeros((16, 18, 1), dtype=np.uint8)
    blob = encode_adam7_png(vals, bit_depth=4, color=0)
    with pytest.raises(ValueError, match="sub-byte"):
        _png_pixels(blob)


def test_mixed_encoding_corpus_dedups_across_layouts(spark):
    """One image delivered as grey-8, palette, and 16-bit greyscale:
    all three fingerprints land in one near-dup cluster, so the
    decoded-fraction of a realistic mixed corpus is pinned at 100%."""
    from outpost_spark.ops.multimodal import image_dhash

    grad = (
        np.tile(np.arange(0, 180, 10, dtype=np.uint8), (16, 1))
        + np.arange(16, dtype=np.uint8)[:, None]
    )
    palette = np.stack([np.arange(256)] * 3, axis=-1).astype(np.uint8)
    corpus = [
        (1, _grey(grad)),
        (2, encode_palette_png(grad, palette)),
        (3, encode_png16_grey((grad.astype(np.uint16) << 8) | 0x33)),
    ]
    df = spark.createDataFrame(corpus, "id long, content binary")
    fps = {r["id"]: r for r in image_dhash(df).collect()}
    assert all(fps[i]["dhash_ok"] for i in (1, 2, 3))
    assert fps[1]["dhash"] == fps[2]["dhash"] == fps[3]["dhash"]
    pairs = dhash_pairs(df, max_hamming=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_dhash_rejects_hash_size_beyond_signed_64():
    # hash_size > 8 would overflow the two's-complement fold / Int64
    with pytest.raises(ValueError, match="hash_size"):
        dhash_image(planted_png(1, 0, width=24, height=24), hash_size=9)
    with pytest.raises(ValueError, match="hash_size"):
        dhash_image(planted_png(1, 0), hash_size=0)


def test_dhash_pairs_small_hash_size_uses_matching_band_width(spark):
    """bits follows hash_size^2 (not a hardcoded 64): at hash_size=4
    (16-bit fingerprints) the band join still finds the planted groups
    with a valid pigeonhole split of 16."""
    ids = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    imgs = planted_image_corpus(ids, id_col="doc_id", corrupt_every=0)
    out = dhash_pairs(imgs, max_hamming=3, hash_size=4).collect()
    # 16-bit hashes are coarse: same-seed groups must still pair up
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert got >= _expected_pairs(range(8), corrupt_every=10**9)
    with pytest.raises(ValueError):
        dhash_image(_grey(np.full((4, 4), 9, dtype=np.uint8)))  # < grid


# ── the distributed operator ────────────────────────────────────────────


def _expected_pairs(ids, group=4, corrupt_every=29):
    ok = [i for i in ids if i % corrupt_every != 0]
    want = set()
    for a in ok:
        for b in ok:
            if a < b and a // group == b // group:
                want.add((a, b))
    return want


def test_corpus_contains_progressive_jpeg_members(spark):
    """The mixed-format groups split JPEG members between sequential
    (id=1 mod 4) and progressive SOF2 (id=3 mod 4) — and the progressive
    slice further splits between the full successive-approximation
    script (id=3 mod 8: 6 scans) and spectral selection (id=7 mod 8:
    2 scans) — pinned here so a generator change can't silently drop
    either scan mode from the value-oracled dedup/decode entries."""
    from outpost_spark.ops.jpeg import decode_jpeg_meta

    ids = spark.range(8, 12).union(spark.range(20, 24)).select(
        F.col("id").alias("doc_id")
    )  # gids 2 and 5, both mixed-JPEG groups
    rows = {
        r["id"]: bytes(r["content"])
        for r in planted_image_corpus(ids, id_col="doc_id").collect()
    }
    assert rows[8][:8] == b"\x89PNG\r\n\x1a\n" and rows[10][:8] == rows[8][:8]
    assert decode_jpeg_meta(rows[9])["progressive"] is False
    assert decode_jpeg_meta(rows[11])["progressive"] is True
    assert decode_jpeg_meta(rows[23])["progressive"] is True
    assert rows[11].count(b"\xff\xda") == 6  # successive approximation
    assert rows[23].count(b"\xff\xda") == 2  # spectral selection


def test_image_dhash_tolerates_corrupt_members(spark):
    ids = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    imgs = planted_image_corpus(ids, id_col="doc_id")
    rows = {r["id"]: r for r in image_dhash(imgs).collect()}
    assert len(rows) == 60
    for i in (0, 29, 58):  # the junk members
        assert rows[i]["dhash_ok"] is False
        assert rows[i]["dhash"] is None
    assert sum(r["dhash_ok"] for r in rows.values()) == 57


def test_dhash_pairs_finds_exactly_the_planted_groups(spark):
    ids = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    imgs = planted_image_corpus(ids, id_col="doc_id")
    got = {
        (r["id_a"], r["id_b"])
        for r in dhash_pairs(imgs, max_hamming=4).collect()
    }
    want = _expected_pairs(range(120))
    assert got == want
    assert len(want) > 100  # the plant is non-trivial


def test_catalog_entry_matches_planted_answer(spark):
    from outpost_spark.queries_catalog import queries

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r["id_a"], r["id_b"])
        for r in queries()["dedup_image_phash_pairs"](spark, sf_dir).collect()
    }
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    assert got == _expected_pairs(doc_ids)


def test_band_default_respects_pigeonhole_for_64_bits(spark):
    ids = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    imgs = planted_image_corpus(ids, id_col="doc_id", corrupt_every=0)
    # max_hamming=7 -> bands must be a divisor of 64 greater than 7 -> 8
    out = dhash_pairs(imgs, max_hamming=7).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} >= _expected_pairs(
        range(8), corrupt_every=10**9
    )


def _expected_survivors(ids, group=4, corrupt_every=29):
    from collections import defaultdict

    ok = defaultdict(list)
    survivors = set()
    for i in ids:
        if corrupt_every and i % corrupt_every == 0:
            survivors.add(i)  # undecodable: no fingerprint, untouched
        else:
            ok[i // group].append(i)
    for members in ok.values():
        survivors.add(min(members))
    return survivors


def test_dhash_survivors_collapse_planted_groups(spark):
    from outpost_spark.ops.multimodal import dhash_canonical_survivors

    ids = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    imgs = planted_image_corpus(ids, id_col="doc_id")
    got = {r["id"] for r in dhash_canonical_survivors(imgs).collect()}
    want = _expected_survivors(range(120))
    assert got == want
    assert len(got) < 120  # clusters actually collapsed


def test_catalog_survivors_entry_matches_planted_answer(spark):
    from outpost_spark.queries_catalog import queries

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["id"]
        for r in queries()["dedup_image_survivors"](spark, sf_dir).collect()
    }
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    assert got == _expected_survivors(doc_ids)
