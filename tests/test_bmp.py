"""BMP codec (ops/bmp.py): exact round-trips, palette / 32-bit /
top-down layouts, malformed + bomb rejection, mutation fuzz, and the
shared-dispatch integration (decode_image / resize_image / dhash_image
— a BMP and its PNG twin fingerprint identically, so the planted-image
corpus' PNG/BMP noise groups dedup across formats)."""

import struct

import numpy as np
import pytest

from outpost_spark.ops.bmp import (
    decode_bmp,
    decode_bmp_meta,
    encode_bmp,
    is_bmp,
)
from outpost_spark.ops.multimodal import (
    decode_image,
    dhash_image,
    image_pixels,
    planted_bmp,
    planted_png,
    resize_image,
)


def test_grey_roundtrip_exact():
    g = (np.arange(18 * 16, dtype=np.uint8).reshape(16, 18) * 7) % 251
    b = encode_bmp(g)
    assert is_bmp(b)
    px = decode_bmp(b)
    assert px.shape == (16, 18, 3)
    assert (px[..., 0] == g).all() and (px[..., 1] == g).all()
    meta = decode_bmp_meta(b)
    assert (meta["width"], meta["height"], meta["src_bpp"]) == (18, 16, 24)


def test_rgb_roundtrip_exact_with_row_padding():
    # odd width exercises the 4-byte scanline alignment
    rgb = np.random.RandomState(0).randint(0, 255, (7, 9, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(rgb)) == rgb).all()


def _bmp32(src, height):
    """Hand-build a 32-bit BGRA BMP (bottom-up unless height < 0)."""
    h, w = src.shape[:2]
    rows = np.zeros((h, ((w * 32 + 31) // 32) * 4), dtype=np.uint8)
    rows[:, : w * 4] = src[::-1].reshape(h, w * 4)  # file rows bottom-up
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, height, 1, 32, 0, rows.nbytes, 0, 0, 0, 0
    )
    head = b"BM" + struct.pack("<IHHI", 14 + 40 + rows.nbytes, 0, 0, 14 + 40)
    return head + dib + rows.tobytes()


def test_32bit_bgra_drops_alpha():
    src = np.random.RandomState(1).randint(0, 255, (2, 3, 4), dtype=np.uint8)
    px = decode_bmp(_bmp32(src, 2))
    assert px.shape == (2, 3, 3)
    # bottom-up: image top row is the file's LAST row = src[0]
    assert (px[0, 0] == src[0, 0, [2, 1, 0]]).all()
    assert (px[1, 2] == src[1, 2, [2, 1, 0]]).all()


def test_top_down_negative_height():
    src = np.random.RandomState(2).randint(0, 255, (2, 3, 4), dtype=np.uint8)
    px = decode_bmp(_bmp32(src, -2))
    # top-down: rows in file order — file row 0 is src[1] (builder flips)
    assert (px[0, 0] == src[1, 0, [2, 1, 0]]).all()


def test_8bit_palette_expands():
    pal = b"".join(bytes((i, 255 - i, i // 2, 0)) for i in range(256))  # BGRX
    idx = (np.arange(20, dtype=np.uint8).reshape(4, 5) * 13) % 256
    stride = ((5 * 8 + 31) // 32) * 4
    rows = np.zeros((4, stride), dtype=np.uint8)
    rows[:, :5] = idx[::-1]
    dib = struct.pack(
        "<IiiHHIIiiII", 40, 5, 4, 1, 8, 0, rows.nbytes, 0, 0, 256, 0
    )
    head = b"BM" + struct.pack(
        "<IHHI", 14 + 40 + 1024 + rows.nbytes, 0, 0, 14 + 40 + 1024
    )
    px = decode_bmp(head + dib + pal + rows.tobytes())
    assert (px[..., 2] == idx).all()  # B palette channel -> RGB blue
    assert (px[..., 1] == 255 - idx).all()
    assert (px[..., 0] == idx // 2).all()


def test_rejects_junk_truncation_compression_and_bomb():
    g = np.full((8, 10), 99, dtype=np.uint8)
    good = encode_bmp(g)
    for bad in (b"", b"BM", b"BMxx" + bytes(60), good[:40], good[:-5]):
        with pytest.raises(ValueError):
            decode_bmp(bad)
    rle = bytearray(good)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(rle))
    bomb = bytearray(good)
    struct.pack_into("<ii", bomb, 18, 60000, 60000)
    with pytest.raises(ValueError, match="ceiling|truncated"):
        decode_bmp(bytes(bomb))


def test_fuzz_mutations_never_crash():
    base = encode_bmp(
        np.random.RandomState(3).randint(0, 255, (12, 17, 3), dtype=np.uint8)
    )
    rng = np.random.RandomState(4)
    for _ in range(150):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(len(data))] = rng.randint(256)
        try:
            px = decode_bmp(bytes(data))
            assert px.nbytes <= (1 << 28)
        except ValueError:
            pass


def test_dispatch_fuzz_across_all_four_formats():
    """The shared dispatch (decode_image / image_pixels / resize_image)
    must hold the ValueError-or-valid contract across format
    boundaries: junk wearing each format's magic, cross-format
    prefixes, and mutated valid members of all four formats never
    raise anything but ValueError from the full-decode paths
    (decode_image tolerates undecodable PIXELS as header-only
    metadata, but never crashes)."""
    from outpost_spark.ops.multimodal import (
        _planted_cells,
        encode_png,
        planted_gif,
        planted_jpeg,
    )

    members = [
        planted_png(1, 0),
        planted_bmp(1, 0),
        planted_jpeg(1, 0),
        planted_gif(1, 0),
        encode_png(_planted_cells(1, 0)),
    ]
    rng = np.random.RandomState(5)
    crossed = [
        a[:12] + b[12:] for a in members for b in members if a is not b
    ]
    junk = [
        b"BM" + bytes(60),
        b"BM" + members[0][2:],
        b"RIFF1234AVI " + bytes(40),
        bytes(rng.randint(0, 255, 64, dtype=np.uint8)),
    ]
    pool = crossed + junk
    for _ in range(120):
        base = members[rng.randint(len(members))]
        data = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            data[rng.randint(len(data))] = rng.randint(256)
        pool.append(bytes(data))
    for blob in pool:
        for fn in (image_pixels, lambda b: resize_image(b, 0.5)):
            try:
                fn(blob)
            except ValueError:
                pass
        try:
            meta = decode_image(blob)
            assert isinstance(meta, dict) and "kind" in meta
        except ValueError:
            pass


def test_dispatch_and_cross_format_dhash_identity():
    """A BMP and the PNG of the same pixels decode, resize, and dHash
    identically through the shared image dispatch — the cross-format
    property the planted corpus' PNG/BMP noise groups value-oracle."""
    for seed in range(4):
        for tweak in range(3):
            png, bmp = planted_png(seed, tweak), planted_bmp(seed, tweak)
            assert dhash_image(png) == dhash_image(bmp)
            assert (
                image_pixels(bmp)[..., 0] == image_pixels(png)[..., 0]
            ).all()
    m = decode_image(planted_bmp(1, 0))
    assert (m["kind"], m["width"], m["height"], m["channels"]) == (
        "bmp", 18, 16, 3,
    )
    r = resize_image(planted_bmp(1, 0), 0.5)
    assert is_bmp(r)  # re-encoded in-format
    m2 = decode_image(r)
    assert (m2["width"], m2["height"]) == (9, 8)
