"""GIF codec (ops/gif.py): spec-derived LZW decode/encode, pinned by
round-trips, feature coverage (interlace, local color tables,
transparency, offset frames, multi-frame), cross-checks against an
independent decoder (javax.imageio, when a JDK is present), malformed
/ bomb rejection, and a mutation fuzz sweep mirroring test_jpeg.py's —
plus the multimodal integration contract (decode_image / image_pixels /
resize_image dispatch and the planted-corpus GIF groups)."""

import shutil
import struct
import subprocess
import zlib

import numpy as np
import pytest

from outpost_spark.ops.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    decode_gif_meta,
    encode_gif,
    encode_gif_animation,
)


def _cells(seed: int, h: int = 24, w: int = 33, levels: int = 9) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return (rng.randint(0, levels, (h, w)) * (255 // max(levels - 1, 1))).astype(
        np.uint8
    )


# ── round-trips ──────────────────────────────────────────────────────────


@pytest.mark.parametrize("interlace", [False, True], ids=["seq", "interlaced"])
def test_grey_roundtrip_exact(interlace):
    px = _cells(0, 37, 53, 14)
    data = encode_gif(px, interlace=interlace)
    meta = decode_gif_meta(data)
    assert (meta["width"], meta["height"]) == (53, 37)
    assert meta["interlaced"] is interlace and meta["n_frames"] == 1
    out = decode_gif(data)
    assert out.shape == (37, 53, 3)
    assert (out == px[..., None]).all()  # grey -> equal RGB triples


def test_rgb_roundtrip_exact():
    rng = np.random.RandomState(3)
    px = np.stack([(rng.randint(0, 6, (29, 41)) * 40).astype(np.uint8)
                   for _ in range(3)], axis=2)
    assert (decode_gif(encode_gif(px)) == px).all()


def test_full_256_color_palette_roundtrip():
    # exactly 256 distinct grey levels: the widest legal palette
    px = np.tile(np.arange(256, dtype=np.uint8), (8, 1))
    out = decode_gif(encode_gif(px))
    assert (out[..., 0] == px).all()


def test_more_than_256_colors_rejected():
    px = np.zeros((16, 17, 3), dtype=np.uint8)
    px[..., 0] = np.arange(16 * 17, dtype=np.uint16).reshape(16, 17) % 256
    px[..., 1] = np.arange(16 * 17, dtype=np.uint16).reshape(16, 17) // 256
    with pytest.raises(ValueError, match="256"):
        encode_gif(px)


def test_single_pixel_and_two_color_images():
    assert (decode_gif(encode_gif(np.array([[7]], dtype=np.uint8)))[0, 0]
            == [7, 7, 7]).all()
    bw = (np.indices((5, 9)).sum(0) % 2 * 255).astype(np.uint8)
    assert (decode_gif(encode_gif(bw))[..., 1] == bw).all()


def test_lzw_table_growth_and_reset():
    """A stream long and diverse enough to march the code width to 12
    bits and trip the 4096-entry CLEAR/reset cycle round-trips exactly."""
    rng = np.random.RandomState(7)
    px = rng.randint(0, 200, (300, 400)).astype(np.uint8)
    assert (decode_gif(encode_gif(px))[..., 2] == px).all()


def test_lzw_kwkwk_case():
    """The classic LZW corner: a code referencing the entry being
    defined (cScSc pattern) — decoder's code == len(table) branch."""
    # aaaaaa... guarantees the pattern immediately
    idx = np.zeros(64, dtype=np.uint8)
    out = _lzw_decode(_lzw_encode(idx, 2), 2, 64)
    assert bytes(out) == bytes(64)


# ── spec features our encoder never emits (hand-built streams) ──────────


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _hand_gif(
    *,
    screen=(6, 4),
    bg=1,
    gct=((0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)),
    frames=(),
    gce_transparent=None,
    frame_gce=None,
    trailer=True,
) -> bytes:
    """Minimal hand-assembled GIF89a with full control over the blocks
    (frame offsets, local palettes, transparency, disposal methods,
    multi-frame).  ``frame_gce``: per-frame (transparent_idx | None,
    disposal) pairs; ``gce_transparent`` is the frame-0 shorthand."""
    w, h = screen
    bits = 1
    while (1 << bits) < len(gct):
        bits += 1
    head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), bg, 0)
    pal = bytearray()
    for r, g, b in gct:
        pal += bytes((r, g, b))
    pal += bytes(3 * ((1 << bits) - len(gct)))
    body = bytearray()
    for fi, (left, top, fw, fh, indices, interlace, lct) in enumerate(frames):
        gce = None
        if frame_gce is not None and fi < len(frame_gce):
            gce = frame_gce[fi]
        elif gce_transparent is not None and fi == 0:
            gce = (gce_transparent, 0)
        if gce is not None and (gce[0] is not None or gce[1]):
            tr, disp = gce
            packed = ((disp & 7) << 2) | (1 if tr is not None else 0)
            body += b"\x21\xf9\x04" + bytes([packed, 0, 0, tr or 0, 0])
        ipacked = (0x40 if interlace else 0) | (
            0x80 | (bits - 1) if lct is not None else 0
        )
        body += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, ipacked)
        if lct is not None:
            lpal = bytearray()
            for r, g, b in lct:
                lpal += bytes((r, g, b))
            lpal += bytes(3 * ((1 << bits) - len(lct)))
            body += lpal
        mcs = max(bits, 2)
        body += bytes([mcs]) + _sub_blocks(
            _lzw_encode(np.asarray(indices, dtype=np.uint8), mcs)
        )
    return bytes(head + pal + body + (b"\x3b" if trailer else b""))


def test_frame_offset_composites_on_background():
    # 2x2 frame of color 2 at (1,1) on a 4x3 screen with bg color 1
    data = _hand_gif(
        screen=(4, 3), bg=1, frames=[(1, 1, 2, 2, [2, 2, 2, 2], False, None)]
    )
    px = decode_gif(data)
    assert (px[0, 0] == [255, 0, 0]).all()  # background (color 1)
    assert (px[1, 1] == [0, 255, 0]).all()  # frame (color 2)
    assert (px[2, 2] == [0, 255, 0]).all()
    assert (px[0, 3] == [255, 0, 0]).all()


def test_transparency_shows_background():
    data = _hand_gif(
        screen=(2, 2),
        bg=3,
        frames=[(0, 0, 2, 2, [0, 2, 0, 2], False, None)],
        gce_transparent=0,  # color 0 pixels become background (blue)
    )
    px = decode_gif(data)
    assert (px[0, 0] == [0, 0, 255]).all()  # transparent -> bg
    assert (px[0, 1] == [0, 255, 0]).all()  # opaque color 2


def test_local_color_table_overrides_global():
    lct = ((9, 9, 9), (10, 20, 30), (40, 50, 60), (70, 80, 90))
    data = _hand_gif(frames=[(0, 0, 6, 4, [1] * 24, False, lct)])
    px = decode_gif(data)
    assert (px[0, 0] == [10, 20, 30]).all()


def test_multi_frame_decodes_first_frame_only():
    f0 = (0, 0, 6, 4, [2] * 24, False, None)
    f1 = (0, 0, 6, 4, [3] * 24, False, None)
    data = _hand_gif(frames=[f0, f1])
    assert decode_gif_meta(data)["n_frames"] == 2
    assert (decode_gif(data)[0, 0] == [0, 255, 0]).all()  # frame 0's color


def test_gif87a_magic_accepted():
    data = encode_gif(_cells(1))
    data = b"GIF87a" + data[6:]
    assert decode_gif_meta(data)["kind"] == "gif"
    assert decode_gif(data).shape == (24, 33, 3)


# ── animation: decode_gif_frames / encode_gif_animation ─────────────────


def test_animation_roundtrip_exact():
    rng = np.random.RandomState(5)
    frames = (rng.randint(0, 7, (5, 16, 24)) * 36).astype(np.uint8)
    data = encode_gif_animation(frames, delay_cs=10)
    w, h, n, out = decode_gif_frames(data)
    assert (w, h, n) == (24, 16, 5)
    assert (out == frames[..., None]).all()
    assert decode_gif_meta(data)["n_frames"] == 5
    # the still path renders exactly frame 0
    assert (decode_gif(data) == out[0]).all()
    # max_frames caps the composited output
    assert decode_gif_frames(data, max_frames=2)[2] == 2


def test_animation_rgb_and_single_frame():
    rng = np.random.RandomState(6)
    fr = np.stack(
        [np.stack([(rng.randint(0, 4, (9, 13)) * 60).astype(np.uint8)
                   for _ in range(3)], axis=2) for _ in range(3)]
    )
    w, h, n, out = decode_gif_frames(encode_gif_animation(fr))
    assert n == 3 and (out == fr).all()
    assert decode_gif_frames(encode_gif(fr[0]))[2] == 1  # stills: one frame


def test_disposal_restore_to_background():
    """Disposal 2: the frame's region reverts to background before the
    next frame composites — hand-built, since our encoder never emits
    partial frames."""
    gct = ((10, 10, 10), (200, 0, 0), (0, 200, 0), (0, 0, 200))
    f0 = (1, 1, 2, 2, [1, 1, 1, 1], False, None)  # red square at (1,1)
    f1 = (0, 0, 1, 1, [2], False, None)  # green dot at (0,0)
    data = _hand_gif(screen=(4, 4), bg=0, gct=gct, frames=[f0, f1],
                     frame_gce=[(None, 2), (None, 0)])
    w, h, n, out = decode_gif_frames(data)
    assert n == 2
    assert (out[0][1, 1] == [200, 0, 0]).all()
    # frame 0's region restored to bg before frame 1
    assert (out[1][1, 1] == [10, 10, 10]).all()
    assert (out[1][0, 0] == [0, 200, 0]).all()


def test_disposal_restore_to_previous():
    """Disposal 3: the canvas under the frame is restored after it."""
    gct = ((10, 10, 10), (200, 0, 0), (0, 200, 0), (0, 0, 200))
    f0 = (0, 0, 2, 2, [1, 1, 1, 1], False, None)  # red 2x2
    f1 = (0, 0, 1, 1, [2], False, None)  # green dot OVER it, disposal 3
    f2 = (1, 1, 1, 1, [3], False, None)  # blue dot elsewhere
    data = _hand_gif(screen=(2, 2), bg=0, gct=gct, frames=[f0, f1, f2],
                     frame_gce=[(None, 0), (None, 3), (None, 0)])
    w, h, n, out = decode_gif_frames(data)
    assert (out[1][0, 0] == [0, 200, 0]).all()  # green visible in frame 1
    assert (out[2][0, 0] == [200, 0, 0]).all()  # red restored in frame 2
    assert (out[2][1, 1] == [0, 0, 200]).all()


def test_animation_transparency_accumulates():
    """Transparent pixels show the PREVIOUS frame's pixels (the
    accumulation a player renders), not the background."""
    gct = ((10, 10, 10), (200, 0, 0), (0, 200, 0), (0, 0, 200))
    f0 = (0, 0, 2, 1, [1, 2], False, None)
    f1 = (0, 0, 2, 1, [0, 3], False, None)  # idx 0 transparent here
    data = _hand_gif(screen=(2, 1), bg=0, gct=gct, frames=[f0, f1],
                     frame_gce=[(None, 0), (0, 0)])
    _w, _h, _n, out = decode_gif_frames(data)
    assert (out[1][0, 0] == [200, 0, 0]).all()  # red shows through
    assert (out[1][0, 1] == [0, 0, 200]).all()


def test_animation_bomb_guard_counts_all_frames():
    """A many-frame animation whose TOTAL composited output exceeds the
    ceiling raises instead of allocating (per-frame dims alone pass)."""
    frames = np.zeros((4, 16, 24), dtype=np.uint8)
    data = bytearray(encode_gif_animation(frames))
    struct.pack_into("<HH", data, 6, 16384, 16384)  # 16k x 16k x 3 x n
    with pytest.raises(ValueError, match="ceiling"):
        decode_gif_frames(bytes(data))


def test_sample_frames_decodes_planted_animated_gifs(spark):
    """The Spark frame-sampling stage runs REAL animated GIFs through
    the default decoder: per-video fan-out matches the plant arithmetic,
    junk members yield one decode_ok=false row, and a sampled frame's
    PNG payload decodes back to the source frame's pixels exactly."""
    from pyspark.sql import functions as F

    from outpost_spark.ops.multimodal import (
        image_pixels,
        planted_gif_animation,
        planted_video_corpus,
        sample_frames,
    )

    ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    vids = planted_video_corpus(ids)
    rows = sample_frames(vids, every_k=2).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    for junk in (0, 29):
        assert not [r for r in by_id[junk] if r["decode_ok"]]
    for i in range(1, 29):
        n = 2 + i % 6
        want_idx = list(range(0, n, 2))
        got = sorted(r["frame_idx"] for r in by_id[i])
        assert got == want_idx, f"id {i}"
        assert all(r["n_frames"] == n and r["width"] == 24 for r in by_id[i])
    # pixel fidelity: re-decode one sampled PNG frame
    r7 = next(r for r in by_id[7] if r["frame_idx"] == 2)
    from outpost_spark.ops.gif import decode_gif_frames as dgf

    src = dgf(planted_gif_animation(7, 2 + 7 % 6))[3][2]
    assert (image_pixels(bytes(r7["frame"])) == src).all()


# ── malformed / hostile input ────────────────────────────────────────────


def test_not_a_gif_raises():
    for junk in (b"", b"GIF", b"GIF90a" + bytes(20), b"\x89PNG\r\n\x1a\n"):
        with pytest.raises(ValueError):
            decode_gif_meta(junk + bytes(16))
        with pytest.raises(ValueError):
            decode_gif(junk + bytes(16))


def test_truncated_pixel_data_raises():
    data = encode_gif(_cells(2))
    with pytest.raises(ValueError, match="truncated|unterminated"):
        decode_gif(data[: len(data) // 2])


def test_zero_dims_and_no_image_data_raise():
    with pytest.raises(ValueError, match="zero-dimension"):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 0, 5, 0, 0, 0) + b"\x3b")
    with pytest.raises(ValueError, match="no image data"):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 3, 5, 0, 0, 0) + b"\x3b")


def test_decompression_bomb_rejected_before_allocation():
    """A crafted screen descriptor declaring ~4 gigapixels must be
    rejected up front — no multi-GB ndarray may ever exist."""
    data = bytearray(encode_gif(_cells(3)))
    struct.pack_into("<HH", data, 6, 65535, 65535)
    with pytest.raises(ValueError, match="ceiling"):
        decode_gif(bytes(data))


def test_oversized_frame_descriptor_rejected():
    """A tiny logical screen must not launder a ~4-gigapixel FRAME
    descriptor past the bomb bound: the frame's own fw*fh is checked
    before any LZW buffer exists (the composite would clip it, but by
    then a multi-GB bytearray would already have been allocated)."""
    data = bytearray(
        _hand_gif(screen=(4, 4), frames=[(0, 0, 4, 4, [1] * 16, False, None)])
    )
    # rewrite the image descriptor dims (header 13 + gct 12 + 0x2c + 4)
    pos = data.index(0x2C, 13)
    struct.pack_into("<HH", data, pos + 5, 30000, 30000)
    with pytest.raises(ValueError, match="ceiling"):
        decode_gif(bytes(data))
    with pytest.raises(ValueError, match="ceiling"):
        decode_gif_frames(bytes(data))


def test_background_color_from_global_table_under_local_palette():
    """The uncovered screen renders the GLOBAL table's background color
    even when the frame carries a LOCAL palette — the bg index must
    never be mapped through the frame's table."""
    lct = ((9, 9, 9), (10, 20, 30), (40, 50, 60), (70, 80, 90))
    data = _hand_gif(
        screen=(4, 3), bg=1, frames=[(1, 1, 2, 2, [2, 2, 2, 2], False, lct)]
    )
    px = decode_gif(data)
    assert (px[0, 0] == [255, 0, 0]).all()  # GLOBAL color 1, not lct[1]
    assert (px[1, 1] == [40, 50, 60]).all()  # frame pixel via the LCT
    # transparency composites the global background under a local table too
    data = _hand_gif(
        screen=(2, 2),
        bg=3,
        frames=[(0, 0, 2, 2, [0, 2, 0, 2], False, lct)],
        gce_transparent=0,
    )
    px = decode_gif(data)
    assert (px[0, 0] == [0, 0, 255]).all()  # transparent -> GLOBAL blue
    assert (px[0, 1] == [40, 50, 60]).all()  # opaque via the LCT


def test_lzw_output_capped_at_declared_pixels():
    """An LZW stream expanding far past the frame's declared pixel count
    stops at exactly that count (the in-stream bomb bound)."""
    idx = np.zeros(100_000, dtype=np.uint8)
    lzw = _lzw_encode(idx, 2)
    out = _lzw_decode(lzw, 2, 50)
    assert len(out) == 50


def test_fuzz_mutations_never_crash_or_overallocate():
    """240 single-byte mutations + 60 truncations of a valid GIF, fed to
    BOTH the still and the animation decoder: every outcome is a clean
    decode or ValueError — never IndexError / struct.error /
    MemoryError / hang (the tolerant-stage contract)."""
    base = encode_gif(_cells(5, 31, 47, 11), interlace=True)
    rng = np.random.RandomState(42)
    for trial in range(240):
        data = bytearray(base)
        pos = int(rng.randint(0, len(data)))
        data[pos] = int(rng.randint(0, 256))
        for dec in (decode_gif, decode_gif_frames):
            try:
                dec(bytes(data))
            except ValueError:
                pass
    for trial in range(60):
        cut = int(rng.randint(1, len(base)))
        for dec in (decode_gif, decode_gif_frames):
            try:
                dec(base[:cut])
            except ValueError:
                pass


def test_fuzz_animation_mutations():
    """The same sweep over a multi-frame file — GCE/descriptor/LZW bytes
    of later frames get mutated too."""
    rng = np.random.RandomState(43)
    frames = (rng.randint(0, 9, (4, 13, 21)) * 28).astype(np.uint8)
    base = encode_gif_animation(frames)
    for trial in range(160):
        data = bytearray(base)
        data[int(rng.randint(0, len(data)))] = int(rng.randint(0, 256))
        try:
            decode_gif_frames(bytes(data))
        except ValueError:
            pass


def test_unknown_block_rejected_not_skipped_silently():
    data = encode_gif(_cells(6))
    # splice an unknown block type where the image descriptor sits
    pos = data.index(b"\x2c")
    broken = data[:pos] + b"\x7f" + data[pos + 1 :]
    with pytest.raises(ValueError, match="unknown GIF block"):
        decode_gif(broken)


# ── independent decoder cross-check (javax.imageio via the JDK) ─────────


def _java_decode(tmp_path, data: bytes):
    src = tmp_path / "X.java"
    src.write_text(
        """
import javax.imageio.ImageIO; import java.awt.image.BufferedImage; import java.io.*;
public class X { public static void main(String[] a) throws Exception {
  BufferedImage im = ImageIO.read(new File(a[0]));
  DataOutputStream o = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(a[1])));
  System.out.println(im.getWidth()+" "+im.getHeight());
  for (int y=0;y<im.getHeight();y++) for (int x=0;x<im.getWidth();x++) {
    int p = im.getRGB(x,y); o.writeByte((p>>16)&255); o.writeByte((p>>8)&255); o.writeByte(p&255);
  } o.close(); } }
"""
    )
    subprocess.run(["javac", str(src)], check=True, cwd=tmp_path, capture_output=True)
    (tmp_path / "t.gif").write_bytes(data)
    r = subprocess.run(
        ["java", "X", "t.gif", "t.raw"], check=True, cwd=tmp_path,
        capture_output=True, text=True,
    )
    w, h = map(int, r.stdout.split())
    px = np.frombuffer((tmp_path / "t.raw").read_bytes(), dtype=np.uint8)
    return px.reshape(h, w, 3)


_no_jdk = shutil.which("javac") is None or shutil.which("java") is None


@pytest.mark.skipif(_no_jdk, reason="no JDK available for the independent decoder")
@pytest.mark.parametrize("interlace", [False, True], ids=["seq", "interlaced"])
def test_encoder_accepted_by_independent_decoder(tmp_path, interlace):
    """Spec compliance, not self-consistency: javax.imageio decodes our
    stream to the EXACT pixels (GIF is lossless)."""
    rng = np.random.RandomState(9)
    px = np.stack([(rng.randint(0, 6, (29, 41)) * 40).astype(np.uint8)
                   for _ in range(3)], axis=2)
    theirs = _java_decode(tmp_path, encode_gif(px, interlace=interlace))
    assert (theirs == px).all()


@pytest.mark.skipif(_no_jdk, reason="no JDK available for the independent encoder")
def test_decoder_reads_independent_encoder_output(tmp_path):
    src = tmp_path / "WG.java"
    src.write_text(
        """
import javax.imageio.ImageIO; import java.awt.image.BufferedImage; import java.io.*;
public class WG { public static void main(String[] a) throws Exception {
  int w=Integer.parseInt(a[1]), h=Integer.parseInt(a[2]);
  DataInputStream in = new DataInputStream(new BufferedInputStream(new FileInputStream(a[0])));
  BufferedImage im = new BufferedImage(w,h,BufferedImage.TYPE_INT_RGB);
  for (int y=0;y<h;y++) for (int x=0;x<w;x++) {
    int r=in.readUnsignedByte(), g=in.readUnsignedByte(), b=in.readUnsignedByte();
    im.setRGB(x,y,(r<<16)|(g<<8)|b); }
  ImageIO.write(im, "gif", new File(a[3])); } }
"""
    )
    subprocess.run(["javac", str(src)], check=True, cwd=tmp_path, capture_output=True)
    rng = np.random.RandomState(11)
    px = np.stack([(rng.randint(0, 5, (23, 31)) * 50).astype(np.uint8)
                   for _ in range(3)], axis=2)
    (tmp_path / "s.raw").write_bytes(px.tobytes())
    subprocess.run(
        ["java", "WG", "s.raw", "31", "23", "j.gif"],
        check=True, cwd=tmp_path, capture_output=True,
    )
    ours = decode_gif((tmp_path / "j.gif").read_bytes())
    assert (ours == px).all()


# ── the multimodal integration contract ─────────────────────────────────


def test_decode_image_reports_gif_meta_and_luminance():
    from outpost_spark.ops.multimodal import decode_image

    px = _cells(8, 32, 48, 12)
    meta = decode_image(encode_gif(px))
    assert meta["kind"] == "gif"
    assert (meta["width"], meta["height"], meta["channels"], meta["bit_depth"]) == (
        48, 32, 3, 8,
    )
    assert meta["mean_luminance"] == pytest.approx(float(px.mean()), abs=1e-6)


def test_dhash_matches_across_png_and_gif_encodes():
    from outpost_spark.ops.multimodal import (
        _planted_cells,
        dhash_image,
        encode_png,
        planted_gif,
    )

    for seed in (1, 4, 7):
        png = dhash_image(encode_png(_planted_cells(seed, 1)))
        gif = dhash_image(planted_gif(seed, 1))
        gif_i = dhash_image(planted_gif(seed, 1, interlace=True))
        assert png == gif == gif_i, f"seed {seed}: cross-format dhash drift"


def test_resize_gif_roundtrips_in_format():
    from outpost_spark.ops.multimodal import decode_image, image_pixels, resize_image

    src = encode_gif(_cells(10, 64, 72, 14), interlace=True)
    resized = resize_image(src, 0.5)
    assert resized[:6] in (b"GIF87a", b"GIF89a")
    meta = decode_image(resized)
    assert (meta["width"], meta["height"]) == (36, 32)
    full = image_pixels(src)
    ys = (np.arange(32) * 2).clip(0, 63)
    xs = (np.arange(36) * 2).clip(0, 71)
    assert (image_pixels(resized) == full[ys][:, xs]).all()  # lossless


def test_corpus_contains_gif_members(spark):
    """The gid % 3 == 1 groups split GIF members between sequential
    (id = 1 mod 4) and INTERLACED (id = 3 mod 4), with PNG twins on the
    even ids — pinned so a generator change can't silently drop the GIF
    slice (the same pin test_image_dedup.py holds for the JPEG slice)."""
    from pyspark.sql import functions as F

    from outpost_spark.ops.multimodal import planted_image_corpus

    ids = spark.range(4, 8).select(F.col("id").alias("doc_id"))  # gid 1
    rows = {
        r["id"]: bytes(r["content"])
        for r in planted_image_corpus(ids, id_col="doc_id").collect()
    }
    assert rows[4][:8] == b"\x89PNG\r\n\x1a\n" and rows[6][:8] == rows[4][:8]
    assert rows[5][:6] in (b"GIF87a", b"GIF89a")
    assert decode_gif_meta(rows[5])["interlaced"] is False
    assert decode_gif_meta(rows[7])["interlaced"] is True


def test_resize_stage_tolerates_corrupt_gif_members(spark):
    """A corrupt GIF member inside the Spark resize stage yields a
    resize_ok=false row, never a task failure (the r11 ADVICE contract
    now extended to the GIF path)."""
    from outpost_spark.ops.multimodal import resize_images

    good = encode_gif(_cells(12, 24, 33, 9))
    bad = bytearray(good)
    bad[len(bad) // 2] ^= 0xFF  # corrupt mid-stream
    df = spark.createDataFrame(
        [(1, bytes(good)), (2, bytes(bad[: len(bad) // 2])), (3, b"junk")],
        "id long, content binary",
    )
    rows = {r["id"]: r for r in resize_images(df, scale=0.5).collect()}
    assert rows[1]["resize_ok"] is True and rows[1]["out_width"] == 16
    assert rows[2]["resize_ok"] is False and rows[2]["content"] is None
    assert rows[3]["resize_ok"] is False
