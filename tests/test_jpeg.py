"""Baseline JPEG codec (ops/jpeg.py): encode/decode round-trips across
4:4:4 / 4:2:0 / restart-interval layouts, spec-compliance against an
independent decoder (javax.imageio, when a JDK is present), malformed
input rejection, and the cross-format perceptual-dedup contract (a PNG
and its JPEG re-encode land on the same dHash)."""

import shutil
import struct
import subprocess

import numpy as np
import pytest

from outpost_spark.ops.jpeg import (
    _canonical_codes,
    _optimal_huffman,
    _ZIGZAG,
    decode_jpeg,
    decode_jpeg_meta,
    encode_jpeg,
)


def _smooth_rgb(h, w, seed=0):
    yv, xv = np.mgrid[0:h, 0:w].astype(np.float64)
    return np.stack(
        [
            np.sin(xv / 9 + seed) * 100 + 120,
            np.cos(yv / 7 + seed) * 90 + 130,
            np.sin((xv + yv) / 11) * 80 + 128,
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)


# ── round-trips ─────────────────────────────────────────────────────────


@pytest.mark.parametrize(
    "kw",
    [{}, {"subsample": True}, {"restart_interval": 3}, {"subsample": True, "restart_interval": 2}],
    ids=["444", "420", "dri", "420+dri"],
)
def test_roundtrip_smooth_rgb(kw):
    src = _smooth_rgb(41, 67)
    out = decode_jpeg(encode_jpeg(src, quality=92, **kw))
    assert out.shape == src.shape
    err = np.abs(out.astype(int) - src.astype(int))
    # 4:2:0 loses chroma detail; luma-driven content stays tight
    assert err.mean() < 4.0 and err.max() < 25, (err.max(), err.mean())


def test_roundtrip_shapes_and_meta():
    rng = np.random.RandomState(7)
    for (h, w, c) in [(1, 1, 1), (1, 1, 3), (8, 8, 3), (7, 9, 1), (9, 25, 3), (3, 3, 3)]:
        src = rng.randint(0, 256, (h, w, c)).astype(np.uint8)
        data = encode_jpeg(src, quality=100)
        meta = decode_jpeg_meta(data)
        assert (meta["width"], meta["height"], meta["channels"]) == (w, h, c)
        out = decode_jpeg(data)
        assert out.shape == (h, w, 3 if c == 3 else 1)


def test_q100_noise_near_lossless():
    rng = np.random.RandomState(3)
    src = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(src, quality=100))
    assert np.abs(out.astype(int) - src.astype(int)).max() <= 4


def test_grayscale_and_alpha_inputs():
    rng = np.random.RandomState(5)
    g = rng.randint(0, 256, (16, 18)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=100))
    assert out.shape == (16, 18, 1)
    rgba = rng.randint(0, 256, (10, 12, 4)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgba, quality=95))  # alpha dropped
    assert out.shape == (10, 12, 3)


def test_restart_interval_resets_dc_and_survives():
    # constant plateaus make DC prediction load-bearing: with DRI the
    # decoder must reset predictors per interval or drift visibly
    src = np.repeat(np.arange(8, dtype=np.uint8) * 30 + 10, 8)[None, :].repeat(16, 0)
    src = np.stack([src] * 3, axis=-1)
    for ri in (1, 2, 5):
        out = decode_jpeg(encode_jpeg(src, quality=95, restart_interval=ri))
        assert np.abs(out.astype(int) - src.astype(int)).max() < 20


# ── malformed / unsupported input ───────────────────────────────────────


def test_corruption_fuzz_never_hangs_or_segfaults():
    """The tolerant mapInPandas featurizers catch exceptions, so the
    only fatal decoder behaviors are hangs and interpreter crashes:
    mutate/truncate real streams (seq, 4:2:0, DRI, progressive) at
    fixed seeds and require every decode to terminate promptly —
    either returning an array or raising."""
    import time

    rng = np.random.RandomState(41)
    src = _smooth_rgb(24, 25)
    bases = [
        encode_jpeg(src, quality=90),
        encode_jpeg(src, quality=90, subsample=True),
        encode_jpeg(src, quality=90, restart_interval=2),
        encode_jpeg(src, quality=90, progressive=True),
    ]
    t0 = time.time()
    for base in bases:
        for _ in range(60):
            data = bytearray(base)
            for _ in range(rng.randint(1, 6)):
                data[rng.randint(2, len(data))] = rng.randint(0, 256)
            if rng.rand() < 0.3:
                data = data[: rng.randint(4, len(data))]
            try:
                out = decode_jpeg(bytes(data))
                assert out.dtype == np.uint8
            except Exception:
                pass  # any exception is fine; the stage flags the row
    assert time.time() - t0 < 60, "fuzz batch took too long: likely a hang"


def test_rejects_garbage_and_truncation():
    for bad in (b"", b"JUNK", b"\xff\xd8", b"\xff\xd8\xff\xee\x00\x04ab"):
        with pytest.raises(ValueError):
            decode_jpeg(bad)
    good = encode_jpeg(_smooth_rgb(16, 16), quality=90)
    with pytest.raises(ValueError):
        decode_jpeg_meta(good[:20])  # cut before SOF


def test_undecodable_streams_raise_valueerror_only():
    """decode_jpeg's contract: every undecodable blob raises ValueError —
    internal IndexError/struct.error from truncated or bit-flipped
    entropy data must not escape, because tolerant pipeline stages
    (resize_images) catch ValueError specifically (ADVICE r11)."""
    rng = np.random.RandomState(7)
    src = _smooth_rgb(24, 25)
    bases = [
        encode_jpeg(src, quality=90),
        encode_jpeg(src, quality=90, subsample=True),
        encode_jpeg(src, quality=90, progressive=True),
    ]
    for base in bases:
        for cut in range(4, len(base), 3):
            try:
                decode_jpeg(base[:cut])
            except ValueError:
                pass  # the only permitted exception type
        for _ in range(120):
            data = bytearray(base)
            for _ in range(rng.randint(1, 8)):
                data[rng.randint(2, len(data))] = rng.randint(0, 256)
            try:
                decode_jpeg(bytes(data))
            except ValueError:
                pass


def test_zero_sampling_factor_rejected():
    """A per-component h or v of 0 must fail at SOF parse (T.81 B.2.2
    bounds each factor to 1..4), not ZeroDivisionError at upsample
    (ADVICE r11)."""
    good = bytearray(encode_jpeg(_smooth_rgb(16, 16), quality=90, subsample=True))
    i = good.find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) ncomp(1), then id/hv/tq per comp
    hv0 = i + 2 + 2 + 1 + 4 + 1 + 1  # first component's hv byte
    for bad_hv in (0x10, 0x01, 0x00, 0x50, 0x05):
        mut = bytearray(good)
        mut[hv0] = bad_hv
        with pytest.raises(ValueError):
            decode_jpeg(bytes(mut))


def test_resize_stage_tolerates_corrupt_jpeg_members(spark):
    """A truncated JPEG member must come back resize_ok=false, not fail
    the Spark task (ADVICE r11 — the medium finding)."""
    from outpost_spark.ops.multimodal import resize_images

    good = encode_jpeg(_smooth_rgb(32, 24), quality=85)
    rows = [
        (1, bytearray(good)),
        (2, bytearray(good[: len(good) // 2])),  # truncated mid-entropy
        (3, bytearray(b"\xff\xd8\xff\xdb\x00\x05junk")),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {r["id"]: r for r in resize_images(df, scale=0.5).collect()}
    assert out[1]["resize_ok"] is True and out[1]["out_width"] == 12
    assert out[2]["resize_ok"] is False and out[2]["content"] is None
    assert out[3]["resize_ok"] is False


def test_rejects_malformed_progressive_and_exotic_sof():
    good = bytearray(encode_jpeg(_smooth_rgb(16, 16), quality=90))
    i = good.find(b"\xff\xc0")
    # SOF0 rewritten to SOF2 leaves a full-band interleaved scan, which
    # the progressive scan rules forbid (DC scan must have Se=0)
    good[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(good))
    assert decode_jpeg_meta(bytes(good))["progressive"] is True
    good[i + 1] = 0xC3  # lossless sequential
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_meta(bytes(good))


# ── progressive (SOF2) decoding ─────────────────────────────────────────

# 16x18 RGB progressive JPEG written by javax.imageio (the standard
# 10-scan script: DC first+refine, per-component AC first via spectral
# bands, two AC refinement passes) and the exact pixels this decoder
# produced for it, cross-checked against javax.imageio's own decode to
# within luma rounding (0.78) at generation time.
_PROG_JPG_B64 = (
    "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAUDBAQEAwUEBAQFBQUGBwwIBwcHBw8KCwkMEQ8SEhEPERATFhwXExQaFRARGCEYGhwdHx8fExciJCIeJBweHx7/2wBDAQUFBQcGBw4ICA4eFBEUHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh7/wgARCAAQABIDASIAAhEBAxEB/8QAFwAAAwEAAAAAAAAAAAAAAAAAAAMFBv/EABYBAQEBAAAAAAAAAAAAAAAAAAUCBv/aAAwDAQACEAMQAAABrMyDIZsmUFs9/8QAGhAAAgMBAQAAAAAAAAAAAAAAAgMAARESE//aAAgBAQABBQJL6xj6z3qJIsYRZ0U//8QAGREAAgMBAAAAAAAAAAAAAAAAAAIBBRMV/9oACAEDAQE/AYr1wOep/8QAGREAAgMBAAAAAAAAAAAAAAAAAAEDBRIV/9oACAECAQE/AYqxaOYj/8QAFBABAAAAAAAAAAAAAAAAAAAAIP/aAAgBAQAGPwJf/8QAGRAAAgMBAAAAAAAAAAAAAAAAAEEBEVEx/9oACAEBAAE/IXw+Jv6axvE3s//aAAwDAQACAAMAAAAQNN//xAAYEQACAwAAAAAAAAAAAAAAAAAAQQERMf/aAAgBAwEBPxBqibtP/8QAFREBAQAAAAAAAAAAAAAAAAAAAAH/2gAIAQIBAT8QHD//xAAXEAADAQAAAAAAAAAAAAAAAAAAESEx/9oACAEBAAE/EE0DeBtGiihjQwuj/9k="
)
_PROG_PX_B64 = (
    "eJwNy+lS2ggAAOBHqnILWfUBHFesRWXqruWyIKCAgoT7CsqVcFbQgBdQOSNFtgoCCjQcAcEn2sx8fz9zg2tvf7l+2sy2dtpP/3RfBKOmYNwWTVrycXN/UD/qP2sqTXPpGURaBl9dJ2ud7jVcpvqarbVx9ZuXaX5t/d7pNL6Ri2gJyUK8yMiFP6kfXkzFJz3cBMklbboldaetsu2q7dxiu/c1yRsm6f2SElXZpCafVjWkUcU4fDD8eoRKmC1Yc/grlv1H5HvFbyh8tmCbaI5PxkZut10S/SmJ+phkVFYOS4peQdvNHxfL1vu80YuZ3AW9uOwRFNz2+DcIFd+df88llZ1zJX6pHl8evSe1H6hpdmkk4tDo3FVFYSzuDaG+QPxUjsaliZge2TJFvl7A/15Hxc+wuBmW9iJyPKYcRI76YU03aH6DjfkIlEXsZxEHFLQKI8hu0G/XSiBQlj5S5EFN51iD63UTEJwajTPQPtXbCJ1veOypgmFMC4cNYVgHy0FUqkvoFTtmtQCVi29Usrpiv3mo7KlUuEbTV+nxw5OO0vEqtxXU3qwC8qg9kBISqaO7yqCDt+/mH2Q31EX+SXfjBN80TLfMs23LxzY023KNeQjxBf5v+7yyEY7wfyC8sJJ/I+MlDatCy/peakV2xz1orBy2/tb017QDrm7INQ/WTL3V084KVOYiuRWvbx0+XfVK1hOC1ZgVUDiXVbdszf2y/pUDdhdNo0UrsWR7X3JPFqEhEOqzkepSosyOIstxHxCVLd9JgCsjS0rGFOMgDRy/MLVtth5nGweAmQCcI44DX4B7TD/GiRWYIbKcLYTIIlxATRSNjaG7mgMzDGtrzvJGtQ9orhHDTTDgET0woP7A56MYPVWYvwgwkl7qxR7jXkTNGOfV5Ep90qfpluYn8yvF1qc6h3SILEOav0+J/ZmLlGnJ/FzCT0c9lISE/lNISZtoBhvLck2xZVnuNgXq0M+GDB/BCkyYsTEjOqSl+hT0gZkpUm9gZtpHu5EyMQmtaF+wQn85M0woD3h7TG+fHXjnBKdA6IOTmLHjE9YtwbiuAXkyRoAcwsoogUcZ6+F/ccjI5w=="
)


def test_progressive_fixture_decodes_exactly():
    import base64
    import zlib

    data = base64.b64decode(_PROG_JPG_B64)
    assert decode_jpeg_meta(data)["progressive"] is True
    px = decode_jpeg(data)
    want = np.frombuffer(
        zlib.decompress(base64.b64decode(_PROG_PX_B64)), dtype=np.uint8
    ).reshape(16, 18, 3)
    assert (px == want).all()


def test_progressive_decode_image_reports_luminance():
    import base64

    from outpost_spark.ops.multimodal import decode_image

    meta = decode_image(base64.b64decode(_PROG_JPG_B64))
    assert meta["kind"] == "jpeg"
    assert (meta["width"], meta["height"]) == (18, 16)
    assert meta["mean_luminance"] is not None


def test_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    src = _smooth_rgb(16, 18)
    data = bytearray(encode_jpeg(src, quality=92))
    i = data.find(b"\xff\xc0")
    data[i:i] = b"\xff\xff\xff"
    i = data.find(b"\xff\xc4")
    data[i:i] = b"\xff"
    out = decode_jpeg(bytes(data))
    assert out.shape == (16, 18, 3)
    assert np.abs(out.astype(int) - decode_jpeg(encode_jpeg(src, quality=92)).astype(int)).max() == 0


def test_rejects_undefined_tables():
    data = bytearray(encode_jpeg(_smooth_rgb(16, 16), quality=90))
    i = data.find(b"\xff\xc4")  # first DHT: retarget its table id
    data[i + 4] = 0x0F
    with pytest.raises(ValueError, match="undefined"):
        decode_jpeg(bytes(data))


def test_bomb_guard_caps_declared_dims():
    data = bytearray(encode_jpeg(_smooth_rgb(16, 16), quality=90))
    i = data.find(b"\xff\xc0")
    # declare 65000x65000: decode_jpeg must refuse before allocating
    data[i + 5 : i + 9] = struct.pack(">HH", 65000, 65000)
    with pytest.raises(ValueError, match="ceiling"):
        decode_jpeg(bytes(data))


# ── Huffman table construction ──────────────────────────────────────────


def test_optimal_huffman_is_canonical_prefix_code():
    rng = np.random.RandomState(11)
    freqs = {int(s): int(f) for s, f in zip(rng.choice(256, 40, replace=False), rng.randint(1, 1000, 40))}
    bits, vals = _optimal_huffman(freqs)
    assert sum(bits) == len(vals) == len(freqs)
    assert max(i + 1 for i, b in enumerate(bits) if b) <= 16
    codes = _canonical_codes(bits, vals)
    # prefix-free: no code is a prefix of another
    as_str = {format(c, f"0{l}b") for (l, c) in codes}
    assert len(as_str) == len(codes)
    for a in as_str:
        for b in as_str:
            assert a == b or not b.startswith(a)
    # Kraft sum strictly < 1: the all-ones slot stays reserved
    assert sum(2.0 ** -l for (l, _c) in codes) < 1.0


def test_optimal_huffman_single_symbol():
    bits, vals = _optimal_huffman({42: 100})
    codes = _canonical_codes(bits, vals)
    assert list(codes.values()) == [42]


def test_zigzag_is_a_permutation():
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    assert _ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


# ── independent decoder cross-check (javax.imageio via the JDK Spark
# already requires; skipped if no JDK on PATH) ──────────────────────────


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
    (tmp_path / "t.jpg").write_bytes(data)
    r = subprocess.run(
        ["java", "X", "t.jpg", "t.raw"], check=True, cwd=tmp_path, capture_output=True, text=True
    )
    w, h = map(int, r.stdout.split())
    px = np.frombuffer((tmp_path / "t.raw").read_bytes(), dtype=np.uint8)
    return px.reshape(h, w, 3)


@pytest.mark.skipif(
    shutil.which("javac") is None or shutil.which("java") is None,
    reason="no JDK available for the independent decoder",
)
@pytest.mark.parametrize("kw", [{}, {"restart_interval": 3}], ids=["444", "dri"])
def test_encoder_accepted_by_independent_decoder(tmp_path, kw):
    """Spec compliance, not self-consistency: javax.imageio decodes our
    4:4:4 stream to within rounding of our own decode."""
    src = _smooth_rgb(41, 67, seed=2)
    data = encode_jpeg(src, quality=92, **kw)
    theirs = _java_decode(tmp_path, data)
    ours = decode_jpeg(data)
    assert np.abs(theirs.astype(int) - ours.astype(int)).max() <= 2


def _java_encode_progressive(tmp_path, rgb, quality):
    src = tmp_path / "W.java"
    src.write_text(
        """
import javax.imageio.*; import javax.imageio.stream.*;
import java.awt.image.BufferedImage; import java.io.*;
public class W { public static void main(String[] a) throws Exception {
  int w=Integer.parseInt(a[1]), h=Integer.parseInt(a[2]);
  DataInputStream in = new DataInputStream(new BufferedInputStream(new FileInputStream(a[0])));
  BufferedImage im = new BufferedImage(w,h,BufferedImage.TYPE_INT_RGB);
  for (int y=0;y<h;y++) for (int x=0;x<w;x++) {
    int r=in.readUnsignedByte(), g=in.readUnsignedByte(), b=in.readUnsignedByte();
    im.setRGB(x,y,(r<<16)|(g<<8)|b); }
  ImageWriter wr = ImageIO.getImageWritersByFormatName("jpg").next();
  ImageWriteParam p = wr.getDefaultWriteParam();
  p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
  p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
  p.setCompressionQuality(Float.parseFloat(a[4]));
  wr.setOutput(new FileImageOutputStream(new File(a[3])));
  wr.write(null, new javax.imageio.IIOImage(im, null, null), p); wr.dispose(); } }
"""
    )
    subprocess.run(["javac", str(src)], check=True, cwd=tmp_path, capture_output=True)
    (tmp_path / "s.raw").write_bytes(rgb.tobytes())
    subprocess.run(
        ["java", "W", "s.raw", str(rgb.shape[1]), str(rgb.shape[0]), "p.jpg", str(quality)],
        check=True,
        cwd=tmp_path,
        capture_output=True,
    )
    return (tmp_path / "p.jpg").read_bytes()


@pytest.mark.skipif(
    shutil.which("javac") is None or shutil.which("java") is None,
    reason="no JDK available for the independent encoder",
)
@pytest.mark.parametrize("dims,q", [((23, 31), 0.75), ((8, 8), 0.95), ((41, 67), 0.9)])
def test_progressive_decodes_real_encoder_output(tmp_path, dims, q):
    """javax.imageio's progressive writer (DC/AC first + refinement
    scans, 4:2:0) decodes to within luma rounding of javax.imageio's
    own reader — chroma may differ by upsample interpolation style."""
    h, w = dims
    src = _smooth_rgb(h, w, seed=3)
    data = _java_encode_progressive(tmp_path, src, q)
    assert decode_jpeg_meta(data)["progressive"] is True
    ours = decode_jpeg(data)
    theirs = _java_decode(tmp_path, data)
    lw = np.array([0.299, 0.587, 0.114])
    luma_diff = np.abs(ours.astype(float) @ lw - theirs.astype(float) @ lw)
    assert luma_diff.max() <= 2.0, luma_diff.max()


# ── successive-approximation progressive encode (r12) ───────────────────


@pytest.mark.parametrize(
    "dims,q", [((23, 31), 85), ((8, 8), 95), ((41, 67), 70), ((129, 257), 60)]
)
def test_successive_approximation_decodes_identically(dims, q):
    """The SA script (DC Al=1, AC bands at Al=2, two AC refinement
    sweeps, DC refinement — the script real encoders default to)
    restores every coefficient bit, so it must decode pixel-identically
    to the sequential encode; 14 scans for color (1 DC + 4 AC stages x 3
    comps + 1 DC refine)."""
    h, w = dims
    src = _smooth_rgb(h, w, seed=6)
    seq = encode_jpeg(src, quality=q)
    sa = encode_jpeg(src, quality=q, progressive=True, successive=True)
    assert decode_jpeg_meta(sa)["progressive"] is True
    assert sa.count(b"\xff\xda") == 14
    assert (decode_jpeg(sa) == decode_jpeg(seq)).all()


def test_successive_grayscale_six_scan_script():
    g = _smooth_rgb(33, 29, seed=5)[..., 0]
    sa = encode_jpeg(g, quality=88, progressive=True, successive=True)
    assert sa.count(b"\xff\xda") == 6  # 1 DC + 4 AC + 1 DC refine
    assert (decode_jpeg(sa) == decode_jpeg(encode_jpeg(g, quality=88))).all()


def test_successive_requires_progressive():
    with pytest.raises(ValueError, match="progressive"):
        encode_jpeg(np.zeros((8, 8), np.uint8), successive=True)


@pytest.mark.skipif(
    shutil.which("javac") is None or shutil.which("java") is None,
    reason="no JDK available for the independent decoder",
)
def test_independent_decoder_reads_sa_coefficient_exact(tmp_path):
    """javax.imageio must decode our SA stream BYTE-IDENTICALLY to our
    sequential stream of the same image — both carry the same
    coefficients, so any deviation is an SA scan-script bug, with no
    cross-decoder-rounding tolerance to hide in."""
    src = _smooth_rgb(41, 67, seed=3)
    seq = encode_jpeg(src, quality=92)
    sa = encode_jpeg(src, quality=92, progressive=True, successive=True)
    assert (_java_decode(tmp_path, sa) == _java_decode(tmp_path, seq)).all()


# ── the multimodal integration contract ─────────────────────────────────


def test_decode_image_reports_jpeg_meta_and_luminance():
    from outpost_spark.ops.multimodal import decode_image

    src = _smooth_rgb(32, 48)
    meta = decode_image(encode_jpeg(src, quality=95))
    assert meta["kind"] == "jpeg"
    assert (meta["width"], meta["height"], meta["channels"]) == (48, 32, 3)
    want = float(
        (src.astype(np.float64) @ np.array([0.299, 0.587, 0.114])).mean()
    )
    assert abs(meta["mean_luminance"] - want) < 2.0


def test_dhash_matches_across_png_and_jpeg_encodes():
    from outpost_spark.ops.multimodal import _planted_cells, dhash_image, encode_png, planted_jpeg

    for seed in (2, 5, 8):
        png = dhash_image(encode_png(_planted_cells(seed, 1)))
        jpg = dhash_image(planted_jpeg(seed, 1))
        assert png == jpg, f"seed {seed}: cross-format dhash drift"


def test_resize_keeps_input_format():
    from outpost_spark.ops.multimodal import decode_image, resize_image

    src = _smooth_rgb(32, 48)
    out = resize_image(encode_jpeg(src, quality=95), 0.5)
    meta = decode_image(out)
    assert meta["kind"] == "jpeg"
    assert (meta["width"], meta["height"]) == (24, 16)


def test_extract_features_decoded_covers_jpeg(spark):
    from outpost_spark.ops.multimodal import extract_features_decoded

    rows = [
        (1, "image", bytearray(encode_jpeg(_smooth_rgb(16, 18), quality=90))),
        (2, "image", bytearray(b"JUNK")),
    ]
    df = spark.createDataFrame(rows, "id long, modality string, content binary")
    got = {r["id"]: r for r in extract_features_decoded(df).collect()}
    assert got[1]["decode_ok"] and got[1]["kind"] == "jpeg"
    assert got[1]["width"] == 18 and got[1]["height"] == 16
    assert got[1]["mean_luminance"] is not None
    assert got[2]["decode_ok"] is False
