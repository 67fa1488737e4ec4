"""Baseline TIFF codec (ops/tiff.py): exact round-trips (both strip
compressions), both byte orders, malformed/bomb/unsupported rejection,
mutation fuzz, JDK-gated javax.imageio cross-checks BOTH directions
(TIFF is lossless), and the shared-dispatch integration."""

import shutil
import struct
import subprocess

import numpy as np
import pytest

from outpost_spark.ops.tiff import (
    decode_tiff,
    decode_tiff_meta,
    encode_tiff,
    is_tiff,
)


@pytest.mark.parametrize("packbits", [False, True], ids=["raw", "packbits"])
def test_grey_and_rgb_roundtrip_exact(packbits):
    g = (np.arange(300 * 47, dtype=np.uint8).reshape(300, 47) * 7) % 251
    t = encode_tiff(g, packbits=packbits)
    assert is_tiff(t)
    meta = decode_tiff_meta(t)
    assert (meta["width"], meta["height"], meta["channels"]) == (47, 300, 1)
    assert meta["compression"] == (32773 if packbits else 1)
    px = decode_tiff(t)
    assert px.shape == (300, 47, 1) and (px[..., 0] == g).all()
    rgb = np.random.RandomState(0).randint(0, 255, (70, 33, 3), dtype=np.uint8)
    assert (decode_tiff(encode_tiff(rgb, packbits=packbits)) == rgb).all()


def _mm_grey_2x3(values):
    """Hand-built BIG-endian (MM) uncompressed grey TIFF, 3 wide 2 tall."""
    data = bytes(values)
    # layout: header(8) + IFD + strip data appended at a fixed offset
    entries = []

    def e(tag, ttype, count, value):
        entries.append(struct.pack(">HHI", tag, ttype, count) + value)

    strip_off_pos = 8 + 2 + 9 * 12 + 4  # right after the IFD terminator
    e(256, 3, 1, struct.pack(">HH", 3, 0))
    e(257, 3, 1, struct.pack(">HH", 2, 0))
    e(258, 3, 1, struct.pack(">HH", 8, 0))
    e(259, 3, 1, struct.pack(">HH", 1, 0))
    e(262, 3, 1, struct.pack(">HH", 1, 0))
    e(273, 4, 1, struct.pack(">I", strip_off_pos))
    e(277, 3, 1, struct.pack(">HH", 1, 0))
    e(278, 3, 1, struct.pack(">HH", 2, 0))
    e(279, 4, 1, struct.pack(">I", len(data)))
    ifd = struct.pack(">H", 9) + b"".join(entries) + struct.pack(">I", 0)
    return b"MM\x00*" + struct.pack(">I", 8) + ifd + data


def test_big_endian_and_white_is_zero():
    vals = [10, 20, 30, 40, 50, 60]
    px = decode_tiff(_mm_grey_2x3(vals))
    assert px.shape == (2, 3, 1)
    # photometric 1 (BlackIsZero): values pass through
    assert px[..., 0].ravel().tolist() == vals
    # photometric 0 (WhiteIsZero) inverts
    blob = bytearray(_mm_grey_2x3(vals))
    pos = blob.index(struct.pack(">HHI", 262, 3, 1))
    struct.pack_into(">HH", blob, pos + 8, 0, 0)
    px0 = decode_tiff(bytes(blob))
    assert px0[..., 0].ravel().tolist() == [255 - v for v in vals]


def test_rejects_junk_unsupported_and_bomb():
    g = np.full((8, 10), 99, dtype=np.uint8)
    good = encode_tiff(g)
    for bad in (b"", b"II*\x00", b"MM\x00*" + bytes(10), good[:40], good[:-4]):
        with pytest.raises(ValueError):
            decode_tiff(bad)
    lzw = bytearray(good)
    pos = bytes(lzw).index(struct.pack("<HHI", 259, 3, 1))
    struct.pack_into("<H", lzw, pos + 8, 5)  # Compression=LZW
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(lzw))
    bomb = bytearray(good)
    pos = bytes(bomb).index(struct.pack("<HHI", 256, 3, 1))
    struct.pack_into("<H", bomb, pos + 8, 60000)
    pos = bytes(bomb).index(struct.pack("<HHI", 257, 3, 1))
    struct.pack_into("<H", bomb, pos + 8, 60000)
    with pytest.raises(ValueError, match="ceiling"):
        decode_tiff(bytes(bomb))


def test_fuzz_mutations_never_crash():
    base = encode_tiff(
        np.random.RandomState(3).randint(0, 255, (40, 31, 3), dtype=np.uint8),
        packbits=True,
    )
    rng = np.random.RandomState(4)
    for _ in range(200):
        data = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            data[rng.randint(len(data))] = rng.randint(256)
        if rng.random() < 0.25:
            data = data[: rng.randint(8, len(data))]
        try:
            px = decode_tiff(bytes(data))
            assert px.nbytes <= (1 << 28)
        except ValueError:
            pass


_no_jdk = shutil.which("javac") is None or shutil.which("java") is None


@pytest.mark.skipif(_no_jdk, reason="no JDK available for the independent decoder")
@pytest.mark.parametrize("packbits", [False, True], ids=["raw", "packbits"])
def test_encoder_accepted_by_independent_decoder(tmp_path, packbits):
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
    rgb = np.random.RandomState(9).randint(0, 255, (29, 41, 3), dtype=np.uint8)
    (tmp_path / "t.tif").write_bytes(encode_tiff(rgb, packbits=packbits))
    r = subprocess.run(
        ["java", "X", "t.tif", "t.raw"], check=True, cwd=tmp_path,
        capture_output=True, text=True,
    )
    w, h = map(int, r.stdout.split())
    theirs = np.frombuffer((tmp_path / "t.raw").read_bytes(), dtype=np.uint8)
    assert (w, h) == (41, 29)
    assert (theirs.reshape(29, 41, 3) == rgb).all()


@pytest.mark.skipif(_no_jdk, reason="no JDK available for the independent encoder")
def test_decoder_reads_independent_encoder_output(tmp_path):
    src = tmp_path / "WT.java"
    src.write_text(
        """
import javax.imageio.ImageIO; import java.awt.image.BufferedImage; import java.io.*;
public class WT { public static void main(String[] a) throws Exception {
  int w=Integer.parseInt(a[1]), h=Integer.parseInt(a[2]);
  DataInputStream in = new DataInputStream(new BufferedInputStream(new FileInputStream(a[0])));
  BufferedImage im = new BufferedImage(w,h,BufferedImage.TYPE_INT_RGB);
  for (int y=0;y<h;y++) for (int x=0;x<w;x++) {
    int r=in.readUnsignedByte(), g=in.readUnsignedByte(), b=in.readUnsignedByte();
    im.setRGB(x,y,(r<<16)|(g<<8)|b); }
  ImageIO.write(im, "tiff", new File(a[3])); } }
"""
    )
    subprocess.run(["javac", str(src)], check=True, cwd=tmp_path, capture_output=True)
    rgb = np.random.RandomState(11).randint(0, 255, (23, 31, 3), dtype=np.uint8)
    (tmp_path / "s.raw").write_bytes(rgb.tobytes())
    subprocess.run(
        ["java", "WT", "s.raw", "31", "23", "j.tif"],
        check=True, cwd=tmp_path, capture_output=True,
    )
    blob = (tmp_path / "j.tif").read_bytes()
    try:
        ours = decode_tiff(blob)
    except ValueError as e:
        pytest.skip(f"JDK writer emitted an unsupported layout: {e}")
    assert (ours[..., :3] == rgb).all()


def test_dispatch_integration():
    from outpost_spark.ops.multimodal import (
        decode_image,
        dhash_image,
        image_pixels,
        resize_image,
    )

    g = (np.arange(18 * 16, dtype=np.uint8).reshape(16, 18) * 5) % 241
    t = encode_tiff(g)
    m = decode_image(t)
    assert (m["kind"], m["width"], m["height"]) == ("tiff", 18, 16)
    assert m["mean_luminance"] == pytest.approx(float(g.mean()))
    assert (image_pixels(t)[..., 0] == g).all()
    r = resize_image(t, 0.5)
    assert is_tiff(r)  # re-encoded in-format
    assert decode_image(r)["width"] == 9
    # lossless: the TIFF dHash matches the PNG of the same pixels
    from outpost_spark.ops.multimodal import encode_png

    assert dhash_image(t) == dhash_image(encode_png(g[..., None]))


def test_empty_bits_per_sample_rejected():
    """A crafted BitsPerSample tag with count=0 yields bits=[], which
    must be rejected, not silently decoded as 8-bit (ADVICE r13)."""
    import numpy as np

    t = bytearray(encode_tiff(np.zeros((2, 3), dtype=np.uint8)))
    ifd_off = struct.unpack_from("<I", t, 4)[0]
    n = struct.unpack_from("<H", t, ifd_off)[0]
    patched = False
    for i in range(n):
        ent = ifd_off + 2 + i * 12
        if struct.unpack_from("<H", t, ent)[0] == 258:
            struct.pack_into("<I", t, ent + 4, 0)
            patched = True
    assert patched
    with pytest.raises(ValueError, match="bit depths"):
        decode_tiff(bytes(t))


def test_corpus_contains_tiff_members(spark):
    """The gid % 3 == 0 noise groups split odd ids between 24-bit BMP
    (id = 1 mod 4) and RGB TIFF (id = 3 mod 4; PackBits strips for
    id = 3 mod 8, uncompressed for id = 7 mod 8) — pinned so a
    generator change can't silently drop the TIFF slice from the
    value-oracled decode/resize/dedup entries (r14)."""
    from pyspark.sql import functions as F

    from outpost_spark.ops.multimodal import planted_image_corpus

    ids = spark.range(1, 4).union(spark.range(12, 16)).select(
        F.col("id").alias("doc_id")
    )  # gids 0 and 3, both noise groups
    rows = {
        r["id"]: bytes(r["content"])
        for r in planted_image_corpus(ids, id_col="doc_id").collect()
    }
    assert rows[1][:2] == b"BM" and rows[13][:2] == b"BM"
    assert rows[2][:8] == b"\x89PNG\r\n\x1a\n"
    for i, comp in ((3, 32773), (15, 1)):
        m = decode_tiff_meta(rows[i])
        assert (m["compression"], m["channels"]) == (comp, 3), (i, m)
        assert (m["width"], m["height"]) == (18, 16)
    # lossless twins: the TIFF member dHashes identically to its PNG twin
    from outpost_spark.ops.multimodal import dhash_image, planted_png

    assert dhash_image(rows[15]) == dhash_image(planted_png(3, 3))
