"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design:

- A multimodal table carries ``(id, modality, content binary, meta map)``.
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: each batch arrives as a pandas DataFrame whose
  ``content`` column holds raw bytes; the UDF returns feature rows with a
  declared schema, so downstream operators stay columnar.
- At 100 TB the binary column dominates I/O: the feature schema is
  projected immediately after decode and the binary column is dropped, so
  only features shuffle.  Partitioning by (modality, date) keeps decode
  tasks homogeneous — no skew from mixing 1 KB thumbnails with 1 GB video.

Decoders are stdlib+numpy only: PNG via ``zlib``/``struct`` (dimensions,
bit depth, channels, mean luminance — all five scanline filters; the
pixel pass additionally covers palette expansion, 16-bit downsample,
1/2/4-bit greyscale and palette samples, and Adam7 interlace),
JPEG via ``ops/jpeg.py`` (sequential AND progressive
Huffman, any h/v chroma sampling, restart markers — the dominant format
of real crawl corpora), GIF via ``ops/gif.py`` (87a/89a, LZW,
global/local palettes, interlace, transparency — the third crawl
staple), and WAV via the ``wave`` module (sample rate,
channels, duration, RMS for 16-bit PCM).  Formats needing external
codec libraries (MP3, video, arithmetic-coded JPEG) raise ``ValueError``
like any other undecodable blob;
the batched featurizer turns that into ``decode_ok=false`` rather than
failing the task, since a corpus-scale decode job must survive corrupt
members.  ``fake_features`` remains the deterministic engine-portable
featurizer used by the cross-engine catalog oracle.

Decode throughput (512x512 RGB, single core; measured against the prior
per-pixel-numpy implementation): None ~160 MB/s (1.5x), Sub ~80 MB/s
(~100x — per-lane cumsum), Up ~160 MB/s (1.4x), Average ~6 MB/s (~10x),
Paeth ~3.5 MB/s (~6.5x).  Average/Paeth recur along x so they run as
plain-int Python loops (an order of magnitude faster than per-element
numpy indexing); a codec library would beat this, but the stage is
quarantined inside mapInPandas and scales out linearly with executors.
Untrusted input is bounded: the zlib inflate is capped at exactly the
raw size the declared dims imply and dims above ``_MAX_RAW_BYTES`` skip
the pixel stage entirely, so a crafted PNG cannot allocate unbounded
memory (decompression bomb) or stall an executor.
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "id bigint, modality string, n_bytes bigint, checksum string, feat array<double>"

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8"
_GIF_MAGICS = (b"GIF87a", b"GIF89a")
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Decompression-bomb ceiling for the pixel stage: the raw scanline buffer
# (height * (width*channels + 1)) may never exceed this, and the zlib
# inflate is hard-capped at exactly that size via decompressobj — a
# crafted PNG can therefore allocate at most 256 MiB regardless of what
# its IDAT would expand to.  Images whose declared dims exceed the
# ceiling decode header-only (dims reported, luminance skipped).
_MAX_RAW_BYTES = 1 << 28


def decode_image(content: bytes) -> dict:
    """Decode a PNG or JPEG with stdlib+numpy only: dims, depth,
    channels, mean luminance.

    PNG: 8-bit non-interlaced greyscale/RGB(+alpha) — the shapes a
    training pipeline's thumbnail/tile stages produce — with full scanline
    unfiltering (None/Sub/Up/Average/Paeth).  Palette, 16-bit, and
    interlaced PNGs decode headers only (``mean_luminance`` None).
    JPEG: sequential and progressive Huffman (SOF0/SOF1/SOF2, any h/v
    chroma sampling, restart markers) via ``ops/jpeg.py``; arithmetic
    streams decode headers only.  GIF (87a/89a, global/local palettes,
    interlace, transparency) via ``ops/gif.py`` — first frame
    composited on the logical screen, reported as 8-bit 3-channel.
    Any other input raises ``ValueError``.
    """
    if content[:6] in _GIF_MAGICS:
        from outpost_spark.ops import gif as _gif

        meta = _gif.decode_gif_meta(content)
        out = {
            "kind": "gif",
            "width": meta["width"],
            "height": meta["height"],
            "bit_depth": 8,
            "channels": 3,
            "mean_luminance": None,
        }
        if meta["width"] * meta["height"] * 3 > _MAX_RAW_BYTES:
            return out  # header-only: bomb guard
        try:
            px = _gif.decode_gif(content)
        except ValueError:
            return out  # corrupt pixel data: header-only
        import numpy as np

        lum = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        out["mean_luminance"] = float(lum.mean())
        return out
    if content[:2] == _JPEG_MAGIC:
        from outpost_spark.ops import jpeg

        meta = jpeg.decode_jpeg_meta(content)
        out = {
            "kind": "jpeg",
            "width": meta["width"],
            "height": meta["height"],
            "bit_depth": meta["bit_depth"],
            "channels": meta["channels"],
            "mean_luminance": None,
        }
        if meta["width"] * meta["height"] * max(meta["channels"], 1) > _MAX_RAW_BYTES:
            return out  # header-only: bomb guard
        try:
            px = jpeg.decode_jpeg(content)
        except ValueError:
            return out  # e.g. 12-bit / arithmetic: header-only
        import numpy as np

        if px.shape[2] >= 3:
            lum = px[..., :3].astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        else:
            lum = px[..., 0].astype(np.float64)
        out["mean_luminance"] = float(lum.mean())
        return out
    from outpost_spark.ops import tiff as _tiff

    if _tiff.is_tiff(content):
        meta = _tiff.decode_tiff_meta(content)
        out = {
            "kind": "tiff",
            "width": meta["width"],
            "height": meta["height"],
            "bit_depth": meta["bit_depth"],
            "channels": meta["channels"],
            "mean_luminance": None,
        }
        if meta["width"] * meta["height"] * max(meta["channels"], 1) > _MAX_RAW_BYTES:
            return out  # header-only: bomb guard
        try:
            px = _tiff.decode_tiff(content)
        except ValueError:
            return out  # unsupported layout / corrupt raster: header-only
        import numpy as np

        if px.shape[2] >= 3:
            lum = px[..., :3].astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        else:
            lum = px[..., 0].astype(np.float64)
        out["mean_luminance"] = float(lum.mean())
        return out
    from outpost_spark.ops import bmp as _bmp

    if _bmp.is_bmp(content):
        meta = _bmp.decode_bmp_meta(content)
        out = {
            "kind": "bmp",
            "width": meta["width"],
            "height": meta["height"],
            "bit_depth": 8,
            "channels": 3,
            "mean_luminance": None,
        }
        if meta["width"] * meta["height"] * 3 > _MAX_RAW_BYTES:
            return out  # header-only: bomb guard
        try:
            px = _bmp.decode_bmp(content)
        except ValueError:
            return out  # corrupt pixel data: header-only
        import numpy as np

        lum = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        out["mean_luminance"] = float(lum.mean())
        return out
    if len(content) < 8 or content[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG or JPEG")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IHDR":
            if len(data) < 13:
                raise ValueError("malformed PNG (truncated IHDR)")
            width, height, bit_depth, color_type, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or color_type not in _PNG_CHANNELS:
        raise ValueError("malformed PNG (no IHDR / bad color type)")
    channels = _PNG_CHANNELS[color_type]
    out = {
        "kind": "png",
        "width": int(width),
        "height": int(height),
        "bit_depth": int(bit_depth),
        "channels": channels,
        "mean_luminance": None,
    }
    if bit_depth != 8 or interlace or color_type == 3 or not idat or not height:
        return out  # header-only decode for the unsupported pixel layouts

    rows = _png_unfilter(idat, width, height, channels)
    if rows is None:
        return out  # bomb guard tripped: dims reported, luminance skipped
    import numpy as np

    lum_w = (
        np.array([0.299, 0.587, 0.114, 0.0][:channels])
        if channels >= 3
        else np.array([1.0, 0.0][:channels])
    )
    px = rows.reshape(height * width, channels).astype(np.float64)
    out["mean_luminance"] = float((px @ lum_w).sum()) / (width * height)
    return out


def _inflate(idat, cap: int) -> bytes:
    """Bounded zlib inflate with the multimodal error contract: a
    corrupt deflate stream raises ValueError (zlib.error is NOT a
    ValueError — the r13 dispatch fuzz caught it escaping)."""
    try:
        return zlib.decompressobj().decompress(bytes(idat), cap)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG stream: {e}") from e


def _png_unfilter(idat, width, height, channels):
    """Inflate + unfilter PNG scanlines -> (height, width*channels) uint8
    array; None when the bomb guard declines to allocate.  Shared by
    decode_image (luminance) and resize_image (pixel access)."""
    stride = width * channels
    expected = height * (stride + 1)
    if expected > _MAX_RAW_BYTES:
        # decompression-bomb guard: a crafted IHDR can declare absurd dims;
        # never allocate past the ceiling — dims still reported, luminance
        # skipped (decode_ok stays true downstream)
        return None
    # bound the inflate by the exact raw size the declared dims imply, so a
    # bomb whose IDAT expands far beyond its IHDR can't allocate gigabytes
    raw = _inflate(idat, expected)
    if len(raw) < expected:
        raise ValueError("truncated PNG pixel data")
    return _unfilter_raw(raw, height, stride, channels)


def _unfilter_raw(raw, height: int, stride: int, bpp: int):
    """Unfilter already-inflated scanlines (``height`` rows of 1 filter
    byte + ``stride`` data bytes; ``bpp`` = the filter's left-neighbor
    distance in BYTES) -> (height, stride) uint8.  The core shared by
    the sequential, Adam7-interlaced, and sub-byte paths."""
    import numpy as np

    mat = np.frombuffer(raw, dtype=np.uint8, count=height * (stride + 1)).reshape(
        height, stride + 1
    )
    ftypes = mat[:, 0]
    if (ftypes > 4).any():
        raise ValueError(f"unknown PNG filter {int(ftypes[ftypes > 4][0])}")
    rows = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    prev_list = [0] * stride  # plain-int twin for the sequential filters
    for y in range(height):
        ftype = ftypes[y]
        filt = mat[y, 1:]
        if ftype == 0:  # None
            cur = filt.copy()
        elif ftype == 1:  # Sub: per-lane prefix sum (mod 256) — vectorized
            lanes = filt.reshape(stride // bpp, bpp).astype(np.uint64)
            cur = (
                np.cumsum(lanes, axis=0) & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up — vectorized
            cur = filt + prev  # uint8 wraps mod 256
        else:
            # Average/Paeth recur along x; run them on plain Python ints
            # (bytearray + list), which beats per-element numpy indexing
            # by an order of magnitude — see module scale note
            f_list = filt.tolist()
            cur_list = [0] * stride
            if ftype == 3:  # Average
                for x in range(stride):
                    left = cur_list[x - bpp] if x >= bpp else 0
                    cur_list[x] = (f_list[x] + ((left + prev_list[x]) >> 1)) & 0xFF
            else:  # Paeth
                for x in range(stride):
                    a = cur_list[x - bpp] if x >= bpp else 0
                    b = prev_list[x]
                    c = prev_list[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur_list[x] = (f_list[x] + pred) & 0xFF
            cur = np.asarray(cur_list, dtype=np.uint8)
        rows[y] = cur
        prev = cur
        # keep the int twin in sync only when the NEXT row might need it
        if y + 1 < height and ftypes[y + 1] >= 3:
            prev_list = cur.tolist()
    return rows


# Adam7 pass grid: (x0, y0, dx, dy) per pass — each pass is an
# independently filtered sub-image, all concatenated in ONE zlib stream
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _adam7_deinterlace(idat, width: int, height: int, bpp: int):
    """Decode an Adam7-interlaced PNG's IDAT -> (height, width*bpp)
    uint8 (``bpp`` = bytes per pixel): one capped inflate, then each
    pass unfiltered as its own sub-image and scattered onto the
    ``[y0::dy, x0::dx]`` grid.  Same bomb ceiling as the sequential
    path.  Raises on truncation; ValueError past the ceiling."""
    import numpy as np

    passes = []
    total = 0
    for x0, y0, dx, dy in _ADAM7:
        wp = (width - x0 + dx - 1) // dx
        hp = (height - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            passes.append(None)
            continue
        passes.append((x0, y0, dx, dy, wp, hp))
        total += hp * (wp * bpp + 1)
    if total > _MAX_RAW_BYTES:
        raise ValueError("image exceeds the decode size ceiling")
    raw = _inflate(idat, total)
    if len(raw) < total:
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((height, width, bpp), dtype=np.uint8)
    pos = 0
    for p in passes:
        if p is None:
            continue
        x0, y0, dx, dy, wp, hp = p
        seg = hp * (wp * bpp + 1)
        rows = _unfilter_raw(raw[pos : pos + seg], hp, wp * bpp, bpp)
        pos += seg
        out[y0::dy, x0::dx] = rows.reshape(hp, wp, bpp)
    return out.reshape(height, width * bpp)


def _unpack_subbyte(rows, width: int, bit_depth: int):
    """(h, stride_bytes) packed 1/2/4-bit samples -> (h, width) uint8
    sample VALUES (not yet scaled to 8-bit range)."""
    import numpy as np

    bits = np.unpackbits(rows, axis=1)[:, : width * bit_depth]
    weights = 1 << np.arange(bit_depth - 1, -1, -1, dtype=np.uint8)
    return (
        (bits.reshape(rows.shape[0], width, bit_depth) * weights)
        .sum(axis=2)
        .astype(np.uint8)
    )


def decode_audio(content: bytes) -> dict:
    """Decode a WAV: rate, channels, duration; RMS amplitude
    (normalized to [0,1]).  Uses the shared direct RIFF parse (r13), so
    the metadata stage accepts exactly the variants the sample stages
    do — unsigned 8-bit, 16/24/32-bit PCM, IEEE float32/64, EXTENSIBLE
    — with RMS computed over the int16-normalized samples for all of
    them.  Any non-WAV input raises ``ValueError``."""
    import numpy as np

    from outpost_spark.ops.flac import is_flac

    arr, rate, bits = _wav_parse(content)
    n_frames = len(arr)
    rms = None
    if n_frames:
        samples = arr.astype(np.float64) / 32768.0
        rms = float(np.sqrt(np.mean(samples * samples)))
    return {
        "kind": "flac" if is_flac(content) else "wav",
        "sample_rate": int(rate),
        "channels": int(arr.shape[1]),
        "sample_width": bits // 8,
        "n_frames": int(n_frames),
        "duration_s": (n_frames / rate) if rate else 0.0,
        "rms": rms,
    }


def _fake_feature_vector(content: bytes, dims: int = 4) -> list[float]:
    """Deterministic stand-in for a decoder+featurizer: md5-derived values
    in [0,1).  Keeps tests meaningful without codec libraries."""
    h = hashlib.md5(content).digest()
    return [int.from_bytes(h[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(dims)]


def fake_features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: binary content -> (n_bytes, checksum, feat[4])."""
    for pdf in batches:
        content = pdf["content"]
        yield pd.DataFrame(
            {
                "id": pdf["id"],
                "modality": pdf["modality"],
                "n_bytes": content.map(len),
                "checksum": content.map(lambda b: hashlib.md5(b).hexdigest()),
                "feat": content.map(_fake_feature_vector),
            }
        )


def extract_features(multimodal_df: DataFrame) -> DataFrame:
    """Binary table -> feature table via Arrow-batched mapInPandas.

    Input columns: id (bigint), modality (string), content (binary).
    The binary column is consumed inside the stage and never shuffled.
    """
    return multimodal_df.select("id", "modality", "content").mapInPandas(
        fake_features_batches, FEATURE_SCHEMA
    )


DECODED_SCHEMA = (
    "id bigint, modality string, n_bytes bigint, checksum string, decode_ok boolean, "
    "kind string, width int, height int, channels int, bit_depth int, "
    "mean_luminance double, sample_rate int, duration_s double, rms double"
)

_DECODED_NULLS = {
    k: None
    for k in (
        "kind width height channels bit_depth mean_luminance "
        "sample_rate duration_s rms"
    ).split()
}


def _decode_one(content: bytes) -> dict:
    """Try each stdlib decoder; undecodable blobs yield decode_ok=false."""
    for dec in (decode_image, decode_audio):
        try:
            d = dec(content)
        except ValueError:
            continue
        except Exception:  # corrupt member mid-decode: survive, don't fail the task
            break
        return {**_DECODED_NULLS, **d, "decode_ok": True}
    return {**_DECODED_NULLS, "decode_ok": False}


def decoded_features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: binary content -> typed decoded metadata.

    A corpus-scale decode job must survive corrupt/foreign members: rows
    neither decoder accepts come back with ``decode_ok=false`` and null
    features instead of failing the task.
    """
    for pdf in batches:
        content = pdf["content"]
        decoded = [_decode_one(b) for b in content]
        out = {
            "id": pdf["id"],
            "modality": pdf["modality"],
            "n_bytes": content.map(len),
            "checksum": content.map(lambda b: hashlib.md5(b).hexdigest()),
        }
        for field in ("decode_ok", *_DECODED_NULLS):
            out[field] = [d[field] for d in decoded]
        yield pd.DataFrame(out)


def extract_features_decoded(multimodal_df: DataFrame) -> DataFrame:
    """Binary table -> real decoded metadata via Arrow-batched mapInPandas.

    Same plumbing contract as :func:`extract_features` (binary consumed
    inside the stage, only typed features leave it); the decoders are the
    stdlib PNG/WAV ones above.
    """
    return multimodal_df.select("id", "modality", "content").mapInPandas(
        decoded_features_batches, DECODED_SCHEMA
    )


def documents_as_multimodal(documents: DataFrame) -> DataFrame:
    """Adapter for tests: treat document text bytes as opaque blobs."""
    source = F.col("source") if "source" in documents.columns else F.lit("")
    return documents.select(
        F.col("doc_id").alias("id"),
        F.lit("text").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.create_map(F.lit("source"), source).alias("meta"),
    )


# ---- resize (real, stdlib PNG round-trip) ---------------------------------

def encode_png(arr) -> bytes:
    """Minimal PNG writer (8-bit, filter None, one IDAT) — the re-encode
    half of the stdlib round-trip ``resize_image`` needs."""
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_pixels(content: bytes):
    """Full pixel decode of a PNG -> (h, w, c) uint8 array (the shared
    pixel pass behind resize_image and dhash_image).  Covers 8-bit
    greyscale/RGB(+alpha), PALETTE (PLTE indexing -> RGB, 8-bit and
    1/2/4-bit indices), 16-bit layouts (high-byte downsample — the
    standard 16->8 reduction, exact for the perceptual stages this
    feeds), 1/2/4-bit greyscale (scaled to the 8-bit range), and
    Adam7-INTERLACED 8/16-bit layouts (r11).  Raises ValueError for
    non-PNG input, interlaced sub-byte corners, and images past the
    bomb-guard ceiling."""
    import numpy as np

    meta = decode_image(content)  # validates + returns dims
    bit_depth = meta["bit_depth"]
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {bit_depth}")
    # re-walk the chunks for the pixel pass
    pos = 8
    idat = bytearray()
    plte = b""
    interlace = 0
    color_type = None
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            if len(data) < 13:
                raise ValueError("malformed PNG (truncated IHDR)")
            color_type = data[9]
            interlace = data[12]
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if meta["channels"] is None:
        raise ValueError("pixel decode needs a valid color type")
    if interlace and bit_depth < 8:
        raise ValueError("interlaced sub-byte PNGs not supported")
    w, h, c = meta["width"], meta["height"], meta["channels"]

    def subbyte_samples():
        # filters see the PACKED bytes (bpp = 1); unpack afterwards
        stride = (w * bit_depth + 7) // 8
        if h * (stride + 1) > _MAX_RAW_BYTES:
            raise ValueError("image exceeds the decode size ceiling")
        raw = _inflate(idat, h * (stride + 1))
        if len(raw) < h * (stride + 1):
            raise ValueError("truncated PNG pixel data")
        return _unpack_subbyte(_unfilter_raw(raw, h, stride, 1), w, bit_depth)

    if color_type == 3:  # palette: PLTE indices (1/2/4/8-bit)
        if len(plte) < 3 or len(plte) % 3:
            raise ValueError("palette PNG without a valid PLTE chunk")
        if bit_depth == 8:
            idx = (
                _adam7_deinterlace(idat, w, h, 1)
                if interlace
                else _png_unfilter(idat, w, h, 1)
            )
            if idx is None:
                raise ValueError("image exceeds the decode size ceiling")
        else:
            idx = subbyte_samples()
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx.reshape(h, w)]  # (h, w, 3)
    if bit_depth < 8:  # sub-byte greyscale: scale samples to 8-bit
        if color_type != 0:
            raise ValueError("sub-byte PNGs are greyscale or palette only")
        scale = 255 // ((1 << bit_depth) - 1)  # exact: 255/85/17
        return (subbyte_samples() * np.uint8(scale)).reshape(h, w, 1)
    # PNG's filter distance is bytes-per-pixel, so a 16-bit image
    # unfilters exactly like an 8-bit one with 2x the channels; the
    # big-endian high byte of each sample is then the 8-bit downsample
    bpp_channels = c * (bit_depth // 8)
    rows = (
        _adam7_deinterlace(idat, w, h, bpp_channels)
        if interlace
        else _png_unfilter(idat, w, h, bpp_channels)
    )
    if rows is None:
        raise ValueError("image exceeds the decode size ceiling")
    if bit_depth == 16:
        return rows.reshape(h, w, c, 2)[..., 0]
    return rows.reshape(h, w, c)


def image_pixels(content: bytes):
    """Full pixel decode of a PNG, JPEG, GIF, or BMP -> (h, w, c) uint8
    — the shared dispatch behind resize_image and dhash_image.  Raises
    ValueError for anything no decoder fully decodes."""
    if content[:2] == _JPEG_MAGIC:
        from outpost_spark.ops.jpeg import decode_jpeg

        return decode_jpeg(content)
    if content[:6] in _GIF_MAGICS:
        from outpost_spark.ops.gif import decode_gif

        return decode_gif(content)
    from outpost_spark.ops import bmp as _bmp

    if _bmp.is_bmp(content):
        return _bmp.decode_bmp(content)
    from outpost_spark.ops import tiff as _tiff

    if _tiff.is_tiff(content):
        return _tiff.decode_tiff(content)
    return _png_pixels(content)


def resize_image(content: bytes, scale: float) -> bytes:
    """Nearest-neighbor resize of a PNG, JPEG, or GIF, re-encoded in
    the INPUT's format (PNG in -> 8-bit PNG out; JPEG in -> 4:4:4 q90
    JPEG out; GIF in -> exact-palette GIF out, always <= 256 colors
    since nearest-neighbor only samples the input palette) — decode via
    the shared bounded pixel pass (PNG palette expanded to RGB, 16-bit
    downsampled), index-sample, re-encode.  Raises ValueError for
    undecodable inputs and for images past the bomb-guard ceiling."""
    import numpy as np

    px = image_pixels(content)
    h, w = px.shape[0], px.shape[1]
    ow = max(1, int(w * scale))
    oh = max(1, int(h * scale))
    ys = (np.arange(oh) * (h / oh)).astype(int).clip(0, h - 1)
    xs = (np.arange(ow) * (w / ow)).astype(int).clip(0, w - 1)
    out = px[ys][:, xs]
    if content[:2] == _JPEG_MAGIC:
        from outpost_spark.ops.jpeg import encode_jpeg

        return encode_jpeg(out, quality=90)
    if content[:6] in _GIF_MAGICS:
        from outpost_spark.ops.gif import encode_gif

        return encode_gif(out)
    from outpost_spark.ops import bmp as _bmp

    if _bmp.is_bmp(content):
        return _bmp.encode_bmp(out)
    from outpost_spark.ops import tiff as _tiff

    if _tiff.is_tiff(content):
        return _tiff.encode_tiff(out)
    return encode_png(out)


# ---- perceptual dedup (dHash over the stdlib PNG decoder) ------------------

def dhash_image(content: bytes, *, hash_size: int = 8) -> int:
    """Perceptual difference hash (dHash, the standard 64-bit variant):
    decode PNG -> luminance -> block-mean reduce to
    ``hash_size x (hash_size+1)`` -> bit b set iff cell[y][x+1] >
    cell[y][x], row-major.  Near-identical images (small edits,
    re-encodes, minor noise) land within a few bits; unrelated images
    differ in ~32.  PNG and baseline JPEG both fingerprint through the
    shared ``image_pixels`` pass — a PNG and its JPEG re-encode hash
    within a couple of bits, so cross-format near-dups pair up.
    Returned as a SIGNED 64-bit int (two's complement) so it flows
    through Spark long columns and ``bit_count(xor)`` unchanged.
    Raises ValueError on anything the stdlib decoders can't fully
    decode."""
    import numpy as np

    px = image_pixels(content)
    return _dhash_pixels(px, hash_size=hash_size)


def _dhash_pixels(px, *, hash_size: int = 8) -> int:
    """The dHash core on decoded pixels ((h, w, c) uint8) — shared by
    :func:`dhash_image` (decodes bytes first) and the video frame-hash
    stage (hashes already-decoded animation frames, no re-encode)."""
    import numpy as np

    if not 1 <= hash_size <= 8:
        # bits = hash_size^2 must fit the signed-64 two's-complement
        # fold below and Spark's long column; >8 would silently overflow
        raise ValueError(f"hash_size must be in 1..8, got {hash_size}")
    h, w, c = px.shape
    if c >= 3:
        lum = px[..., :3].astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    else:
        lum = px[..., 0].astype(np.float64)
    gh, gw = hash_size, hash_size + 1
    if h < gh or w < gw:
        raise ValueError(f"image smaller than the {gh}x{gw} dhash grid")
    ys = np.linspace(0, h, gh + 1).astype(int)
    xs = np.linspace(0, w, gw + 1).astype(int)
    # block means via two reduceat passes (one numpy call per axis)
    # instead of gh*gw per-cell .mean() slices — ~2x per-image on the
    # thumbnail sizes a corpus decode stage actually sees
    sums = np.add.reduceat(np.add.reduceat(lum, ys[:-1], axis=0), xs[:-1], axis=1)
    counts = np.outer(np.diff(ys), np.diff(xs))
    grid = sums / counts
    val = 0
    for bit in (grid[:, 1:] > grid[:, :-1]).flatten():
        val = (val << 1) | int(bit)
    if val >= 1 << 63:
        val -= 1 << 64  # two's complement into Spark's signed long
    return val


DHASH_SCHEMA = "id long, dhash long, dhash_ok boolean"


def image_dhash(multimodal_df: DataFrame, *, hash_size: int = 8) -> DataFrame:
    """(id, content) -> (id, dhash, dhash_ok) via mapInPandas: corrupt
    or undecodable members yield ``dhash_ok=false`` rows, never task
    failures — the same tolerance contract as the decode stage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, oks = [], [], []
            for i, content in zip(pdf["id"], pdf["content"]):
                try:
                    hv = dhash_image(bytes(content), hash_size=hash_size)
                    ok = True
                except Exception:
                    hv, ok = None, False
                ids.append(i)
                hashes.append(hv)
                oks.append(ok)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "dhash": pd.array(hashes, dtype="Int64"),
                    "dhash_ok": oks,
                }
            )

    return multimodal_df.select("id", "content").mapInPandas(gen, DHASH_SCHEMA)


def dhash_canonical_survivors(
    multimodal_df: DataFrame,
    *,
    max_hamming: int = 4,
    bands: int | None = None,
    hash_size: int = 8,
) -> DataFrame:
    """Perceptual image dedup END TO END: dHash pairs -> connected
    components -> each near-dup cluster collapsed to its minimum-id
    member — the same survivor collapse text fuzzy dedup uses
    (ops/dedup.py::dedup_keep_canonical), so the image corpus gets the
    full pairs->clusters->canonical chain, not just the pair list.
    Undecodable members carry no fingerprint, join no pairs, and pass
    through untouched (the tolerant-decode contract).  Output: (id) of
    the surviving images."""
    from outpost_spark.ops.dedup import dedup_keep_canonical

    pairs = dhash_pairs(
        multimodal_df, max_hamming=max_hamming, bands=bands, hash_size=hash_size
    )
    return dedup_keep_canonical(multimodal_df.select("id"), pairs, "id")


def _planted_noise_pixels(seed: int, tweak: int, *, width: int = 18, height: int = 16):
    """md5-derived greyscale pixels keyed by ``seed`` with a
    single-pixel ``tweak`` perturbation — shared by the PNG and BMP
    noise plants so their dHashes match exactly (both lossless)."""
    import numpy as np

    rows = []
    for y in range(height):
        raw = (
            hashlib.md5(f"img|{seed}|{y}".encode()).digest()
            + hashlib.md5(f"img|{seed}|{y}|b".encode()).digest()
        )
        rows.append(list(raw[:width]))
    px = np.array(rows, dtype=np.uint8).reshape(height, width, 1)
    px[tweak % height, (tweak * 7) % width, 0] ^= 3
    return px


def planted_png(seed: int, tweak: int, *, width: int = 18, height: int = 16) -> bytes:
    """Deterministic synthetic PNG: md5-derived greyscale pixels keyed by
    ``seed`` (same seed = near-identical image) with a single-pixel
    ``tweak`` perturbation (the 'near' in near-duplicate).  Distinct
    seeds give statistically independent pixels, so their dHashes sit
    ~32 bits apart while same-seed variants sit within a couple."""
    return encode_png(_planted_noise_pixels(seed, tweak, width=width, height=height))


def planted_bmp(seed: int, tweak: int, *, width: int = 18, height: int = 16) -> bytes:
    """The BMP twin of :func:`planted_png` — same pixels, 24-bit DIB
    container.  Both encodings are lossless over the grey plant, so the
    PNG and BMP of one (seed, tweak) dHash IDENTICALLY (equal RGB
    triples have the grey value as luminance)."""
    from outpost_spark.ops.bmp import encode_bmp

    return encode_bmp(_planted_noise_pixels(seed, tweak, width=width, height=height))


def planted_tiff(
    seed: int, tweak: int, *, width: int = 18, height: int = 16,
    packbits: bool = False,
) -> bytes:
    """The TIFF twin of :func:`planted_png` (r14) — the same noise
    pixels as an RGB baseline TIFF (equal triples, so the luminance —
    and therefore the dHash — matches the PNG/BMP twins exactly);
    ``packbits`` exercises the PackBits strip path distributed."""
    import numpy as np

    from outpost_spark.ops.tiff import encode_tiff

    px = _planted_noise_pixels(seed, tweak, width=width, height=height)
    return encode_tiff(np.repeat(px, 3, axis=2), packbits=packbits)


def _planted_cells(seed: int, tweak: int, *, rows: int = 8, cols: int = 9):
    """JPEG-robust planted pixels: an (8*rows, 8*cols) greyscale image of
    8x8 constant cells whose levels are md5-derived multiples of 16
    (20..228) keyed by ``seed``.  Cells align exactly with JPEG's 8x8
    blocks, so a constant cell carries only a DC coefficient and
    survives quantization within ±1 — adjacent-cell contrasts of >=16
    therefore make the dHash identical across PNG and JPEG encodes of
    the same pixels.  ``tweak`` re-levels ONE cell (<=2 dHash bits), so
    same-seed variants sit within Hamming 4 of each other while
    distinct seeds are ~32 apart."""
    import numpy as np

    ks = np.empty((rows, cols), dtype=np.int64)
    for y in range(rows):
        d = hashlib.md5(f"jimg|{seed}|{y}".encode()).digest()
        for x in range(cols):
            ks[y, x] = d[x] % 14
    ty, tx = tweak % rows, (tweak * 3 + 1) % cols
    ks[ty, tx] = (ks[ty, tx] + 1 + (tweak % 12)) % 14
    levels = (20 + 16 * ks).astype(np.uint8)
    return np.repeat(np.repeat(levels, 8, axis=0), 8, axis=1)[..., None]


def planted_jpeg(
    seed: int,
    tweak: int,
    *,
    quality: int = 90,
    progressive: bool = False,
    successive: bool = False,
) -> bytes:
    """Deterministic synthetic JPEG near-duplicate (same seed/tweak
    semantics as :func:`planted_png`, via the JPEG-robust cell plant);
    ``progressive`` emits the SOF2 spectral-selection encoding of the
    SAME coefficients, and ``successive`` upgrades that to the full
    successive-approximation script (r12) — all variants decode
    pixel-identically."""
    from outpost_spark.ops.jpeg import encode_jpeg

    return encode_jpeg(
        _planted_cells(seed, tweak)[..., 0],
        quality=quality,
        progressive=progressive,
        successive=successive,
    )


def planted_gif(seed: int, tweak: int, *, interlace: bool = False) -> bytes:
    """Deterministic synthetic GIF near-duplicate (same seed/tweak
    semantics as :func:`planted_jpeg`, via the same cell plant).  GIF
    is lossless over the <= 14-level palette, so the dHash matches the
    PNG twin EXACTLY; ``interlace`` writes the four-pass row order."""
    from outpost_spark.ops.gif import encode_gif

    return encode_gif(_planted_cells(seed, tweak)[..., 0], interlace=interlace)


def _spread_ids(ids: DataFrame) -> DataFrame:
    """Round-robin the skinny id projection across the cluster before
    per-row synthesis: the tables behind the planted entries are
    single-file scans (one task), which would serialize the expensive
    Python generation stage onto one core.  Reuses the shingling guard
    (``inputFiles``-based estimate, no ``.rdd`` plan conversion): the
    shuffle moves 8 bytes/row and only fires when the scan's parallelism
    is below the cluster's, so it is a no-op at production scale."""
    from outpost_spark.ops.dedup import _parallelize_narrow_input

    return _parallelize_narrow_input(ids)


def planted_image_corpus(
    ids_df: DataFrame,
    *,
    id_col: str = "doc_id",
    group: int = 4,
    corrupt_every: int = 29,
    jpeg_groups: bool = True,
) -> DataFrame:
    """ids -> (id, content) of planted images: ids sharing ``id // group``
    get near-identical images (the planted duplicate groups a perceptual
    dedup must find), and every ``corrupt_every``-th id carries junk
    bytes instead of an image (the corrupt-member tolerance probe).
    With ``jpeg_groups`` (default), every third group (gid % 3 == 2) is
    a MIXED-FORMAT group — the same cell-plant pixels encoded as PNG for
    even ids, sequential JPEG for ids = 1 mod 4, and PROGRESSIVE JPEG
    (SOF2) for ids = 3 mod 4 — so the perceptual dedup is exercised
    ACROSS formats and scan modes: a near-dup pair only surfaces if the
    sequential AND progressive JPEG decode paths both produce the same
    fingerprint the PNG path does.  Groups with gid % 3 == 1 are the
    GIF twins (round 12): the same cell-plant pixels as PNG for even
    ids, GIF for odd ids (INTERLACED for ids = 3 mod 4), so the decode /
    resize / dedup chain witnesses all three crawl formats.  Generated
    executor-side in mapInPandas — nothing collects, the corpus scales
    with the id table."""

    def member(i: int) -> bytes:
        gid, tweak = i // group, i % group
        if jpeg_groups and gid % 3 == 2:
            if i % 2:
                # progressive members alternate between the spectral-
                # selection script (i = 7 mod 8) and the full
                # successive-approximation script (i = 3 mod 8, r12)
                return planted_jpeg(
                    gid, tweak, progressive=i % 4 == 3, successive=i % 8 == 3
                )
            return encode_png(_planted_cells(gid, tweak))
        if jpeg_groups and gid % 3 == 1:
            if i % 2:
                return planted_gif(gid, tweak, interlace=i % 4 == 3)
            return encode_png(_planted_cells(gid, tweak))
        # noise groups (gid % 3 == 0): PNG/BMP/TIFF twins (r13/r14) —
        # the same md5-noise pixels as PNG for even ids; odd ids split
        # between 24-bit BMP (i = 1 mod 4) and RGB baseline TIFF
        # (i = 3 mod 4, PackBits strips for i = 3 mod 8), putting the
        # fourth AND fifth crawl formats on the value-oracled path
        if jpeg_groups and i % 2:
            if i % 4 == 3:
                return planted_tiff(gid, tweak, packbits=i % 8 == 3)
            return planted_bmp(gid, tweak)
        return planted_png(gid, tweak)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            content = [
                b"JUNK: not an image"
                if corrupt_every and i % corrupt_every == 0
                else member(i)
                for i in ids
            ]
            yield pd.DataFrame({"id": ids, "content": content})

    return _spread_ids(ids_df.select(id_col)).mapInPandas(
        gen, "id long, content binary"
    )


def dhash_pairs(
    multimodal_df: DataFrame,
    *,
    max_hamming: int = 4,
    bands: int | None = None,
    hash_size: int = 8,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: dHash fingerprints fed to
    the SAME pigeonhole Hamming band join text simhash uses
    (ops/dedup.py::hamming_banded_pairs) — zero false negatives within
    ``max_hamming``, no quadratic self-join.  Undecodable members are
    excluded (they have no fingerprint), not failed.  Output:
    (id_a, id_b, hamming)."""
    from outpost_spark.ops.dedup import hamming_banded_pairs

    # the fingerprint width follows the grid: hash_size^2 comparison
    # bits (dhash_image validates hash_size <= 8, so bits <= 64 and the
    # Int64 column / two's-complement fold stay exact); the band join
    # defaults to the minimal max_hamming+1 unequal-width bands — the
    # widest segments the pigeonhole bound allows (best selectivity)
    bits = hash_size * hash_size
    fp = image_dhash(multimodal_df, hash_size=hash_size).filter(
        F.col("dhash_ok")
    )
    return hamming_banded_pairs(
        fp, "id", "dhash", bits=bits, max_hamming=max_hamming, bands=bands
    )


RESIZED_SCHEMA = (
    "id long, width int, height int, out_width int, out_height int, "
    "resize_ok boolean, content binary"
)


def resize_images(multimodal_df: DataFrame, *, scale: float = 0.5) -> DataFrame:
    """Corpus resize stage: binary PNGs in, resized binary PNGs out, via
    Arrow-batched ``mapInPandas`` — the thumbnail/tile prep step of an
    image-training pipeline.  Rows the decoder rejects come back
    ``resize_ok=false`` with null content (a corpus-scale job must
    survive corrupt members); the binary never leaves the stage except
    as its resized successor."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "id": pdf["id"], "width": [], "height": [],
                "out_width": [], "out_height": [], "resize_ok": [],
                "content": [],
            }
            for b in pdf["content"]:
                try:
                    meta = decode_image(b)
                    resized = resize_image(b, scale)
                    out_meta = decode_image(resized)
                    out["width"].append(meta["width"])
                    out["height"].append(meta["height"])
                    out["out_width"].append(out_meta["width"])
                    out["out_height"].append(out_meta["height"])
                    out["resize_ok"].append(True)
                    out["content"].append(resized)
                except (ValueError, KeyError, struct.error):
                    out["width"].append(None)
                    out["height"].append(None)
                    out["out_width"].append(None)
                    out["out_height"].append(None)
                    out["resize_ok"].append(False)
                    out["content"].append(None)
            yield pd.DataFrame(out)

    return multimodal_df.select("id", "content").mapInPandas(gen, RESIZED_SCHEMA)


# ---- video frame sampling --------------------------------------------------

_RVID_MAGIC = b"RVID"


def encode_rawvideo(frames) -> bytes:
    """Pack (n, h, w, 3) uint8 frames into the minimal RVID container —
    magic + dims + frame count + concatenated raw RGB24.  The in-tree
    stand-in for a real codec (see :func:`sample_frames`)."""
    n, h, w, c = frames.shape
    assert c == 3
    return (
        _RVID_MAGIC
        + struct.pack(">III", w, h, n)
        + frames.tobytes()
    )


def decode_rawvideo(content: bytes):
    """(width, height, n_frames, frames ndarray) from an RVID container;
    ValueError on anything else (foreign/corrupt blobs), with the same
    allocation ceiling as the PNG path."""
    import numpy as np

    if len(content) < 16 or content[:4] != _RVID_MAGIC:
        raise ValueError("not an RVID container")
    w, h, n = struct.unpack(">III", content[4:16])
    need = w * h * 3 * n
    if need > _MAX_RAW_BYTES:
        raise ValueError("video exceeds the decode size ceiling")
    if len(content) - 16 < need:
        raise ValueError("truncated RVID payload")
    frames = np.frombuffer(content, dtype=np.uint8, count=need, offset=16)
    return w, h, n, frames.reshape(n, h, w, 3)


def decode_video(content: bytes):
    """Default :func:`sample_frames` decoder: RVID raw containers,
    animated GIFs (``ops/gif.py::decode_gif_frames``, r12), or
    AVI/Motion-JPEG (``ops/avi.py::decode_avi`` — a RIFF chunk walk
    over the in-tree JPEG decoder, r13) ->
    (width, height, n_frames, frames (n, h, w, 3)).  Anything else
    (MP4/H.264, WebM/VP9 — entropy-coded inter-frame codecs needing a
    real codec library) raises ``ValueError``."""
    if content[:6] in _GIF_MAGICS:
        from outpost_spark.ops.gif import decode_gif_frames

        return decode_gif_frames(content)
    if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        from outpost_spark.ops.avi import decode_avi

        return decode_avi(content)
    return decode_rawvideo(content)


FRAMES_SCHEMA = (
    "id long, frame_idx int, width int, height int, n_frames int, "
    "decode_ok boolean, frame binary"
)


def sample_frames(
    multimodal_df: DataFrame,
    *,
    every_k: int = 10,
    decoder=None,
) -> DataFrame:
    """Uniform frame sampling over a video column: one output row per
    kept frame (idx % every_k == 0), frame payload re-encoded as PNG so
    every downstream image op (resize, decode, featurize) composes.

    ``decoder`` is any ``bytes -> (w, h, n_frames, frames ndarray)``
    callable — inject the real codec (pyav/ffmpeg) in deployments; the
    default (:func:`decode_video`) parses RVID raw containers AND real
    ANIMATED GIFs (full disposal-model compositing via
    ``ops/gif.py::decode_gif_frames`` — the video-ish format crawl
    corpora actually carry; MP4/WebM still need an injected codec).
    Undecodable rows emit ONE row with ``decode_ok=false``.

    Scale shape: the row explosion happens INSIDE the Arrow stage (the
    fat source blob never duplicates per frame in the plan); output
    carries n/every_k compressed frames per video.
    """
    dec = decoder or decode_video

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "id", "frame_idx", "width", "height", "n_frames",
                "decode_ok", "frame",
            )}
            for vid, b in zip(pdf["id"], pdf["content"]):
                try:
                    w, h, n, frames = dec(b)
                except (ValueError, KeyError, struct.error):
                    rows["id"].append(vid)
                    rows["frame_idx"].append(None)
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["n_frames"].append(None)
                    rows["decode_ok"].append(False)
                    rows["frame"].append(None)
                    continue
                for idx in range(0, n, every_k):
                    rows["id"].append(vid)
                    rows["frame_idx"].append(idx)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_frames"].append(n)
                    rows["decode_ok"].append(True)
                    rows["frame"].append(encode_png(frames[idx]))
            yield pd.DataFrame(rows)

    return multimodal_df.select("id", "content").mapInPandas(gen, FRAMES_SCHEMA)


# ---- audio: FFT spectral features ------------------------------------------

AUDIO_FEATURES_SCHEMA = (
    "id long, audio_ok boolean, sample_rate int, duration_s double, "
    "n_frames int, dominant_freq_hz double, spectral_centroid_hz double, "
    "rms double"
)


def audio_spectral_features(
    content: bytes, *, n_fft: int = 512, hop: int = 256
) -> dict:
    """Real DSP over a 16-bit PCM WAV: Hann-windowed rFFT frames ->
    mean power spectrum -> dominant frequency (argmax bin, DC excluded),
    spectral centroid, RMS.  Multi-channel audio is mixed to mono.
    numpy only — no codec/DSP library.  ``dominant_freq_hz`` is
    bin-quantized at rate/n_fft resolution, which makes it EXACTLY
    derivable for bin-centered planted tones (the value-oracle trick);
    the centroid is the leakage-weighted average real pipelines gate on.
    Raises ``ValueError`` for non-WAV input."""
    import numpy as np

    arr, rate = _wav_samples(content)
    n = len(arr)
    out = {
        "sample_rate": int(rate),
        "duration_s": (n / rate) if rate else 0.0,
        "n_frames": 0,
        "dominant_freq_hz": None,
        "spectral_centroid_hz": None,
        "rms": None,
    }
    if n == 0:
        return out
    mono = arr.astype(np.float64).mean(axis=1) / 32768.0
    out["rms"] = float(np.sqrt(np.mean(mono * mono)))
    if n < n_fft:  # zero-pad a single frame
        mono = np.pad(mono, (0, n_fft - n))
        n = n_fft
    n_frames = 1 + (n - n_fft) // hop
    out["n_frames"] = int(n_frames)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = mono[idx] * np.hanning(n_fft)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    spec = power.mean(axis=0)
    k = int(np.argmax(spec[1:])) + 1  # exclude DC
    out["dominant_freq_hz"] = float(k * (rate / n_fft))
    freqs = np.arange(len(spec)) * (rate / n_fft)
    total = float(spec.sum())
    if total > 0:
        out["spectral_centroid_hz"] = float((freqs * spec).sum() / total)
    return out


def extract_audio_features(
    multimodal_df: DataFrame, *, n_fft: int = 512, hop: int = 256
) -> DataFrame:
    """(id, content) -> spectral feature rows via Arrow-batched
    mapInPandas — the audio analog of the image decode stage, with the
    same corrupt-member tolerance (``audio_ok=false`` rows, never task
    failures)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nulls = {
            k: None
            for k in (
                "sample_rate duration_s n_frames dominant_freq_hz "
                "spectral_centroid_hz rms"
            ).split()
        }
        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"], pdf["content"]):
                try:
                    feats = audio_spectral_features(
                        bytes(b), n_fft=n_fft, hop=hop
                    )
                    rows.append({"id": i, "audio_ok": True, **feats})
                except Exception:
                    rows.append({"id": i, "audio_ok": False, **nulls})
            yield pd.DataFrame(rows)

    return multimodal_df.select("id", "content").mapInPandas(
        gen, AUDIO_FEATURES_SCHEMA
    )


def planted_tone_wav(
    seed: int, *, rate: int = 8000, n_fft: int = 512, n_samples: int = 4000
) -> bytes:
    """Deterministic pure sine WAV whose frequency sits EXACTLY on FFT
    bin ``20 + (seed % 30) * 4`` of an ``n_fft``-point transform at
    ``rate`` — so ``dominant_freq_hz`` is bin * rate/n_fft, an exact
    binary float both Spark and DuckDB reproduce digit-for-digit."""
    import numpy as np

    k = 20 + (seed % 30) * 4
    f = k * (rate / n_fft)
    t = np.arange(n_samples) / rate
    samples = np.round(0.5 * 32767 * np.sin(2 * np.pi * f * t)).astype("<i2")
    return encode_wav(samples, rate)


def planted_audio_corpus(
    ids_df: DataFrame, *, id_col: str = "doc_id", corrupt_every: int = 29
) -> DataFrame:
    """ids -> (id, content) of planted bin-centered tone WAVs; every
    ``corrupt_every``-th id is junk bytes (the tolerance probe)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            content = [
                b"JUNK: not audio"
                if corrupt_every and i % corrupt_every == 0
                else planted_tone_wav(i)
                for i in ids
            ]
            yield pd.DataFrame({"id": ids, "content": content})

    return _spread_ids(ids_df.select(id_col)).mapInPandas(
        gen, "id long, content binary"
    )


def audio_fingerprint(
    content: bytes,
    *,
    n_fft: int = 512,
    grid_t: int = 8,
    n_bands: int = 9,
    fmax_hz: float | None = None,
) -> int:
    """64-bit perceptual audio fingerprint — the audio analog of
    :func:`dhash_image` (reference behavior: the near-dup chain the
    image modality already has, L75): mix to mono -> NON-OVERLAPPING
    Hann-windowed rFFT frames -> per-frame band energies (``n_bands``
    equal slices of the non-DC spectrum, mean power per band) ->
    block-mean reduce over time to ``grid_t`` rows -> bit b set iff
    band[t][x+1] > band[t][x], row-major, two's-complement signed so it
    flows through Spark long columns and ``bit_count(xor)`` unchanged.

    Properties: VOLUME-INVARIANT (scaling every sample scales every
    band energy equally, so no sign-of-delta flips), robust to small
    spectral edits (a local level change flips only the adjacent-band
    comparisons it touches), and ~32 bits apart for unrelated clips —
    the same near/far contract the image dHash gives, so the SAME
    pigeonhole Hamming band join (ops/dedup.py::hamming_banded_pairs)
    pairs near-duplicate clips with zero false negatives within the
    distance.  Requires ``grid_t * n_fft`` samples (~0.5 s at 8 kHz
    with the defaults); shorter clips raise ``ValueError`` like any
    other unfingerprint-able input.

    ``fmax_hz`` anchors the bands to a FIXED frequency range (0,
    fmax_hz] instead of the clip's own (0, Nyquist] — with it set, a
    clip and its RESAMPLED copy compute energies over the same Hz
    bands (time cells are duration-relative already), so cross-rate
    near-dups land within a few bits the way cross-format image
    re-encodes do.  Clips whose Nyquist is below ``fmax_hz`` raise
    (they cannot represent the band range)."""
    import numpy as np

    bits = grid_t * (n_bands - 1)
    if not 1 <= bits <= 64:
        raise ValueError(
            f"grid_t * (n_bands - 1) must be in 1..64, got {bits}"
        )
    arr, rate = _wav_samples(content)
    n = len(arr)
    if n < grid_t * n_fft:
        raise ValueError(
            f"clip shorter than the {grid_t}x{n_fft}-sample fingerprint grid"
        )
    mono = arr.astype(np.float64).mean(axis=1) / 32768.0
    n_frames = n // n_fft
    frames = mono[: n_frames * n_fft].reshape(n_frames, n_fft)
    power = np.abs(np.fft.rfft(frames * np.hanning(n_fft)[None, :], axis=1)) ** 2
    power = power[:, 1:]  # drop DC — overall loudness offset, not timbre
    nbins = power.shape[1]
    if fmax_hz is not None:
        if rate / 2 < fmax_hz:
            raise ValueError(
                f"clip rate {rate} cannot represent bands up to {fmax_hz} Hz"
            )
        # bins 1..nbins cover (0, rate/2]; keep those within fmax_hz
        nbins = int(fmax_hz * n_fft / rate)
        if nbins < n_bands:
            # silently widening past fmax_hz would break the fixed-Hz
            # cross-rate comparability guarantee (ADVICE r13)
            raise ValueError(
                f"rate {rate} too high to resolve {n_bands} bands within "
                f"{fmax_hz} Hz at n_fft={n_fft}"
            )
        power = power[:, :nbins]
    # band means then time-cell means, via reduceat like the image dHash
    be = np.linspace(0, nbins, n_bands + 1).astype(int)
    bands = np.add.reduceat(power, be[:-1], axis=1) / np.diff(be)[None, :]
    te = np.linspace(0, n_frames, grid_t + 1).astype(int)
    grid = np.add.reduceat(bands, te[:-1], axis=0) / np.diff(te)[:, None]
    val = 0
    for bit in (grid[:, 1:] > grid[:, :-1]).flatten():
        val = (val << 1) | int(bit)
    val <<= 64 - bits  # left-align so bits=64 band splits stay meaningful
    if val >= 1 << 63:
        val -= 1 << 64
    return val


AFP_SCHEMA = "id long, afp long, afp_ok boolean"


def audio_fingerprints(
    multimodal_df: DataFrame,
    *,
    n_fft: int = 512,
    grid_t: int = 8,
    n_bands: int = 9,
    fmax_hz: float | None = None,
) -> DataFrame:
    """(id, content) -> (id, afp, afp_ok) via Arrow-batched mapInPandas:
    corrupt / non-WAV / too-short members yield ``afp_ok=false`` rows,
    never task failures — the same tolerance contract as
    :func:`image_dhash`.  ``fmax_hz`` anchors the bands to a fixed Hz
    range so mixed-sample-rate corpora fingerprint comparably."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps, oks = [], [], []
            for i, content in zip(pdf["id"], pdf["content"]):
                try:
                    fp = audio_fingerprint(
                        bytes(content), n_fft=n_fft, grid_t=grid_t,
                        n_bands=n_bands, fmax_hz=fmax_hz,
                    )
                    ok = True
                except Exception:
                    fp, ok = None, False
                ids.append(i)
                fps.append(fp)
                oks.append(ok)
            yield pd.DataFrame(
                {"id": ids, "afp": pd.array(fps, dtype="Int64"), "afp_ok": oks}
            )

    return multimodal_df.select("id", "content").mapInPandas(gen, AFP_SCHEMA)


def audio_fp_pairs(
    multimodal_df: DataFrame,
    *,
    max_hamming: int = 4,
    bands: int | None = None,
    fmax_hz: float | None = None,
) -> DataFrame:
    """Near-duplicate audio pairs: spectral fingerprints fed to the SAME
    pigeonhole Hamming band join text simhash and image dHash use —
    zero false negatives within ``max_hamming``, never a quadratic
    self-join.  Unfingerprint-able members are excluded, not failed.
    ``fmax_hz`` (with a slightly wider ``max_hamming``, ~6) pairs
    near-dups ACROSS sample rates — a clip and its resampled copy.
    Output: (id_a, id_b, hamming)."""
    from outpost_spark.ops.dedup import hamming_banded_pairs

    fp = audio_fingerprints(multimodal_df, fmax_hz=fmax_hz).filter(
        F.col("afp_ok")
    )
    return hamming_banded_pairs(
        fp, "id", "afp", bits=64, max_hamming=max_hamming, bands=bands
    )


def audio_fp_survivors(
    multimodal_df: DataFrame,
    *,
    max_hamming: int = 4,
    bands: int | None = None,
    fmax_hz: float | None = None,
) -> DataFrame:
    """Audio dedup END TO END: fingerprint pairs -> connected components
    -> minimum-id survivor per near-dup cluster — the same chain as
    :func:`dhash_canonical_survivors`.  Members with no fingerprint pass
    through untouched.  ``fmax_hz`` (with ``max_hamming`` ~6) collapses
    near-dups ACROSS sample rates, the mixed-rate corpus shape.
    Output: (id) of the surviving clips."""
    from outpost_spark.ops.dedup import dedup_keep_canonical

    pairs = audio_fp_pairs(
        multimodal_df, max_hamming=max_hamming, bands=bands, fmax_hz=fmax_hz
    )
    return dedup_keep_canonical(multimodal_df.select("id"), pairs, "id")


def planted_clip_wav(
    seed: int,
    tweak: int,
    *,
    rate: int = 8000,
    n_fft: int = 512,
    grid_t: int = 8,
    n_bands: int = 9,
    frames_per_cell: int = 4,
) -> bytes:
    """Deterministic synthetic WAV near-duplicate (the audio analog of
    :func:`planted_png`): per time-cell, ``n_bands`` band-center sines
    whose amplitudes follow an md5-derived RANK PERMUTATION (all levels
    distinct, so every sign-of-delta bit is tie-free and deterministic),
    with sines sitting EXACTLY on FFT bins and cells exactly aligned to
    non-overlapping frames — a Hann-windowed bin-centered sine leaks
    into only bins k-1..k+1, so each band's energy is analytically
    c * A^2 and the fingerprint bits follow the rank grid exactly.
    ``tweak`` swaps the two cells holding CONSECUTIVE rank values in
    one row — an audible spectral edit that flips at most ONE
    fingerprint bit (exactly one when the two values sit in adjacent
    bands; no other comparison's order can change, since no rank lies
    strictly between v and v+1) — so same-seed variants sit within
    Hamming 1 of the canonical member and 2 of each other, while
    distinct seeds sit ~32 apart."""
    import numpy as np

    ranks = np.empty((grid_t, n_bands), dtype=np.int64)
    for t in range(grid_t):
        d = hashlib.md5(f"aud|{seed}|{t}".encode()).digest()
        order = sorted(range(n_bands), key=lambda b: (d[b], b))
        ranks[t][order] = np.arange(n_bands)
    if tweak % 4:
        ty = tweak % grid_t
        v = (tweak * 2) % (n_bands - 1)
        p = int(np.where(ranks[ty] == v)[0][0])
        q = int(np.where(ranks[ty] == v + 1)[0][0])
        ranks[ty, p], ranks[ty, q] = ranks[ty, q], ranks[ty, p]
    amps = 150.0 * (1 + ranks)  # sum <= n_bands * 150 * n_bands < 32767
    # band-center bins of the fingerprint's equal non-DC spectrum slices
    be = np.linspace(0, n_fft // 2, n_bands + 1).astype(int)
    centers = 1 + (be[:-1] + be[1:]) // 2
    cell_len = frames_per_cell * n_fft
    i = np.arange(grid_t * cell_len)
    cell = i // cell_len
    samples = np.zeros(len(i))
    for b in range(n_bands):
        samples += amps[cell, b] * np.sin(2 * np.pi * centers[b] * i / n_fft)
    return encode_wav(np.round(samples).astype("<i2"), rate)


def planted_audio_dedup_corpus(
    ids_df: DataFrame,
    *,
    id_col: str = "doc_id",
    group: int = 4,
    corrupt_every: int = 29,
    cross_rate: bool = False,
    cross_format: bool = False,
) -> DataFrame:
    """ids -> (id, content) of planted clips: ids sharing ``id // group``
    are near-duplicate audio (rank-swap tweaks of the same spectral
    plant — the twin clips a perceptual dedup must pair), and every
    ``corrupt_every``-th id carries junk bytes (afp_ok=false tolerance
    probe).  ``cross_rate`` resamples odd ids to 16 kHz, so duplicate
    groups span SAMPLE RATES — the corpus shape the Hz-anchored
    fingerprint (``fmax_hz``) exists for.  ``cross_format`` (r14)
    re-encodes odd ids as FLAC — lossless, so a clip and its compressed
    twin fingerprint IDENTICALLY, the audio analog of the PNG/BMP/TIFF
    image twins.  Generated executor-side in mapInPandas — nothing
    collects, the corpus scales with the id table."""

    def member(i: int) -> bytes:
        clip = planted_clip_wav(i // group, i % group)
        if cross_rate and i % 2:
            clip = resample_wav(clip, target_rate=16000)
        if cross_format and i % 2:
            from outpost_spark.ops.flac import encode_flac

            arr, rate = _wav_samples(clip)
            clip = encode_flac(arr.reshape(-1), rate, channels=arr.shape[1])
        return clip

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            content = [
                b"JUNK: not audio"
                if corrupt_every and i % corrupt_every == 0
                else member(i)
                for i in ids
            ]
            yield pd.DataFrame({"id": ids, "content": content})

    return _spread_ids(ids_df.select(id_col)).mapInPandas(
        gen, "id long, content binary"
    )


def planted_gif_animation(
    seed: int, n_frames: int, *, width: int = 24, height: int = 16,
    tweak: int = 0,
) -> bytes:
    """Deterministic synthetic animated GIF: ``n_frames`` md5-derived
    few-level greyscale frames keyed by (seed, frame index) — the
    planted input for the value-oracled frame-sampling entry.
    ``tweak`` perturbs one pixel per frame (the :func:`planted_png`
    convention), so same-seed animations are NEAR-duplicates whose
    per-frame dHashes sit within a couple of bits while distinct seeds
    are ~32 apart — the planted input for the video near-dup entry."""
    import numpy as np

    from outpost_spark.ops.gif import encode_gif_animation

    frames = []
    for fi in range(n_frames):
        rows = []
        for y in range(height):
            d = (
                hashlib.md5(f"vid|{seed}|{fi}|{y}".encode()).digest()
                + hashlib.md5(f"vid|{seed}|{fi}|{y}|b".encode()).digest()
            )
            rows.append([(b % 8) * 32 + 12 for b in d[:width]])
        px = np.array(rows, dtype=np.uint8)
        if tweak:
            px[tweak % height, (tweak * 7) % width] ^= 3
        frames.append(px)
    return encode_gif_animation(np.stack(frames))


def planted_video_corpus(
    ids_df: DataFrame, *, id_col: str = "doc_id", corrupt_every: int = 29
) -> DataFrame:
    """ids -> (id, content) of planted ANIMATED GIFs with
    ``n_frames = 2 + id % 6``; every ``corrupt_every``-th id carries
    junk bytes (the corrupt-member tolerance probe).  Generated
    executor-side in mapInPandas — nothing collects."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            content = [
                b"JUNK: not a video"
                if corrupt_every and i % corrupt_every == 0
                else planted_gif_animation(i, 2 + i % 6)
                for i in ids
            ]
            yield pd.DataFrame({"id": ids, "content": content})

    return _spread_ids(ids_df.select(id_col)).mapInPandas(
        gen, "id long, content binary"
    )


def planted_avi_video(
    seed: int, n_frames: int, *, quality: int = 90, progressive: bool = False
) -> bytes:
    """Deterministic synthetic AVI/MJPEG: ``n_frames`` JPEG-robust
    cell-planted frames (the :func:`_planted_cells` plant — 8x8
    constant cells aligned to JPEG blocks, so q90 decode round-trips
    within ±1) keyed by (seed, frame index)."""
    import numpy as np

    from outpost_spark.ops.avi import encode_avi_mjpeg

    frames = np.stack(
        [_planted_cells(seed * 7 + fi, 0)[..., 0] for fi in range(n_frames)]
    )
    return encode_avi_mjpeg(frames, fps=5, quality=quality, progressive=progressive)


def planted_avi_corpus(
    ids_df: DataFrame, *, id_col: str = "doc_id", corrupt_every: int = 29
) -> DataFrame:
    """ids -> (id, content) of planted AVI/MJPEG videos with
    ``n_frames = 2 + id % 5``; odd ids carry PROGRESSIVE (SOF2) JPEG
    frames, so the container path exercises both scan modes; every
    ``corrupt_every``-th id is junk bytes.  Executor-side generation,
    nothing collects."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            content = [
                b"JUNK: not a video"
                if corrupt_every and i % corrupt_every == 0
                else planted_avi_video(i, 2 + i % 5, progressive=bool(i % 2))
                for i in ids
            ]
            yield pd.DataFrame({"id": ids, "content": content})

    return _spread_ids(ids_df.select(id_col)).mapInPandas(
        gen, "id long, content binary"
    )


def planted_video_dedup_corpus(
    ids_df: DataFrame,
    *,
    id_col: str = "doc_id",
    group: int = 4,
    corrupt_every: int = 29,
) -> DataFrame:
    """ids -> (id, content) of planted animations: ids sharing
    ``id // group`` are NEAR-duplicate animated GIFs (one-pixel-per-
    frame tweaks of the same frame sequence, n_frames = 2 + gid % 5 —
    the twin videos a sequence-level dedup must pair), every
    ``corrupt_every``-th id is junk bytes.  Executor-side generation,
    nothing collects."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            content = [
                b"JUNK: not a video"
                if corrupt_every and i % corrupt_every == 0
                else planted_gif_animation(
                    i // group, 2 + (i // group) % 5, tweak=i % group
                )
                for i in ids
            ]
            yield pd.DataFrame({"id": ids, "content": content})

    return _spread_ids(ids_df.select(id_col)).mapInPandas(
        gen, "id long, content binary"
    )


def planted_mixed_video_corpus(
    ids_df: DataFrame,
    *,
    id_col: str = "doc_id",
    group: int = 4,
    corrupt_every: int = 29,
) -> DataFrame:
    """ids -> (id, content) of CROSS-CONTAINER twin videos: ids sharing
    ``id // group`` carry the same JPEG-robust cell-plant frame
    sequence (n_frames = 2 + gid % 5, per-member cell tweaks), encoded
    as animated GIF for even ids and AVI/Motion-JPEG for odd ids
    (progressive JPEG frames for ids = 3 mod 4) — so a sequence-level
    dedup only pairs the group if the GIF and AVI decode paths produce
    agreeing per-frame fingerprints, the video analog of the mixed
    PNG/JPEG/GIF image groups.  Every ``corrupt_every``-th id is junk
    bytes.  Executor-side generation, nothing collects."""
    import numpy as np

    def member(i: int) -> bytes:
        from outpost_spark.ops.avi import encode_avi_mjpeg
        from outpost_spark.ops.gif import encode_gif_animation

        gid, tweak = i // group, i % group
        n = 2 + gid % 5
        frames = np.stack(
            [_planted_cells(gid * 7 + fi, tweak)[..., 0] for fi in range(n)]
        )
        if i % 2:
            return encode_avi_mjpeg(
                frames, quality=90, progressive=i % 4 == 3
            )
        return encode_gif_animation(frames)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            content = [
                b"JUNK: not a video"
                if corrupt_every and i % corrupt_every == 0
                else member(i)
                for i in ids
            ]
            yield pd.DataFrame({"id": ids, "content": content})

    return _spread_ids(ids_df.select(id_col)).mapInPandas(
        gen, "id long, content binary"
    )


VIDEO_FRAME_DHASH_SCHEMA = (
    "id long, frame_idx int, fhash long, n_sampled int, hash_ok boolean"
)


def video_frame_dhash(
    multimodal_df: DataFrame, *, every_k: int = 2, hash_size: int = 8
) -> DataFrame:
    """(id, content) of videos -> one (id, frame_idx, fhash) row per
    SAMPLED frame (idx % every_k == 0), the dHash computed directly on
    the decoded ndarray — decode and hash share one Arrow stage, so the
    raw frames never leave it (no intermediate PNG round-trip).
    ``n_sampled`` rides every row (the per-video sampled-frame count
    the pairing threshold needs).  Undecodable members emit ONE
    ``hash_ok=false`` row, never task failures."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "id", "frame_idx", "fhash", "n_sampled", "hash_ok",
            )}
            for vid, b in zip(pdf["id"], pdf["content"]):
                try:
                    w, h, n, frames = decode_video(bytes(b))
                    idxs = list(range(0, n, every_k))
                    hashes = [
                        _dhash_pixels(frames[i], hash_size=hash_size)
                        for i in idxs
                    ]
                except (ValueError, KeyError, struct.error):
                    rows["id"].append(vid)
                    rows["frame_idx"].append(None)
                    rows["fhash"].append(None)
                    rows["n_sampled"].append(None)
                    rows["hash_ok"].append(False)
                    continue
                for i, hv in zip(idxs, hashes):
                    rows["id"].append(vid)
                    rows["frame_idx"].append(i)
                    rows["fhash"].append(hv)
                    rows["n_sampled"].append(len(idxs))
                    rows["hash_ok"].append(True)
            # nullable extension arrays BEFORE DataFrame construction: a
            # plain dict of int-or-None lists coerces to float64, which
            # silently rounds 64-bit hashes past 2^53
            yield pd.DataFrame(
                {
                    "id": rows["id"],
                    "frame_idx": pd.array(rows["frame_idx"], dtype="Int32"),
                    "fhash": pd.array(rows["fhash"], dtype="Int64"),
                    "n_sampled": pd.array(rows["n_sampled"], dtype="Int32"),
                    "hash_ok": rows["hash_ok"],
                }
            )

    return multimodal_df.select("id", "content").mapInPandas(
        gen, VIDEO_FRAME_DHASH_SCHEMA
    )


def video_dhash_pairs(
    frame_hashes: DataFrame,
    *,
    max_hamming: int = 4,
    bands: int | None = None,
    min_match_fraction: float = 0.5,
) -> DataFrame:
    """Near-duplicate VIDEO pairs from per-frame dHash rows
    (:func:`video_frame_dhash` output, or the persisted fixture): two
    videos pair when >= ``min_match_fraction`` of the SHORTER video's
    sampled frames match the other's frame at the SAME index within
    ``max_hamming`` bits.  The frame-level match uses the pigeonhole
    band join keyed by (frame_idx, band, band value) — frame alignment
    is part of the bucket key, so buckets never mix frame positions and
    the join stays linear in corpus size; bit_count(xor) verifies
    exactly (zero false negatives within the distance, the
    hamming_banded_pairs guarantee, same minimal unequal-width band
    default).  Output: (id_a, id_b, matched_frames, frames_a,
    frames_b)."""
    bits = 64
    if bands is None:
        bands = max_hamming + 1
    if bands <= max_hamming:
        raise ValueError(f"bands ({bands}) must exceed max_hamming ({max_hamming})")
    base, rem = divmod(bits, bands)
    if base == 0:
        raise ValueError(f"bands ({bands}) cannot exceed bits ({bits})")
    fh = frame_hashes.filter(F.col("hash_ok")).select(
        "id", "frame_idx", "fhash", "n_sampled"
    )
    exprs, pos = [], 0
    for b in range(bands):
        w = base + (1 if b < rem else 0)
        exprs.append(
            F.concat_ws(
                ":",
                F.lit(str(b)),
                F.shiftrightunsigned(F.col("fhash"), pos)
                .bitwiseAND(F.lit((1 << w) - 1))
                .cast("string"),
            )
        )
        pos += w
    band_arr = F.array(*exprs)
    buckets = fh.select(
        "id", "frame_idx", "fhash", "n_sampled", F.explode(band_arr).alias("__band")
    ).localCheckpoint(eager=True)
    left, right = buckets.alias("l"), buckets.alias("r")
    matches = (
        left.join(
            right,
            (F.col("l.frame_idx") == F.col("r.frame_idx"))
            & (F.col("l.__band") == F.col("r.__band"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.frame_idx").alias("frame_idx"),
            F.col("l.n_sampled").alias("frames_a"),
            F.col("r.n_sampled").alias("frames_b"),
            F.bit_count(
                F.col("l.fhash").bitwiseXOR(F.col("r.fhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b", "frame_idx"])
    )
    return (
        matches.groupBy("id_a", "id_b", "frames_a", "frames_b")
        .agg(F.count(F.lit(1)).alias("matched_frames"))
        .filter(
            F.col("matched_frames")
            >= F.ceil(
                F.least("frames_a", "frames_b") * F.lit(float(min_match_fraction))
            )
        )
        .select("id_a", "id_b", "matched_frames", "frames_a", "frames_b")
    )


def video_dhash_survivors(
    multimodal_df: DataFrame,
    *,
    every_k: int = 2,
    max_hamming: int = 4,
    min_match_fraction: float = 0.5,
) -> DataFrame:
    """Video dedup END TO END: per-frame dHash -> frame-aligned pairs
    -> connected components -> minimum-id survivor per near-dup
    cluster; undecodable members pass through untouched.  Output: (id)
    of the surviving videos."""
    from outpost_spark.ops.dedup import dedup_keep_canonical

    fh = video_frame_dhash(multimodal_df, every_k=every_k)
    pairs = video_dhash_pairs(
        fh, max_hamming=max_hamming, min_match_fraction=min_match_fraction
    )
    return dedup_keep_canonical(multimodal_df.select("id"), pairs, "id")


# ---- audio: silence trim + resample ----------------------------------------

def encode_wav(samples, rate: int, channels: int = 1) -> bytes:
    """16-bit PCM WAV from an int16-valued numpy array / iterable —
    decode_audio's inverse, so audio stages re-emit the same container
    they consume (the encode_png/decode_image convention)."""
    import wave

    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def _encode_audio_like(content: bytes, samples, rate: int, channels: int = 1) -> bytes:
    """Re-encode in the INPUT's container (the resize_images convention:
    stages re-emit what they consume): FLAC in -> FLAC out, WAV
    otherwise."""
    from outpost_spark.ops.flac import encode_flac, is_flac

    if is_flac(content):
        return encode_flac(samples, rate, channels=channels)
    return encode_wav(samples, rate, channels=channels)


def _wav_samples(content: bytes):
    """(samples int16 ndarray [n_frames, channels], rate) of a WAV —
    a direct RIFF parse covering the containers real corpora actually
    carry (r13; the stdlib ``wave`` module stops at integer PCM):
    unsigned 8-bit, 16/24/32-bit PCM, IEEE float32/float64, and
    WAVE_FORMAT_EXTENSIBLE wrappers of both.  Everything normalizes to
    int16, so every downstream audio stage (fingerprint, spectral
    features, silence trim, resample) consumes one shape regardless of
    the source depth.  ValueError on anything else."""
    arr, rate, _bits = _wav_parse(content)
    return arr, rate


def _wav_parse(content: bytes):
    """(int16 samples [n, ch], rate, source bits) — the parse behind
    :func:`_wav_samples` and :func:`decode_audio`.  Dispatches FLAC
    (r14, ``ops/flac.py``) so every downstream audio stage — metadata,
    fingerprint, features, trim, resample — consumes the compressed
    format real crawl audio actually arrives in; all depths normalize
    to int16, the WAV convention."""
    import numpy as np

    from outpost_spark.ops import flac as _flac

    if _flac.is_flac(content):
        arr32, rate, bps = _flac.decode_flac(content)
        if bps == 16:
            arr = arr32.astype("<i2")
        elif bps < 16:  # 8/12-bit: left-justify like unsigned-8 WAV
            arr = (arr32 << (16 - bps)).astype("<i2")
        else:  # 20/24/32-bit: keep the top 16
            arr = (arr32 >> (bps - 16)).astype("<i2")
        return arr, int(rate), int(bps)
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE header")
    end = min(len(content), 8 + struct.unpack_from("<I", content, 4)[0])
    fmt = data = None
    pos = 12
    while pos + 8 <= end:
        cid = content[pos : pos + 4]
        size = struct.unpack_from("<I", content, pos + 4)[0]
        start = pos + 8
        if size > end - start:
            raise ValueError("not a WAV: truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("not a WAV: short fmt chunk")
            tag, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", content, start
            )
            if tag == 0xFFFE and size >= 26:  # EXTENSIBLE: real tag leads
                tag = struct.unpack_from("<H", content, start + 24)[0]
            fmt = (tag, ch, rate, bits)
        elif cid == b"data":
            data = content[start : start + size]
        pos = start + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    tag, ch, rate, bits = fmt
    if ch < 1 or rate < 1:
        raise ValueError("not a WAV: malformed fmt chunk")
    if tag == 1 and bits == 16:
        arr = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2")
    elif tag == 1 and bits == 8:  # unsigned, midpoint 128
        arr = ((np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8)
    elif tag == 1 and bits == 24:  # keep the top two bytes
        b3 = np.frombuffer(data, dtype=np.uint8)
        b3 = b3[: len(b3) - len(b3) % 3].reshape(-1, 3)
        arr = np.ascontiguousarray(b3[:, 1:3]).view("<i2").ravel()
    elif tag == 1 and bits == 32:
        arr = (
            np.frombuffer(data[: len(data) - len(data) % 4], dtype="<i4") >> 16
        ).astype("<i2")
    elif tag == 3 and bits in (32, 64):  # IEEE float
        f = np.frombuffer(
            data[: len(data) - len(data) % (bits // 8)],
            dtype="<f4" if bits == 32 else "<f8",
        )
        arr = np.clip(np.round(f * 32767.0), -32768, 32767).astype("<i2")
    else:
        raise ValueError(f"not a WAV: unsupported format tag {tag} / {bits}-bit")
    n = len(arr) - len(arr) % ch
    return arr[:n].reshape(-1, ch), int(rate), int(bits)


def trim_silence_wav(
    content: bytes, *, threshold: float = 0.01, frame_ms: int = 20
) -> tuple[bytes, float, float]:
    """Strip leading/trailing frames whose RMS (normalized to [0,1]) is
    below ``threshold``; returns (trimmed_wav, leading_s, trailing_s).
    An all-silent clip trims to zero frames (still a valid WAV)."""
    import numpy as np

    arr, rate = _wav_samples(content)
    n = len(arr)
    step = max(int(rate * frame_ms / 1000), 1)
    norm = arr.astype(np.float64) / 32768.0
    loud = []
    for lo in range(0, n, step):
        seg = norm[lo : lo + step]
        loud.append(float(np.sqrt(np.mean(seg * seg))) >= threshold)
    first = next((i for i, x in enumerate(loud) if x), len(loud))
    last = next((i for i in range(len(loud) - 1, -1, -1) if loud[i]), -1)
    lo, hi = first * step, min((last + 1) * step, n)
    if lo >= hi:
        lo = hi = 0
    trimmed = _encode_audio_like(
        content, arr[lo:hi].reshape(-1), rate, channels=arr.shape[1]
    )
    return trimmed, lo / rate, (n - hi) / rate


def resample_wav(content: bytes, *, target_rate: int) -> bytes:
    """Linear-interpolation resample to ``target_rate`` (the audio
    analog of the nearest-neighbor image resize: real arithmetic, no
    codec library) — per channel over 16-bit PCM."""
    import numpy as np

    arr, rate = _wav_samples(content)
    if rate == target_rate or len(arr) == 0:
        return _encode_audio_like(
            content, arr.reshape(-1), target_rate, channels=arr.shape[1]
        )
    n_out = max(int(round(len(arr) * target_rate / rate)), 1)
    x_out = np.linspace(0.0, len(arr) - 1, n_out)
    x_in = np.arange(len(arr))
    chans = [
        np.interp(x_out, x_in, arr[:, c].astype(np.float64))
        for c in range(arr.shape[1])
    ]
    out = np.stack(chans, axis=1).round().clip(-32768, 32767).astype("<i2")
    return _encode_audio_like(
        content, out.reshape(-1), target_rate, channels=arr.shape[1]
    )


AUDIO_CLEAN_SCHEMA = (
    "id long, sample_rate int, duration_s double, out_duration_s double, "
    "leading_trim_s double, trailing_trim_s double, rms double, "
    "audio_ok boolean, content binary"
)


def clean_audio(
    multimodal_df: DataFrame,
    *,
    target_rate: int | None = None,
    silence_threshold: float = 0.01,
    frame_ms: int = 20,
) -> DataFrame:
    """Corpus audio-prep stage: WAVs in, silence-trimmed (and optionally
    resampled) WAVs out via Arrow-batched ``mapInPandas`` — the
    standard speech-pipeline normalization before feature extraction.
    Rows the decoder rejects come back ``audio_ok=false`` with null
    content (corrupt members must not kill a corpus-scale job); stats
    columns carry before/after durations and post-trim RMS so a
    downstream gate can drop clips that are all silence or too short.
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "id": pdf["id"], "sample_rate": [], "duration_s": [],
                "out_duration_s": [], "leading_trim_s": [],
                "trailing_trim_s": [], "rms": [], "audio_ok": [],
                "content": [],
            }
            for b in pdf["content"]:
                try:
                    meta = decode_audio(b)
                    trimmed, lead, trail = trim_silence_wav(
                        b, threshold=silence_threshold, frame_ms=frame_ms
                    )
                    if target_rate is not None:
                        trimmed = resample_wav(trimmed, target_rate=target_rate)
                    out_meta = decode_audio(trimmed)
                    out["sample_rate"].append(out_meta["sample_rate"])
                    out["duration_s"].append(meta["duration_s"])
                    out["out_duration_s"].append(out_meta["duration_s"])
                    out["leading_trim_s"].append(lead)
                    out["trailing_trim_s"].append(trail)
                    out["rms"].append(out_meta["rms"])
                    out["audio_ok"].append(True)
                    out["content"].append(trimmed)
                except (ValueError, KeyError, struct.error):
                    for k in (
                        "sample_rate", "duration_s", "out_duration_s",
                        "leading_trim_s", "trailing_trim_s", "rms", "content",
                    ):
                        out[k].append(None)
                    out["audio_ok"].append(False)
            yield pd.DataFrame(out)

    return multimodal_df.select("id", "content").mapInPandas(
        gen, AUDIO_CLEAN_SCHEMA
    )
