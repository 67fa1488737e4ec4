"""BMP (Windows DIB) codec: decode and encode, stdlib+numpy only.

BMP rounds out the crawl-image matrix (PNG + JPEG + GIF already on the
default path): it still appears in real corpora — clipart mirrors,
scanned-document dumps, old forum attachments — and it is the cheapest
format here, an uncompressed raster behind two fixed headers.  Derived
from the public Windows BITMAPFILEHEADER / BITMAPINFOHEADER layout:
``'BM' + file header (14 bytes) + DIB header (>= 40 bytes) + optional
BGRX palette + bottom-up (or top-down when height < 0) 4-byte-aligned
scanlines``.

Covered: 8-bit palette, 24-bit BGR, and 32-bit BGRA (alpha dropped),
uncompressed (BI_RGB) only — RLE4/RLE8/bitfields raise ``ValueError``
like any other undecodable blob.  The multimodal contract holds:
dims are bomb-bounded before the pixel array exists, and every
malformed input raises ``ValueError``.  Being uncompressed, a BMP
cannot decompression-bomb, but a crafted header can still declare
gigapixel dims — rejected up front.
"""

from __future__ import annotations

import struct

# same ceiling as the PNG/JPEG/GIF paths
_MAX_RAW_BYTES = 1 << 28


def is_bmp(content: bytes) -> bool:
    """Cheap dispatch probe: the 2-byte 'BM' magic is weak, so also
    require a plausible DIB header size."""
    return (
        len(content) >= 54
        and content[:2] == b"BM"
        and struct.unpack_from("<I", content, 14)[0]
        in (40, 52, 56, 64, 108, 124)
    )


def _parse_headers(content: bytes):
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height, planes, bpp, compression = struct.unpack_from(
        "<iiHHI", content, 18
    )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError("zero-dimension BMP")
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    clr_used = struct.unpack_from("<I", content, 46)[0]
    return data_offset, hdr_size, width, height, top_down, bpp, clr_used


def decode_bmp_meta(content: bytes) -> dict:
    """Header decode only: dims and source depth (reported pixels are
    always 8-bit 3-channel after palette expansion / alpha drop)."""
    _off, _hs, width, height, _td, bpp, _cu = _parse_headers(content)
    return {
        "kind": "bmp",
        "width": int(width),
        "height": int(height),
        "bit_depth": 8,
        "channels": 3,
        "src_bpp": int(bpp),
    }


def decode_bmp(content: bytes):
    """Full decode -> (h, w, 3) uint8 RGB.  Raises ``ValueError`` for
    non-BMP/unsupported/truncated input and for dims past the decode
    ceiling."""
    import numpy as np

    off, hdr_size, width, height, top_down, bpp, clr_used = _parse_headers(
        content
    )
    if width * height * 3 > _MAX_RAW_BYTES:
        raise ValueError("image exceeds the decode size ceiling")
    stride = ((width * bpp + 31) // 32) * 4
    need = stride * height
    if off + need > len(content):
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(content, dtype=np.uint8, count=need, offset=off)
    rows = raw.reshape(height, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        n_colors = clr_used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            content, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(n_colors, 4)
        if pal_off + n_colors * 4 > off:
            raise ValueError("BMP palette overlaps pixel data")
        idx = rows[:, :width]
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("BMP color index out of range")
        return pal[idx][..., [2, 1, 0]]  # BGRX -> RGB
    px = rows[:, : width * (bpp // 8)].reshape(height, width, bpp // 8)
    return px[..., [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped


def encode_bmp(arr) -> bytes:
    """(h, w[, 1|3]) uint8 -> 24-bit bottom-up BI_RGB BMP — decode's
    inverse (greyscale becomes equal BGR triples), so image stages
    re-emit the container they consume."""
    import numpy as np

    px = np.asarray(arr, dtype=np.uint8)
    if px.ndim == 2:
        px = px[..., None]
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    h, w = px.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # RGB->BGR
    data = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    head = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
    return head + dib + data
