"""Baseline TIFF codec: decode and encode, stdlib+numpy only.

TIFF is the scanned-document / scientific-archive format a crawl
pipeline still meets (and the container behind many digitized-book
dumps).  Derived from the public TIFF 6.0 specification (Adobe):
little- and big-endian headers, IFD tag walk, strip-organized 8-bit
greyscale and RGB(A) rasters, uncompressed (Compression=1) and
PackBits (Compression=32773, the spec's Section 9 RLE).  Anything
else — tiles, LZW/JPEG/deflate compression, palettes, sub-8-bit or
16-bit samples, planar layout — raises ``ValueError`` honestly, the
same no-silent-stub rule as every codec here.

The multimodal contract holds: declared dims are bomb-bounded before
any raster exists, strip offsets/counts validate against the buffer,
and the PackBits inflate is hard-capped at the strip's declared
output size.
"""

from __future__ import annotations

import struct

# same ceiling as the PNG/JPEG/GIF/BMP paths
_MAX_RAW_BYTES = 1 << 28

_MAGICS = (b"II*\x00", b"MM\x00*")


def is_tiff(content: bytes) -> bool:
    return len(content) >= 8 and content[:4] in _MAGICS


_T_BYTES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(content: bytes, endian: str):
    """First IFD -> {tag: [values]} for the integer tag types."""
    (ifd_off,) = struct.unpack_from(endian + "I", content, 4)
    if ifd_off + 2 > len(content):
        raise ValueError("truncated TIFF (no IFD)")
    (n_entries,) = struct.unpack_from(endian + "H", content, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        pos = ifd_off + 2 + i * 12
        if pos + 12 > len(content):
            raise ValueError("truncated TIFF IFD")
        tag, ttype, count = struct.unpack_from(endian + "HHI", content, pos)
        unit = _T_BYTES.get(ttype)
        if unit is None or ttype in (2, 5, 7, 10):  # ascii/rational/undef
            continue
        size = unit * count
        if size <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(endian + "I", content, pos + 8)
        if voff + size > len(content):
            raise ValueError("truncated TIFF tag value")
        fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}[ttype]
        tags[tag] = list(
            struct.unpack_from(endian + fmt * count, content, voff)
        )
    return tags


def _parse(content: bytes):
    if not is_tiff(content):
        raise ValueError("not a TIFF")
    endian = "<" if content[:2] == b"II" else ">"
    t = _read_ifd(content, endian)
    try:
        width = t[256][0]
        height = t[257][0]
    except KeyError:
        raise ValueError("TIFF missing dimensions") from None
    if width == 0 or height == 0 or width > 1 << 24 or height > 1 << 24:
        raise ValueError("bad TIFF dimensions")
    spp = t.get(277, [1])[0]
    bits = t.get(258, [1] * spp)
    compression = t.get(259, [1])[0]
    photometric = t.get(262, [1])[0]
    if 322 in t or 323 in t:
        raise ValueError("tiled TIFF not supported")
    if t.get(284, [1])[0] != 1:
        raise ValueError("planar TIFF not supported")
    return endian, t, width, height, spp, bits, compression, photometric


def decode_tiff_meta(content: bytes) -> dict:
    """Header/IFD walk only: dims, samples, compression — no raster."""
    _e, _t, width, height, spp, bits, compression, photometric = _parse(
        content
    )
    return {
        "kind": "tiff",
        "width": int(width),
        "height": int(height),
        "bit_depth": int(bits[0]) if bits else 1,
        "channels": int(spp),
        "compression": int(compression),
        "photometric": int(photometric),
    }


def _unpackbits(data: bytes, cap: int) -> bytes:
    """PackBits RLE (TIFF 6.0 §9), output hard-capped at ``cap``."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < cap:
        b = data[i]
        i += 1
        if b < 128:  # literal run of b+1 bytes
            if i + b + 1 > n:
                raise ValueError("truncated TIFF PackBits stream")
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # replicate next byte 257-b times
            if i >= n:
                raise ValueError("truncated TIFF PackBits stream")
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op per spec
    del out[cap:]
    return bytes(out)


def decode_tiff(content: bytes):
    """Full decode -> (h, w, c) uint8 (c = 1 grey or 3 RGB; alpha
    dropped): strip-organized 8-bit baseline rasters, uncompressed or
    PackBits.  Raises ``ValueError`` for non-TIFF/unsupported/corrupt
    input and for dims past the decode ceiling."""
    import numpy as np

    endian, t, width, height, spp, bits, compression, photometric = _parse(
        content
    )
    if not bits or any(b != 8 for b in bits):
        # an empty BitsPerSample (count=0 tag) must not fall through to
        # the 8-bit assumption (ADVICE r13)
        raise ValueError(f"unsupported TIFF bit depths {bits}")
    if compression not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if photometric not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photometric}")
    if spp not in (1, 3, 4) or (photometric == 2 and spp < 3):
        raise ValueError(f"unsupported TIFF samples/pixel {spp}")
    if width * height * spp > _MAX_RAW_BYTES:
        raise ValueError("image exceeds the decode size ceiling")
    offsets = t.get(273)
    counts = t.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout")
    rows_per_strip = t.get(278, [height])[0] or height
    stride = width * spp
    raw = bytearray()
    need = stride * height
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(content):
            raise ValueError("truncated TIFF strip")
        strip_rows = min(rows_per_strip, height - si * rows_per_strip)
        if strip_rows <= 0:
            break
        want = strip_rows * stride
        chunk = content[off : off + cnt]
        if compression == 32773:
            chunk = _unpackbits(chunk, want)
        if len(chunk) < want:
            raise ValueError("truncated TIFF strip data")
        raw += chunk[:want]
    if len(raw) < need:
        raise ValueError("TIFF strips cover fewer rows than declared")
    import numpy as np

    px = np.frombuffer(bytes(raw), dtype=np.uint8, count=need).reshape(
        height, width, spp
    )
    if photometric == 0:  # WhiteIsZero: invert to the usual scale
        px = 255 - px
    if spp == 4:
        px = px[..., :3]  # drop alpha
    return px


def encode_tiff(arr, *, packbits: bool = False) -> bytes:
    """(h, w[, 1|3]) uint8 -> little-endian baseline TIFF (single IFD,
    one strip per 64 rows, BlackIsZero / RGB, optional PackBits) —
    decode's inverse, readable by any standard TIFF reader."""
    import numpy as np

    px = np.asarray(arr, dtype=np.uint8)
    if px.ndim == 2:
        px = px[..., None]
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError("encode_tiff writes 1- or 3-channel rasters")

    def pack_row_chunk(chunk: bytes) -> bytes:
        # literal-only PackBits (valid, simple); runs compress poorly but
        # correctness is what the decoder round-trip pins
        out = bytearray()
        for i in range(0, len(chunk), 128):
            part = chunk[i : i + 128]
            out.append(len(part) - 1)
            out += part
        return bytes(out)

    rows_per_strip = 64
    strips = []
    for y0 in range(0, h, rows_per_strip):
        chunk = px[y0 : y0 + rows_per_strip].tobytes()
        strips.append(pack_row_chunk(chunk) if packbits else chunk)

    tags = []  # (tag, type, count, value_or_bytes)
    n_strips = len(strips)

    def short(tag, v):
        tags.append((tag, 3, 1, v))

    short(256, w)
    short(257, h)
    if c == 1:
        short(258, 8)
    else:
        tags.append((258, 3, 3, b"".join(struct.pack("<H", 8) for _ in range(3))))
    short(259, 32773 if packbits else 1)
    short(262, 1 if c == 1 else 2)
    short(277, c)
    short(278, rows_per_strip)
    # strip offsets/counts appended after layout is known
    header = 8
    ifd_entries = len(tags) + 2
    ifd_size = 2 + ifd_entries * 12 + 4
    # out-of-line value area follows the IFD
    extra = bytearray()
    extra_base = header + ifd_size

    def value_field(ttype, count, v):
        nonlocal extra
        unit = _T_BYTES[ttype]
        if isinstance(v, int):
            raw = struct.pack("<" + {3: "H", 4: "I"}[ttype], v)
        else:
            raw = v
        if len(raw) <= 4:
            return raw + bytes(4 - len(raw))
        off = extra_base + len(extra)
        extra += raw + (b"\x00" if len(raw) & 1 else b"")
        return struct.pack("<I", off)

    # reserve the strip tables in the extra area
    data_base_holder = {}

    def build():
        entries = b""
        all_tags = list(tags)
        offs_raw = b"".join(
            struct.pack("<I", data_base_holder[si]) for si in range(n_strips)
        )
        cnts_raw = b"".join(struct.pack("<I", len(s)) for s in strips)
        all_tags.append((273, 4, n_strips, offs_raw))
        all_tags.append((279, 4, n_strips, cnts_raw))
        all_tags.sort(key=lambda e: e[0])
        for tag, ttype, count, v in all_tags:
            entries += struct.pack("<HHI", tag, ttype, count) + value_field(
                ttype, count, v
            )
        return entries

    # two-pass: first compute extra-area size with placeholder offsets,
    # then fill real strip offsets (strip data follows the extra area)
    extra = bytearray()
    for si in range(n_strips):
        data_base_holder[si] = 0
    _ = build()
    extra_len_fixed = len(extra)
    data_start = extra_base + extra_len_fixed
    pos = data_start
    for si, s in enumerate(strips):
        data_base_holder[si] = pos
        pos += len(s) + (len(s) & 1)
    extra = bytearray()
    entries = build()
    body = bytearray()
    body += b"II*\x00" + struct.pack("<I", header)
    body += struct.pack("<H", ifd_entries) + entries + struct.pack("<I", 0)
    body += extra
    for s in strips:
        body += s + (b"\x00" if len(s) & 1 else b"")
    return bytes(body)
