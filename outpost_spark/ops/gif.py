"""GIF codec: decode (87a/89a) and encode (89a), stdlib+numpy only.

Crawl corpora are dominated by JPEG + PNG + GIF; with JPEG
(``ops/jpeg.py``) and PNG (``ops/multimodal.py``) on the default
decode path, GIF is the remaining format a 100 TB image pipeline hits
constantly.  This module is spec-derived from the public GIF89a
specification (CompuServe/W3C) — LZW per its Appendix F — and shares
the multimodal contract: undecodable blobs raise ``ValueError``, and
untrusted input is allocation-bounded (the LZW inflate stops at
exactly the pixel count the image descriptor declares, palettes are
at most 768 bytes, and logical screens past the decode ceiling are
rejected before any buffer exists), so a crafted GIF can neither
decompression-bomb an executor nor stall it.

Decode covers: global AND local color tables, interlaced row order,
the GIF89a graphic-control extension (transparency composited over
the background), frames offset inside the logical screen, and
multi-frame files (the still-image pipeline renders the FIRST frame
composited on the screen — the same convention thumbnailers use).
Encode emits a single-frame GIF89a with an exact palette built from
the input's unique colors (<= 256, else ``ValueError`` — GIF cannot
represent more), optionally interlaced.

Scale: the LZW loops are plain-Python dict/list code quarantined
inside Arrow-batched ``mapInPandas`` stages (the same shape as the
JPEG Huffman loop and the PNG Paeth filter) — linear scale-out with
executors, bounded per-image work.
"""

from __future__ import annotations

import struct

# Same ceiling as the PNG/JPEG paths (ops/multimodal.py::_MAX_RAW_BYTES):
# the composed RGB screen may never exceed this many bytes.
_MAX_RAW_BYTES = 1 << 28

_MAGICS = (b"GIF87a", b"GIF89a")


def _skip_subblocks(buf: bytes, pos: int) -> int:
    """Skip a sub-block chain starting at ``pos``; returns the offset
    just past its 0x00 terminator.  Raises on truncation."""
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF (unterminated sub-blocks)")
        size = buf[pos]
        pos += 1 + size
        if size == 0:
            return pos


def _collect_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain; returns (payload, offset past it)."""
    parts = []
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF (unterminated sub-blocks)")
        size = buf[pos]
        if size == 0:
            return b"".join(parts), pos + 1
        parts.append(buf[pos + 1 : pos + 1 + size])
        if len(parts[-1]) < size:
            raise ValueError("truncated GIF data sub-block")
        pos += 1 + size


def decode_gif_meta(content: bytes) -> dict:
    """Header + block walk only (no pixel work): dims, frame count,
    whether the first frame is interlaced.  Raises ``ValueError`` for
    non-GIF input or a malformed block structure."""
    if len(content) < 13 or content[:6] not in _MAGICS:
        raise ValueError("not a GIF")
    width, height, packed, _bg, _aspect = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    first_interlaced = False
    n = len(content)
    while pos < n:
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= n:
                raise ValueError("truncated GIF extension")
            pos = _skip_subblocks(content, pos + 1)
        elif block == 0x2C:  # image descriptor
            if pos + 9 > n:
                raise ValueError("truncated GIF image descriptor")
            ipacked = content[pos + 8]
            if n_frames == 0:
                first_interlaced = bool(ipacked & 0x40)
            pos += 9
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 0x07))
            if pos >= n:
                raise ValueError("truncated GIF image data")
            pos = _skip_subblocks(content, pos + 1)  # past LZW min-code byte
            n_frames += 1
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if n_frames == 0:
        raise ValueError("GIF with no image data")
    return {
        "kind": "gif",
        "width": int(width),
        "height": int(height),
        "bit_depth": 8,
        "channels": 3,
        "n_frames": n_frames,
        "interlaced": first_interlaced,
    }


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF LZW (spec Appendix F): LSB-first variable-width codes, CLEAR
    resets the table, table capped at 4096 (deferred-clear encoders keep
    emitting 12-bit codes against the full table).  Output is hard-capped
    at ``max_pixels`` — the bomb bound — and truncation past the declared
    pixel count is the CALLER's check (some encoders omit EOI)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"invalid LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    roots = [bytes([i]) for i in range(clear)]
    table = roots + [b"", b""]
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nacc = ip = 0
    n = len(data)
    while len(out) < max_pixels:
        while nacc < code_size:
            if ip >= n:
                return out  # ran out of codes: caller checks the length
            acc |= data[ip] << nacc
            nacc += 8
            ip += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nacc -= code_size
        if code == clear:
            table = roots + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= clear:
                raise ValueError("corrupt GIF LZW stream (bad first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream (code beyond table)")
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
    del out[max_pixels:]  # a multi-byte final entry may overshoot the cap
    return out


# interlace pass grid: (y0, dy) per pass, GIF89a spec section 20
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(idx, height: int):
    """Rows arrive pass-major (0,8,..,4,12,..,2,6,..,1,3,..) ->
    natural order."""
    import numpy as np

    order = []
    for y0, dy in _INTERLACE:
        order.extend(range(y0, height, dy))
    out = np.empty_like(idx)
    out[np.asarray(order)] = idx
    return out


def _parse_header(content: bytes):
    """Header + logical screen + global color table -> (width, height,
    gct bytes | None, bg index, offset of the first block)."""
    if len(content) < 13 or content[:6] not in _MAGICS:
        raise ValueError("not a GIF")
    width, height, packed, bg, _aspect = struct.unpack("<HHBBB", content[6:13])
    if width == 0 or height == 0:
        raise ValueError("zero-dimension GIF")
    pos = 13
    gct = None
    if packed & 0x80:
        size = 3 * (2 << (packed & 0x07))
        gct = content[pos : pos + size]
        if len(gct) < size:
            raise ValueError("truncated GIF global color table")
        pos += size
    return int(width), int(height), gct, bg, pos


def _frames_from(content: bytes, pos: int, gct: bytes | None):
    """Yield decoded frames from the block stream: (left, top, idx
    (fh, fw) uint8, palette (n, 3) uint8, transparent index | None,
    disposal method).  The GCE preceding a frame applies to that frame
    only (spec section 23)."""
    import numpy as np

    transparent = None
    disposal = 0
    n = len(content)
    while pos < n:
        block = content[pos]
        pos += 1
        if block == 0x3B:
            return
        if block == 0x21:
            if pos >= n:
                raise ValueError("truncated GIF extension")
            label = content[pos]
            if label == 0xF9:  # graphic control
                gce, pos = _collect_subblocks(content, pos + 1)
                if len(gce) >= 4:
                    disposal = (gce[0] >> 2) & 0x07
                    transparent = gce[3] if gce[0] & 0x01 else None
            else:
                pos = _skip_subblocks(content, pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > n:
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, ipacked = struct.unpack(
            "<HHHHB", content[pos : pos + 9]
        )
        pos += 9
        pal = gct
        if ipacked & 0x80:
            size = 3 * (2 << (ipacked & 0x07))
            pal = content[pos : pos + size]
            if len(pal) < size:
                raise ValueError("truncated GIF local color table")
            pos += size
        if pal is None:
            raise ValueError("GIF frame with no color table")
        if fw == 0 or fh == 0:
            raise ValueError("zero-dimension GIF frame")
        # The frame's OWN dims bound the LZW inflate — a tiny logical
        # screen with a 65535x65535 descriptor must not buy a ~4.3e9-px
        # decode budget just because the composite later clips it.
        if fw * fh * 3 > _MAX_RAW_BYTES:
            raise ValueError("GIF frame exceeds the decode size ceiling")
        if pos >= n:
            raise ValueError("truncated GIF image data")
        min_code_size = content[pos]
        data, pos = _collect_subblocks(content, pos + 1)
        raw = _lzw_decode(data, min_code_size, fw * fh)
        if len(raw) < fw * fh:
            raise ValueError("truncated GIF pixel data")
        idx = np.frombuffer(raw, dtype=np.uint8, count=fw * fh).reshape(
            fh, fw
        )
        if ipacked & 0x40:
            idx = _deinterlace_rows(idx, fh)
        palette = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("GIF color index out of range")
        yield left, top, idx, palette, transparent, disposal
        transparent = None
        disposal = 0


def decode_gif(content: bytes):
    """Full pixel decode -> (screen_h, screen_w, 3) uint8 RGB: the FIRST
    frame composited onto the logical screen (background color fills any
    area the frame doesn't cover; GCE-transparent pixels show the
    background).  Raises ``ValueError`` for non-GIF/corrupt input and
    for screens past the decode size ceiling."""
    import numpy as np

    width, height, gct, bg, pos = _parse_header(content)
    if width * height * 3 > _MAX_RAW_BYTES:
        raise ValueError("image exceeds the decode size ceiling")
    for left, top, idx, palette, transparent, _disp in _frames_from(
        content, pos, gct
    ):
        fh, fw = idx.shape
        # Composite in RGB: the background color comes from the GLOBAL
        # table, the frame pixels from the frame's own (maybe local)
        # palette — the two index spaces never mix.
        if gct is not None and bg * 3 < len(gct):
            bg_rgb = np.frombuffer(gct, dtype=np.uint8)[bg * 3 : bg * 3 + 3]
        else:
            bg_rgb = np.zeros(3, dtype=np.uint8)
        screen = np.empty((height, width, 3), dtype=np.uint8)
        screen[:] = bg_rgb
        # clip the frame to the screen (spec says frames fit; tolerate)
        cw = min(fw, max(width - left, 0))
        ch = min(fh, max(height - top, 0))
        if cw == 0 or ch == 0:
            raise ValueError("GIF frame entirely outside the screen")
        tile = idx[:ch, :cw]
        rgb = palette[tile]
        region = screen[top : top + ch, left : left + cw]
        if transparent is not None:
            region[:] = np.where((tile == transparent)[..., None], region, rgb)
        else:
            region[:] = rgb
        return screen  # (h, w, 3) — FIRST frame only
    raise ValueError("GIF with no image data")


def decode_gif_frames(content: bytes, *, max_frames: int | None = None):
    """Animated decode -> (width, height, n_frames, frames (n, h, w, 3)
    uint8): every frame composited per the GIF89a disposal model
    (0/1 leave, 2 restore-to-background, 3 restore-to-previous),
    transparency showing the pixels underneath — the accumulation a
    player renders.  The total composited output is capped by the same
    decode ceiling as the still path, so a 10,000-frame bomb raises
    ``ValueError`` instead of allocating.  This is the GIF half of the
    :func:`ops.multimodal.sample_frames` decoder seam — animated GIFs
    being the one video-ish format crawl corpora actually carry."""
    import numpy as np

    width, height, gct, bg, pos = _parse_header(content)
    if width * height * 3 > _MAX_RAW_BYTES:
        raise ValueError("image exceeds the decode size ceiling")
    if gct is not None and bg * 3 < len(gct):
        bg_rgb = np.frombuffer(gct, dtype=np.uint8)[bg * 3 : bg * 3 + 3]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((height, width, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames_out = []
    for left, top, idx, palette, transparent, disposal in _frames_from(
        content, pos, gct
    ):
        if (len(frames_out) + 1) * width * height * 3 > _MAX_RAW_BYTES:
            raise ValueError("animation exceeds the decode size ceiling")
        fh, fw = idx.shape
        cw = min(fw, max(width - left, 0))
        ch = min(fh, max(height - top, 0))
        if cw == 0 or ch == 0:
            raise ValueError("GIF frame entirely outside the screen")
        region = canvas[top : top + ch, left : left + cw]
        prev = region.copy() if disposal == 3 else None
        tile = idx[:ch, :cw]
        rgb = palette[tile]
        if transparent is not None:
            region[:] = np.where((tile == transparent)[..., None], region, rgb)
        else:
            region[:] = rgb
        frames_out.append(canvas.copy())
        if disposal == 2:
            region[:] = bg_rgb
        elif disposal == 3:
            region[:] = prev
        if max_frames is not None and len(frames_out) >= max_frames:
            break
    if not frames_out:
        raise ValueError("GIF with no image data")
    return width, height, len(frames_out), np.stack(frames_out)


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF LZW encoder (spec Appendix F), the exact mirror of the
    decoder's growth rule: code width bumps one table entry later than
    the decoder's (the decoder adds its entry one code behind), and the
    table resets via CLEAR at 4096 so the decoder's cap is never hit."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nacc = 0
    code_size = min_code_size + 1

    def emit(code: int):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += code_size
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear)
    prefix = int(indices[0])
    for k in indices[1:]:
        k = int(k)
        hit = table.get((prefix, k))
        if hit is not None:
            prefix = hit
            continue
        emit(prefix)
        table[(prefix, k)] = next_code
        next_code += 1
        # decoder bumps when ITS table (one entry behind) fills the width
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == 4096:
            emit(clear)
            table.clear()
            next_code = eoi + 1
            code_size = min_code_size + 1
        prefix = k
    emit(prefix)
    emit(eoi)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _rgbify(px):
    """(h, w[, 1|3]) uint8 -> (h, w, 3); greyscale becomes grey triples."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[..., None]
    c = px.shape[2]
    if c == 1:
        return np.repeat(px, 3, axis=2)
    if c != 3:
        raise ValueError(f"GIF encode supports 1 or 3 channels, got {c}")
    return px


def _exact_palette(flat):
    """(n, 3) uint8 colors -> (palette (2^bits, 3), bits, inverse map);
    > 256 distinct colors raises (GIF cannot represent them;
    quantization is a modeling choice this engine doesn't make
    silently)."""
    import numpy as np

    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors exceed GIF's 256")
    bits = 1
    while (1 << bits) < len(colors):
        bits += 1
    pal = np.zeros(((1 << bits), 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    return pal, bits, inverse


def _sub_blocked(lzw: bytes) -> bytes:
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return bytes(blocks)


def _frame_payload(idx, w: int, h: int, bits: int, interlace: bool) -> bytes:
    """Image descriptor + LZW data for one full-screen frame of indices."""
    import numpy as np

    if interlace:
        order = []
        for y0, dy in _INTERLACE:
            order.extend(range(y0, h, dy))
        idx = idx[np.asarray(order)]
    min_code_size = max(bits, 2)
    lzw = _lzw_encode(idx.reshape(-1), min_code_size)
    desc = b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0x00
    )
    return desc + bytes([min_code_size]) + _sub_blocked(lzw)


def encode_gif(arr, *, interlace: bool = False) -> bytes:
    """(h, w[, c]) uint8 -> single-frame GIF89a with an exact palette of
    the input's unique colors.  c in (1, 3); greyscale becomes grey RGB
    triples.  More than 256 distinct colors raises ``ValueError``.
    ``interlace`` writes the four-pass row order."""
    px = _rgbify(arr)
    h, w = px.shape[:2]
    pal, bits, inverse = _exact_palette(px.reshape(-1, 3))
    idx = inverse.astype("uint8").reshape(h, w)
    head = b"GIF89a" + struct.pack(
        "<HHBBB", w, h, 0xF0 | ((bits - 1) & 0x07), 0, 0
    )
    return (
        head
        + pal.tobytes()
        + _frame_payload(idx, w, h, bits, interlace)
        + b"\x3b"
    )


def encode_gif_animation(frames, *, delay_cs: int = 4, loop: int = 0) -> bytes:
    """(n, h, w[, 1|3]) uint8 frames -> animated GIF89a: one global
    exact palette over ALL frames' colors (> 256 raises), a
    NETSCAPE2.0 loop extension (``loop=0`` = forever), and one
    full-screen frame per input with a ``delay_cs``-centisecond GCE
    (disposal 'none' — each frame fully covers the screen, the shape
    :func:`decode_gif_frames` round-trips exactly)."""
    import numpy as np

    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[..., None]
    if frames.ndim != 4 or frames.shape[0] < 1:
        raise ValueError("frames must be (n, h, w[, c]) with n >= 1")
    rgb = np.stack([_rgbify(f) for f in frames])
    n, h, w = rgb.shape[:3]
    pal, bits, inverse = _exact_palette(rgb.reshape(-1, 3))
    idx = inverse.astype(np.uint8).reshape(n, h, w)
    out = bytearray(
        b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF0 | ((bits - 1) & 0x07), 0, 0)
    )
    out += pal.tobytes()
    # NETSCAPE2.0 application extension: loop count (0 = forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    gce = b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
    for i in range(n):
        out += gce
        out += _frame_payload(idx[i], w, h, bits, False)
    out += b"\x3b"
    return bytes(out)
