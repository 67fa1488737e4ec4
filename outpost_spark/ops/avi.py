"""AVI/MJPEG container codec: decode and encode, stdlib+numpy only.

MP4/H.264 and WebM/VP9 stay injectable-codec territory (entropy-coded
inter-frame formats are out of stdlib+numpy reach, and silent stubs
are worse than an honest ``ValueError``), but AVI carrying
Motion-JPEG is exactly a RIFF chunk walk over the in-tree JPEG
decoder (``ops/jpeg.py``) — every frame is an independent baseline/
progressive JPEG.  That puts one genuine real-world video container
on the default :func:`ops.multimodal.decode_video` path (VERDICT r12
task #5), alongside animated GIF.

Derived from the public RIFF/AVI container layout (Microsoft
``AVIMAINHEADER``/``AVISTREAMHEADER``/``BITMAPINFOHEADER``, the
'movi' chunk convention): ``RIFF('AVI ' LIST('hdrl' avih
LIST('strl' strh strf)) LIST('movi' 00dc...))``; frame chunks are
``NNdc``/``NNdb`` (compressed / uncompressed DIB of stream NN), with
every chunk padded to an even offset, and ``rec `` LISTs optionally
grouping interleaved chunks.

The multimodal contract holds: undecodable blobs raise ``ValueError``,
and untrusted input is allocation-bounded — the header's declared
dims x the COUNTED frame chunks must fit the decode ceiling before
any frame decodes, every chunk size is validated against the buffer,
and each embedded JPEG carries ops/jpeg.py's own bomb bounds.  The
per-frame Huffman loops are quarantined inside Arrow-batched
``mapInPandas`` stages like every other codec here.
"""

from __future__ import annotations

import struct

# same ceiling as the PNG/JPEG/GIF paths
_MAX_RAW_BYTES = 1 << 28


def _u32(buf: bytes, pos: int) -> int:
    return struct.unpack_from("<I", buf, pos)[0]


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for the sibling
    chunks in buf[pos:end]; validates sizes against the buffer and
    honors even-byte padding."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        size = _u32(buf, pos + 4)
        start = pos + 8
        if size > end - start:
            raise ValueError("truncated AVI chunk")
        yield fourcc, start, size
        pos = start + size + (size & 1)


def decode_avi_meta(content: bytes) -> dict:
    """Header walk only (no pixel work): dims, declared frame count,
    counted frame chunks, fps.  Raises ``ValueError`` for non-AVI
    input or malformed chunk structure."""
    if len(content) < 24 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    riff_size = _u32(content, 4)
    end = min(len(content), 8 + riff_size)
    avih = None
    n_chunks = 0
    for fourcc, start, size in _walk_chunks(content, 12, end):
        if fourcc != b"LIST" or size < 4:
            continue
        ltype = content[start : start + 4]
        if ltype == b"hdrl":
            for fc2, s2, z2 in _walk_chunks(content, start + 4, start + size):
                if fc2 == b"avih" and z2 >= 40:
                    avih = struct.unpack_from("<10I", content, s2)
        elif ltype == b"movi":
            n_chunks += sum(
                1 for fc2, _, _ in _iter_movi(content, start + 4, start + size)
            )
    if avih is None:
        raise ValueError("AVI with no avih header")
    if n_chunks == 0:
        raise ValueError("AVI with no frame chunks")
    us_per_frame, _, _, _, total_frames, _, _, _, width, height = avih
    if width == 0 or height == 0:
        raise ValueError("zero-dimension AVI")
    return {
        "kind": "avi",
        "width": int(width),
        "height": int(height),
        "n_frames": int(n_chunks),
        "declared_frames": int(total_frames),
        "fps": (1e6 / us_per_frame) if us_per_frame else None,
    }


def _iter_movi(buf: bytes, pos: int, end: int):
    """Yield the video frame chunks (``NNdc``/``NNdb``) inside a movi
    payload, descending into ``rec `` grouping LISTs; non-video chunks
    (audio ``NNwb``, index, ...) are skipped."""
    for fourcc, start, size in _walk_chunks(buf, pos, end):
        if fourcc == b"LIST" and size >= 4 and buf[start : start + 4] == b"rec ":
            yield from _iter_movi(buf, start + 4, start + size)
        elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
            yield fourcc, start, size


def decode_avi(content: bytes):
    """Full decode -> (width, height, n_frames, frames (n, h, w, 3)
    uint8): every ``NNdc``/``NNdb`` chunk decoded as an independent
    JPEG through ``ops/jpeg.py`` (Motion-JPEG).  Frames whose decoded
    dims disagree with the container header raise (corrupt container);
    the header dims x counted chunks are bomb-bounded BEFORE any frame
    decodes."""
    import numpy as np

    from outpost_spark.ops.jpeg import decode_jpeg

    meta = decode_avi_meta(content)
    width, height, n = meta["width"], meta["height"], meta["n_frames"]
    if width * height * 3 * n > _MAX_RAW_BYTES:
        raise ValueError("video exceeds the decode size ceiling")
    riff_size = _u32(content, 4)
    end = min(len(content), 8 + riff_size)
    frames = []
    for fourcc, start, size in _walk_chunks(content, 12, end):
        if (
            fourcc != b"LIST"
            or size < 4
            or content[start : start + 4] != b"movi"
        ):
            continue
        for _fc, s2, z2 in _iter_movi(content, start + 4, start + size):
            if _fc[2:4] == b"db":
                # ##db chunks carry uncompressed DIB rows; feeding them
                # to the JPEG decoder yields a misleading error (ADVICE
                # r13) — reject honestly instead
                raise ValueError(
                    "uncompressed AVI frames (##db) not supported"
                )
            px = decode_jpeg(content[s2 : s2 + z2])
            if px.ndim == 2:
                px = px[..., None]
            if px.shape[:2] != (height, width):
                raise ValueError(
                    f"AVI frame dims {px.shape[1]}x{px.shape[0]} disagree "
                    f"with the container's {width}x{height}"
                )
            if px.shape[2] == 1:
                px = np.repeat(px, 3, axis=2)
            frames.append(px[..., :3])
    if not frames:
        raise ValueError("AVI with no frame chunks")
    return width, height, len(frames), np.stack(frames)


def encode_avi_mjpeg(
    frames, *, fps: int = 10, quality: int = 90, progressive: bool = False
) -> bytes:
    """(n, h, w[, 1|3]) uint8 frames -> AVI/MJPEG bytes: each frame an
    independent JPEG (``ops/jpeg.py::encode_jpeg``; ``progressive``
    emits SOF2 members, exercising the decoder's full scan machinery
    through the container) inside the standard RIFF layout (avih + one
    'vids'/'MJPG' stream + movi) — the exact mirror of
    :func:`decode_avi`, and readable by any standard AVI player."""
    import numpy as np

    from outpost_spark.ops.jpeg import encode_jpeg

    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[..., None]
    if frames.ndim != 4 or frames.shape[0] < 1:
        raise ValueError("frames must be (n, h, w[, c]) with n >= 1")
    n, h, w = frames.shape[:3]
    jpegs = [
        encode_jpeg(
            f[..., 0] if f.shape[2] == 1 else f, quality,
            progressive=progressive,
        )
        for f in frames
    ]
    max_sz = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return (
            fourcc
            + struct.pack("<I", len(payload))
            + payload
            + (b"\x00" if len(payload) & 1 else b"")
        )

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack(
        "<10I4I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        0, 0,
        0x100,  # AVIF_ISINTERLEAVED; no AVIF_HASINDEX — we write no idx1
        n, 0, 1, max_sz, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1, max(fps, 1), 0, n,
                      max_sz, 0xFFFFFFFF, 0, 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
