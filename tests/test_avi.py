"""AVI/MJPEG container codec (ops/avi.py): RIFF chunk walk over the
in-tree JPEG decoder — round-trips on JPEG-robust cell plants, both
scan modes through the container, malformed/bomb rejection, mutation
fuzz, and the decode_video dispatch (VERDICT r12 task #5)."""

import struct

import numpy as np
import pytest

from outpost_spark.ops.avi import (
    decode_avi,
    decode_avi_meta,
    encode_avi_mjpeg,
)
from outpost_spark.ops.multimodal import (
    _planted_cells,
    decode_video,
    planted_avi_video,
)


def _cell_frames(n: int, seed: int = 0):
    return np.stack([_planted_cells(seed * 7 + i, 0)[..., 0] for i in range(n)])


@pytest.mark.parametrize("progressive", [False, True])
def test_roundtrip_cell_frames_exact_within_quantization(progressive):
    frames = _cell_frames(4)
    avi = encode_avi_mjpeg(frames, fps=5, quality=90, progressive=progressive)
    meta = decode_avi_meta(avi)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (72, 64, 4)
    assert meta["declared_frames"] == 4 and meta["fps"] == 5.0
    w, h, n, out = decode_avi(avi)
    assert (w, h, n) == (72, 64, 4) and out.shape == (4, 64, 72, 3)
    # 8x8-aligned constant cells survive q90 within ±1 per ops/jpeg.py
    assert np.abs(out[..., 0].astype(int) - frames.astype(int)).max() <= 2
    # greyscale source expands to three identical channels
    assert (out[..., 0] == out[..., 1]).all()
    assert (out[..., 1] == out[..., 2]).all()


def test_rgb_frames_roundtrip():
    grey = _cell_frames(2)
    rgb = np.stack([np.stack([f, f, f], axis=-1) for f in grey])
    w, h, n, out = decode_avi(encode_avi_mjpeg(rgb, quality=95))
    assert (n, out.shape[1], out.shape[2]) == (2, 64, 72)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


def test_decode_video_dispatches_avi():
    avi = planted_avi_video(3, 3)
    w, h, n, frames = decode_video(avi)
    assert (w, h, n) == (72, 64, 3)
    assert frames.shape == (3, 64, 72, 3)


def test_not_an_avi_raises():
    for junk in (
        b"",
        b"RIFF",
        b"RIFF\x00\x00\x00\x00WAVE" + bytes(32),
        b"JUNK: not a video",
        b"GIF89a" + bytes(20),
    ):
        with pytest.raises(ValueError):
            decode_avi(junk)
        with pytest.raises(ValueError):
            decode_avi_meta(junk)


def test_truncation_raises():
    avi = encode_avi_mjpeg(_cell_frames(3))
    for cut in (20, len(avi) // 3, len(avi) - 7):
        with pytest.raises(ValueError):
            decode_avi(avi[:cut])


def test_bomb_guard_counts_chunks_before_decoding():
    """A crafted avih declaring huge dims must be rejected by the
    counted-chunks x dims bound BEFORE any JPEG decodes."""
    avi = bytearray(encode_avi_mjpeg(_cell_frames(2)))
    pos = bytes(avi).index(b"avih") + 8  # past fourcc + size
    # dwWidth/dwHeight are the 9th/10th u32 of avih
    struct.pack_into("<II", avi, pos + 32, 60000, 60000)
    with pytest.raises(ValueError, match="ceiling"):
        decode_avi(bytes(avi))


def test_frame_dims_must_agree_with_container():
    avi = bytearray(encode_avi_mjpeg(_cell_frames(2)))
    pos = bytes(avi).index(b"avih") + 8
    struct.pack_into("<II", avi, pos + 32, 36, 32)  # lie about dims
    with pytest.raises(ValueError, match="disagree"):
        decode_avi(bytes(avi))


def test_fuzz_mutations_never_crash_or_overallocate():
    """Single-byte mutations + truncations of a valid AVI: every
    outcome is a clean decode or ValueError — never IndexError /
    struct.error / MemoryError (the tolerant-stage contract; the
    embedded JPEG decoder maps its internal errors to ValueError)."""
    base = encode_avi_mjpeg(_cell_frames(3), quality=85)
    rng = np.random.RandomState(7)
    for _ in range(160):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(len(data))] = rng.randint(256)
        try:
            w, h, n, frames = decode_avi(bytes(data))
            assert frames.nbytes <= (1 << 28)
        except ValueError:
            pass
    for _ in range(40):
        cut = rng.randint(len(base))
        try:
            decode_avi(base[:cut])
        except ValueError:
            pass


def test_rec_grouping_lists_descend():
    """Interleaved AVIs group movi chunks inside 'rec ' LISTs; the
    walker must descend into them."""
    avi = encode_avi_mjpeg(_cell_frames(2))
    raw = bytes(avi)
    movi_at = raw.index(b"movi")
    list_start = movi_at - 8
    payload = raw[movi_at + 4 : list_start + 8 + struct.unpack_from("<I", raw, list_start + 4)[0]]
    rec = b"LIST" + struct.pack("<I", 4 + len(payload)) + b"rec " + payload
    new_movi = b"LIST" + struct.pack("<I", 4 + len(rec)) + b"movi" + rec
    head = raw[:list_start]
    body = head[8:] + new_movi  # 'AVI ' + hdrl + wrapped movi
    rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
    w, h, n, _ = decode_avi(rebuilt)
    assert n == 2


def test_uncompressed_db_frames_rejected_honestly():
    """##db chunks are uncompressed DIB rows — they must raise a clear
    unsupported-format error, not a misleading JPEG one (ADVICE r13)."""
    import pytest

    raw = bytearray(encode_avi_mjpeg(_cell_frames(2)))
    at = raw.index(b"00dc", raw.index(b"movi"))
    raw[at : at + 4] = b"00db"
    with pytest.raises(ValueError, match="uncompressed AVI"):
        decode_avi(bytes(raw))
