"""Cross-surface decode fuzz: mutated and truncated members of EVERY
format (PNG, BMP, sequential + successive-approximation-progressive
JPEG, GIF still + animation, AVI/MJPEG, RVID, WAV, FLAC) driven through
EVERY decode entry point — the tolerant-stage contract says each call
either succeeds or raises ValueError, never zlib.error / struct.error
/ IndexError / MemoryError.  This sweep caught three real escapes in
round 13 (zlib.error from the bounded PNG inflate, struct errors from
truncated IHDR and JPEG SOF payloads)."""

import numpy as np

from outpost_spark.ops.gif import decode_gif_frames
from outpost_spark.ops.multimodal import (
    _wav_samples,
    decode_audio,
    decode_image,
    decode_video,
    encode_rawvideo,
    image_pixels,
    planted_avi_video,
    planted_bmp,
    planted_clip_wav,
    planted_gif,
    planted_gif_animation,
    planted_jpeg,
    planted_png,
    resize_image,
)


def _members():
    return [
        planted_png(1, 0),
        planted_bmp(1, 0),
        __import__("outpost_spark.ops.tiff", fromlist=["encode_tiff"]).encode_tiff(
            (np.arange(18 * 16, dtype=np.uint8).reshape(16, 18) * 5) % 241,
            packbits=True,
        ),
        planted_jpeg(1, 0),
        planted_jpeg(1, 0, progressive=True, successive=True),
        planted_gif(1, 0),
        planted_gif_animation(1, 4),
        planted_avi_video(1, 3),
        planted_clip_wav(1, 0),
        __import__("outpost_spark.ops.flac", fromlist=["encode_flac"]).encode_flac(
            (1000 * np.sin(np.arange(6000) / 7)).astype("<i2"), 8000
        ),
        encode_rawvideo(np.stack([np.zeros((4, 5, 3), np.uint8)] * 2)),
    ]


_FNS = [
    decode_image,
    image_pixels,
    lambda b: resize_image(b, 0.5),
    decode_video,
    decode_audio,
    _wav_samples,
    decode_gif_frames,
]


def test_every_decoder_holds_the_valueerror_contract():
    rng = np.random.RandomState(20260816)
    for base in _members():
        for _ in range(60):
            data = bytearray(base)
            for _ in range(rng.randint(1, 6)):
                data[rng.randint(len(data))] = rng.randint(256)
            if rng.random() < 0.25:
                data = data[: rng.randint(1, len(data))]
            blob = bytes(data)
            for fn in _FNS:
                try:
                    out = fn(blob)
                    if hasattr(out, "nbytes"):
                        assert out.nbytes <= (1 << 28)
                except ValueError:
                    pass


def test_cross_magic_junk_never_crashes():
    members = _members()
    rng = np.random.RandomState(7)
    pool = [a[:12] + b[12:] for a in members for b in members if a is not b]
    pool += [
        bytes(rng.randint(0, 255, n, dtype=np.uint8)) for n in (0, 1, 13, 64)
    ]
    for blob in pool:
        for fn in _FNS:
            try:
                fn(blob)
            except ValueError:
                pass
