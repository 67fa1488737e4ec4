"""FLAC codec (ops/flac.py): encoder/decoder round-trips, HAND-BUILT
bitstreams exercising every decoder path the in-tree encoder never
emits (VERBATIM, CONSTANT, FIXED 3-4, LPC, all three stereo
decorrelation modes, wasted bits, multi-partition and escape residuals,
non-16-bit depths), CRC/MD5 integrity, bomb bounds, mutation fuzz, and
the shared-audio-path dispatch — the image codecs' discipline applied
to the audio side.  No independent FLAC implementation exists in this
container (unlike javax.imageio for TIFF/BMP), so the cross-checks are
test-local second implementations: bit-by-bit CRCs vs the module's
table-driven ones, and per-sample Python predictor loops vs the
module's vectorized restores."""

import hashlib
import struct

import numpy as np
import pytest

from outpost_spark.ops.flac import (
    _utf8_decode,
    _utf8_encode,
    _BitReader,
    decode_flac,
    decode_flac_meta,
    encode_flac,
    is_flac,
)

# ── test-local second implementations ───────────────────────────────────


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


class _BW:
    def __init__(self):
        self.bits: list[int] = []

    def w(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ws(self, v: int, n: int) -> None:  # signed two's-complement
        self.w(v & ((1 << n) - 1), n)

    def rice(self, r: int, k: int) -> None:
        v = ((-r) << 1) - 1 if r < 0 else r << 1  # zigzag fold
        q = v >> k
        self.bits.extend([0] * q)  # unary: q zeros then a 1
        self.bits.append(1)
        if k:
            self.w(v & ((1 << k) - 1), k)

    def to_bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(
            int("".join(map(str, bits[i : i + 8])), 2)
            for i in range(0, len(bits), 8)
        )


def _streaminfo(rate, ch, bps, total, md5=b"\x00" * 16) -> bytes:
    info = (16).to_bytes(2, "big") + (65535).to_bytes(2, "big") + b"\x00" * 6
    v = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    info += v.to_bytes(8, "big") + md5
    return b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info


def _frame(subframes, blocksize, ch_code, ss_code, frame_no=0) -> bytes:
    """Hand-built frame: 16-bit explicit blocksize, rate from
    STREAMINFO, ``subframes`` = callables writing bits into a _BW."""
    h = _BW()
    h.w(0b11111111111110, 14)
    h.w(0, 1)
    h.w(0, 1)  # fixed blocking
    h.w(7, 4)  # 16-bit blocksize-1 follows
    h.w(0, 4)  # rate from STREAMINFO
    h.w(ch_code, 4)
    h.w(ss_code, 3)
    h.w(0, 1)
    hdr = h.to_bytes() + _utf8_encode(frame_no) + (blocksize - 1).to_bytes(2, "big")
    hdr += bytes([_crc8(hdr)])
    b = _BW()
    for byte in hdr:
        b.w(byte, 8)
    for sf in subframes:
        sf(b)
    body = b.to_bytes()
    return body + _crc16(body).to_bytes(2, "big")


def _verbatim(samples, bps):
    def sf(b):
        b.w(0, 1)
        b.w(1, 6)
        b.w(0, 1)
        for s in samples:
            b.ws(s, bps)

    return sf


def _residual(b, resid, k, porder=0, order=0, blocksize=None):
    method = 0 if k <= 14 else 1
    b.w(method, 2)
    b.w(porder, 4)
    base = blocksize >> porder
    idx = 0
    for p in range(1 << porder):
        cnt = base - order if p == 0 else base
        b.w(k, 4 + method)
        for r in resid[idx : idx + cnt]:
            b.rice(r, k)
        idx += cnt


# ── encoder/decoder round-trips ─────────────────────────────────────────


def test_roundtrip_mono_stereo_and_rates():
    rng = np.random.RandomState(11)
    n = 9000
    x = (1500 * np.sin(2 * np.pi * 300 * np.arange(n) / 8000)
         + rng.randint(-80, 80, n)).astype("<i2")
    for rate in (8000, 44100, 11025, 12347, 192000, 384000):
        arr, r, bps = decode_flac(encode_flac(x, rate))
        assert (r, bps) == (rate, 16) and (arr[:, 0] == x).all()
    st = np.empty(2 * n, dtype="<i2")
    st[0::2], st[1::2] = x, (x // 3).astype("<i2")
    arr, r, _ = decode_flac(encode_flac(st, 16000, channels=2))
    assert (arr[:, 0] == x).all() and (arr[:, 1] == x // 3).all()


def test_roundtrip_edges():
    # constant, tiny final frame, empty stream, full-scale values
    c = np.full(4100, -7, dtype="<i2")
    assert (decode_flac(encode_flac(c, 8000))[0][:, 0] == c).all()
    tiny = np.arange(5, dtype="<i2")
    assert (decode_flac(encode_flac(tiny, 8000))[0][:, 0] == tiny).all()
    empty, rate, _ = decode_flac(encode_flac(np.empty(0, dtype="<i2"), 8000))
    assert empty.shape == (0, 1) and rate == 8000
    ext = np.array([-32768, 32767] * 500, dtype="<i2")
    assert (decode_flac(encode_flac(ext, 8000))[0][:, 0] == ext).all()


def test_compresses_real_signal():
    from outpost_spark.ops.multimodal import _wav_samples, planted_clip_wav

    # the planted 9-sine grid is a worst case for fixed predictors —
    # still must not EXPAND past the raw PCM it encodes
    arr, rate = _wav_samples(planted_clip_wav(2, 0))
    f = encode_flac(arr[:, 0], rate)
    assert len(f) < 2 * len(arr) + 256
    assert decode_flac_meta(f)["n_frames"] == len(arr)
    # a smooth signal compresses well
    smooth = (8000 * np.sin(np.arange(16384) / 20)).astype("<i2")
    assert len(encode_flac(smooth, 8000)) < 0.7 * 2 * len(smooth)


def test_utf8_coded_numbers():
    for n in (0, 0x7F, 0x80, 0x7FF, 0x800, 1 << 16, 1 << 20, 1 << 31,
              (1 << 36) - 1):
        enc = _utf8_encode(n)
        br = _BitReader(enc)
        assert _utf8_decode(br) == n, n
    assert _utf8_encode(0x80) == b"\xc2\x80"  # agrees with standard UTF-8
    with pytest.raises(ValueError):
        _utf8_encode(1 << 36)


# ── hand-built streams: decoder paths the encoder never emits ──────────


def _decode_one(frame_bytes, rate=8000, ch=1, bps=16, total=None, n=None):
    total = n if total is None else total
    return decode_flac(_streaminfo(rate, ch, bps, total) + frame_bytes)


def test_handbuilt_verbatim_and_constant():
    rng = np.random.RandomState(3)
    x = rng.randint(-30000, 30000, 64).tolist()
    arr, _, _ = _decode_one(_frame([_verbatim(x, 16)], 64, 0, 4), n=64)
    assert arr[:, 0].tolist() == x

    def const(b):
        b.w(0, 1)
        b.w(0, 6)
        b.w(0, 1)
        b.ws(-1234, 16)

    arr, _, _ = _decode_one(_frame([const], 64, 0, 4), n=64)
    assert (arr[:, 0] == -1234).all()


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_handbuilt_fixed_orders(order):
    """Residuals computed with a per-sample Python loop (the spec's
    recurrence, independent of the module's cumsum restore)."""
    rng = np.random.RandomState(order)
    x = np.cumsum(rng.randint(-40, 40, 96)).astype(int).tolist()
    coeff = {1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
    resid = [
        x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coeff))
        for i in range(order, len(x))
    ]

    def sf(b):
        b.w(0, 1)
        b.w(8 + order, 6)
        b.w(0, 1)
        for w in x[:order]:
            b.ws(w, 16)
        _residual(b, resid, k=4, order=order, blocksize=len(x))

    arr, _, _ = _decode_one(_frame([sf], len(x), 0, 4), n=len(x))
    assert arr[:, 0].tolist() == x


def test_handbuilt_lpc():
    rng = np.random.RandomState(9)
    order, prec, shift = 3, 12, 5
    coefs = [40, -12, 3]  # stable: |poles| < 1 after the >>5 scaling
    warm = [100, -50, 30]
    resid = rng.randint(-20, 20, 61).tolist()
    x = list(warm)
    for r in resid:  # the spec recurrence, per sample
        i = len(x)
        pred = sum(c * x[i - 1 - j] for j, c in enumerate(coefs)) >> shift
        x.append(r + pred)
    assert max(abs(v) for v in x) < 1 << 15  # the filter stayed stable

    def sf(b):
        b.w(0, 1)
        b.w(32 + order - 1, 6)
        b.w(0, 1)
        for w in warm:
            b.ws(w, 16)
        b.w(prec - 1, 4)
        b.ws(shift, 5)
        for c in coefs:
            b.ws(c, prec)
        _residual(b, resid, k=3, order=order, blocksize=64)

    arr, _, _ = _decode_one(_frame([sf], 64, 0, 4), n=64)
    assert arr[:, 0].tolist() == x


@pytest.mark.parametrize("mode", [8, 9, 10])
def test_handbuilt_stereo_decorrelation(mode):
    rng = np.random.RandomState(mode)
    L = rng.randint(-20000, 20000, 48).tolist()
    R = rng.randint(-20000, 20000, 48).tolist()
    side = [a - b for a, b in zip(L, R)]
    if mode == 8:  # left/side
        chans = [(L, 16), (side, 17)]
    elif mode == 9:  # right/side
        chans = [(side, 17), (R, 16)]
    else:  # mid/side
        mid = [(a + b) >> 1 for a, b in zip(L, R)]
        chans = [(mid, 16), (side, 17)]
    frame = _frame([_verbatim(v, w) for v, w in chans], 48, mode, 4)
    arr, _, _ = decode_flac(_streaminfo(8000, 2, 16, 48) + frame)
    assert arr[:, 0].tolist() == L and arr[:, 1].tolist() == R


def test_handbuilt_wasted_bits():
    x = [v * 4 for v in (-100, 7, 999, -8000, 0, 31, -2, 5) * 4]

    def sf(b):
        b.w(0, 1)
        b.w(1, 6)  # verbatim
        b.w(1, 1)  # wasted-bits flag
        b.w(0b01, 2)  # unary 1 -> wasted = 2
        for s in x:
            b.ws(s >> 2, 14)

    arr, _, _ = _decode_one(_frame([sf], len(x), 0, 4), n=len(x))
    assert arr[:, 0].tolist() == x


def test_handbuilt_partitions_and_escape():
    """porder=2 (four partitions, distinct parameters) and an escape
    partition carrying raw 7-bit residuals, plus a raw=0 partition."""
    rng = np.random.RandomState(5)
    x = np.cumsum(rng.randint(-30, 30, 64)).astype(int).tolist()
    resid = [x[i] - x[i - 1] for i in range(1, 64)]

    def sf(b):
        b.w(0, 1)
        b.w(8 + 1, 6)  # fixed order 1
        b.w(0, 1)
        b.ws(x[0], 16)
        b.w(0, 2)  # method 0
        b.w(2, 4)  # porder 2 -> partitions of 16 (first minus order)
        idx = 0
        for p, k in enumerate((3, 15, 5, 15)):
            cnt = 15 if p == 0 else 16
            if k == 15 and p == 1:  # escape: raw 7-bit
                b.w(15, 4)
                b.w(7, 5)
                for r in resid[idx : idx + cnt]:
                    b.ws(r, 7)
            elif k == 15:  # escape with raw=0: all zeros
                b.w(15, 4)
                b.w(0, 5)
            else:
                b.w(k, 4)
                for r in resid[idx : idx + cnt]:
                    b.rice(r, k)
            idx += cnt

    # make partition 3 (the raw=0 one) actually all-zero residuals
    for i in range(1 + 15 + 16 + 16, 64):
        x[i] = x[1 + 15 + 16 + 16 - 1]
    resid = [x[i] - x[i - 1] for i in range(1, 64)]
    arr, _, _ = _decode_one(_frame([sf], 64, 0, 4), n=64)
    assert arr[:, 0].tolist() == x


def test_handbuilt_8_bit_depth_normalizes():
    from outpost_spark.ops.multimodal import _wav_samples

    def const(b):
        b.w(0, 1)
        b.w(0, 6)
        b.w(0, 1)
        b.ws(-5, 8)

    stream = _streaminfo(8000, 1, 8, 32) + _frame([const], 32, 0, 1)
    arr, rate, bps = decode_flac(stream)
    assert bps == 8 and (arr[:, 0] == -5).all()
    a16, _ = _wav_samples(stream)
    assert (a16[:, 0] == -5 << 8).all()  # left-justified like 8-bit WAV


def test_multi_frame_stream():
    xs = [np.arange(i * 100, i * 100 + 64, dtype="<i2") for i in range(3)]
    frames = b"".join(
        _frame([_verbatim(x.tolist(), 16)], 64, 0, 4, frame_no=i)
        for i, x in enumerate(xs)
    )
    arr, _, _ = decode_flac(_streaminfo(8000, 1, 16, 192) + frames)
    assert arr[:, 0].tolist() == np.concatenate(xs).tolist()


# ── integrity, bombs, fuzz ──────────────────────────────────────────────


def test_crc_and_md5_guards():
    x = (np.arange(5000) % 251 - 125).astype("<i2")
    good = encode_flac(x, 8000)
    # header CRC-8: flip the blocksize byte of the first frame
    at = 42  # 4 magic + 4 block header + 34 STREAMINFO
    assert good[at : at + 2] == b"\xff\xf8"
    b = bytearray(good)
    b[at + 2] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(b))
    # body CRC-16
    b = bytearray(good)
    b[-3] ^= 0x04
    with pytest.raises(ValueError):
        decode_flac(bytes(b))
    # MD5: corrupt the stored digest only (frames untouched)
    b = bytearray(good)
    b[8 + 18] ^= 0xFF  # first md5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(b))
    # sample-count disagreement
    b = bytearray(good)
    b[8 + 17] ^= 0x01  # low bit of the 36-bit total
    with pytest.raises(ValueError, match="sample count|MD5"):
        decode_flac(bytes(b))


def test_bomb_guard_fires_before_decoding():
    huge = _streaminfo(8000, 8, 16, 1 << 35)
    with pytest.raises(ValueError, match="ceiling"):
        decode_flac(huge)


def test_fuzz_mutations_never_crash_or_overallocate():
    rng = np.random.RandomState(0)
    x = (2000 * np.sin(np.arange(6000) / 5)).astype("<i2")
    base = encode_flac(x, 8000)
    for _ in range(200):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(len(data))] ^= 1 << rng.randint(8)
        try:
            arr, _, _ = decode_flac(bytes(data))
            assert arr.nbytes <= (1 << 28)
        except ValueError:
            pass
    for _ in range(40):
        cut = rng.randint(len(base))
        try:
            decode_flac(base[:cut])
        except ValueError:
            pass
    assert not is_flac(b"RIFF" + b"\x00" * 64)


# ── the shared audio path ───────────────────────────────────────────────


def test_dispatch_through_shared_audio_path():
    from outpost_spark.ops.flac import encode_flac
    from outpost_spark.ops.multimodal import (
        _wav_samples,
        audio_fingerprint,
        decode_audio,
        planted_clip_wav,
        resample_wav,
        trim_silence_wav,
    )

    w = planted_clip_wav(5, 2)
    arr, rate = _wav_samples(w)
    f = encode_flac(arr[:, 0], rate)
    # lossless: the FLAC twin fingerprints IDENTICALLY
    assert audio_fingerprint(f) == audio_fingerprint(w)
    meta = decode_audio(f)
    assert meta["kind"] == "flac" and meta["sample_rate"] == rate
    assert meta["n_frames"] == len(arr)
    # container-preserving stages (the resize_images convention)
    trimmed, _, _ = trim_silence_wav(f)
    assert is_flac(trimmed)
    rs = resample_wav(f, target_rate=16000)
    assert is_flac(rs) and decode_audio(rs)["sample_rate"] == 16000
    # all-silence trims to an empty, still-valid FLAC
    silent = encode_flac(np.zeros(4000, dtype="<i2"), 8000)
    empty, _, _ = trim_silence_wav(silent)
    assert is_flac(empty) and decode_audio(empty)["n_frames"] == 0


def test_corpus_contains_flac_members(spark):
    """cross_format plants FLAC re-encodes on odd ids — pinned so a
    generator change can't silently drop the compressed-audio slice
    from the value-oracled crossformat entry (r14)."""
    from pyspark.sql import functions as F

    from outpost_spark.ops.multimodal import planted_audio_dedup_corpus

    ids = spark.range(1, 8).select(F.col("id").alias("doc_id"))
    rows = {
        r["id"]: bytes(r["content"])
        for r in planted_audio_dedup_corpus(
            ids, id_col="doc_id", cross_format=True
        ).collect()
    }
    assert rows[2][:4] == b"RIFF" and rows[4][:4] == b"RIFF"
    assert rows[1][:4] == b"fLaC" and rows[3][:4] == b"fLaC"


def test_catalog_crossformat_entry_matches_planted_answer(spark):
    from outpost_spark.queries_catalog import queries

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r["id_a"], r["id_b"])
        for r in queries()["dedup_audio_crossformat_pairs"](
            spark, sf_dir
        ).collect()
    }
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    ok = [i for i in doc_ids if i % 29 != 0]
    want = {
        (a, b)
        for a in ok
        for b in ok
        if a < b and a // 4 == b // 4
    }
    assert got == want and len(want) > 50


def test_unstable_lpc_rejected_bounded():
    """A crafted explosive LPC filter must raise, not grow Python
    bignums without bound."""

    def sf(b):
        b.w(0, 1)
        b.w(32 + 0, 6)  # LPC order 1
        b.w(0, 1)
        b.ws(20000, 16)
        b.w(11, 4)  # precision 12
        b.ws(0, 5)  # shift 0
        b.ws(2000, 12)  # x[i] = r + 2000*x[i-1]: explodes
        _residual(b, [1] * 63, k=0, order=1, blocksize=64)

    with pytest.raises(ValueError, match="out of range"):
        _decode_one(_frame([sf], 64, 0, 4), n=64)


def test_partition_base_equal_to_order_rejected():
    """RFC 9639 §9.2.7: (blocksize >> porder) must be STRICTLY greater
    than the predictor order — base == order leaves the first partition
    empty, which the spec forbids (ADVICE r14: previously decoded
    leniently).  blocksize 64, porder 4, fixed order 4 -> base 4 == 4."""

    def sf(b):
        b.w(0, 1)
        b.w(8 + 4, 6)  # FIXED order 4
        b.w(0, 1)
        for w in (1, 2, 3, 4):
            b.ws(w, 16)
        _residual(b, [0] * 60, k=4, porder=4, order=4, blocksize=64)

    with pytest.raises(ValueError, match="partition order"):
        _decode_one(_frame([sf], 64, 0, 4), n=64)


@pytest.mark.parametrize("sf_type", [8 + 4, 32 + 3])  # FIXED 4, LPC 4
def test_predictor_order_equal_to_blocksize_rejected(sf_type):
    """order == blocksize would leave a zero-length residual — RFC 9639
    requires the predictor order to be LESS than the block size
    (ADVICE r14: the old guard only rejected order > blocksize)."""

    def sf(b):
        b.w(0, 1)
        b.w(sf_type, 6)
        b.w(0, 1)

    with pytest.raises(ValueError, match="predictor order"):
        _decode_one(_frame([sf], 4, 0, 4), n=4)


def test_encode_validates_rate_and_channels_upfront():
    """STREAMINFO's sample-rate field is 20 bits: out-of-range rates
    must raise a descriptive ValueError up front, not an OverflowError
    deep inside header packing (ADVICE r14); channel validation happens
    before any sample truncation/reshape."""
    x = np.zeros(100, dtype="<i2")
    for rate in (0, -1, 1 << 20, 1 << 25):
        with pytest.raises(ValueError, match="sample rate"):
            encode_flac(x, rate)
    for ch in (0, 9):
        with pytest.raises(ValueError, match="channels"):
            encode_flac(x, 8000, channels=ch)
    # the boundary rate itself is legal end-to-end: the frame header
    # can't code it directly, so frames defer to STREAMINFO (code 0)
    top = (1 << 20) - 1
    ramp = (np.arange(200) * 11 % 401 - 200).astype("<i2")
    arr, rate, _ = decode_flac(encode_flac(ramp, top))
    assert rate == top and (arr[:, 0] == ramp).all()
