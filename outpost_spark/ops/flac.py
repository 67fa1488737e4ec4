"""FLAC codec — stdlib + numpy, no codec libraries (r14).

The audio analog of ``ops/avi.py``: real crawl audio is compressed, and
FLAC is the one mainstream lossless format whose coding tools (Rice
residuals over fixed/LPC predictors) are implementable exactly with
stdlib bit arithmetic — MP3/OGG entropy coding stays honestly
injectable, the same judgment the image side made for WebP.  Format per
the public FLAC specification (RFC 9639; also the xiph.org format
document): ``fLaC`` magic + STREAMINFO, then byte-aligned frames of
CRC-8-protected headers, per-channel subframes (CONSTANT / VERBATIM /
FIXED order 0-4 / LPC order 1-32, wasted-bits shift), partitioned Rice
residuals (4- and 5-bit parameters, raw-bits escape), stereo
decorrelation (left/side, right/side, mid/side), and a CRC-16 footer;
STREAMINFO carries an MD5 of the unencoded samples, verified when set.

``decode_flac`` -> (samples int32 [n, ch], rate, bps) raises
``ValueError`` for non-FLAC / unsupported / corrupt input and for
streams past the decode ceiling (bomb guard BEFORE allocation).
``encode_flac`` writes 16-bit streams with fixed predictors (best of
order 0-2 per channel) and single-partition Rice residuals — decode's
inverse, readable by any standard FLAC player.
"""

from __future__ import annotations

import hashlib

__all__ = [
    "is_flac",
    "decode_flac",
    "decode_flac_meta",
    "encode_flac",
]

# hard ceiling on decoded samples*channels — a 34-byte STREAMINFO can
# claim anything, so the guard fires before any frame allocates
_MAX_SAMPLES = 1 << 25

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ _CRC16_TABLE[(c >> 8) ^ b]
    return c


def is_flac(content: bytes) -> bool:
    return len(content) >= 42 and content[:4] == b"fLaC"


# ---------------------------------------------------------------------------
# bit IO


class _BitReader:
    """MSB-first bit reader; ``unary`` (count 0-bits to the next 1) runs
    off a precomputed set-bit index so Rice quotients cost one bisect,
    not a per-bit loop."""

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits
        self.nbits = len(buf) * 8
        self._ones = None

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("truncated FLAC stream")
        self.pos = p + n
        if n == 0:
            return 0
        b1 = (p + n + 7) >> 3
        chunk = int.from_bytes(self.buf[p >> 3 : b1], "big")
        return (chunk >> ((b1 << 3) - (p + n))) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >> (n - 1) else v

    def unary(self) -> int:
        if self._ones is None:
            import numpy as np

            self._ones = np.flatnonzero(
                np.unpackbits(np.frombuffer(self.buf, dtype=np.uint8))
            ).tolist()
        from bisect import bisect_left

        i = bisect_left(self._ones, self.pos)
        if i >= len(self._ones):
            raise ValueError("truncated FLAC stream")
        t = self._ones[i]
        q = t - self.pos
        self.pos = t + 1
        return q


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nb += bits
        while self.nb >= 8:
            self.nb -= 8
            self.buf.append((self.acc >> self.nb) & 0xFF)
        self.acc &= (1 << self.nb) - 1

    def write_unary(self, q: int) -> None:
        while q >= 48:
            self.write(0, 48)
            q -= 48
        self.write(1, q + 1)  # q zeros then the terminating 1

    def align(self) -> None:
        if self.nb:
            self.write(0, 8 - self.nb)


# ---------------------------------------------------------------------------
# UTF-8-style coded number (frame/sample number; extended to 36 bits)

_UTF8_CAPS = {2: 11, 3: 16, 4: 21, 5: 26, 6: 31, 7: 36}


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for j in range(2, 8):
        if n < (1 << _UTF8_CAPS[j]):
            conts = [0x80 | ((n >> (6 * k)) & 0x3F) for k in range(j - 1)][::-1]
            lead = 0xFE if j == 7 else (
                ((0xFF << (8 - j)) & 0xFF) | (n >> (6 * (j - 1)))
            )
            return bytes([lead] + conts)
    raise ValueError("coded number exceeds 36 bits")


def _utf8_decode(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    j = 0
    while j < 8 and (b0 << j) & 0x80:
        j += 1
    if j < 2 or j > 7:
        raise ValueError("malformed FLAC coded number")
    n = 0 if j == 7 else b0 & (0x7F >> j)
    for _ in range(j - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("malformed FLAC coded number")
        n = (n << 6) | (b & 0x3F)
    return n


# ---------------------------------------------------------------------------
# decode

_BLOCK_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_RATE_FIXED = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _parse_streaminfo(content: bytes):
    if not is_flac(content):
        raise ValueError("not a FLAC: missing fLaC magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("truncated FLAC metadata")
        hdr = content[pos]
        size = int.from_bytes(content[pos + 1 : pos + 4], "big")
        if pos + 4 + size > len(content):
            raise ValueError("truncated FLAC metadata block")
        btype = hdr & 0x7F
        if btype == 127:
            raise ValueError("invalid FLAC metadata block type")
        if btype == 0:
            if size < 34:
                raise ValueError("short FLAC STREAMINFO")
            info = content[pos + 4 : pos + 4 + size]
        pos += 4 + size
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    v = int.from_bytes(info[10:18], "big")
    rate = v >> 44
    ch = ((v >> 41) & 0x7) + 1
    bps = ((v >> 36) & 0x1F) + 1
    total = v & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("FLAC STREAMINFO with zero sample rate")
    return pos, rate, ch, bps, total, info[18:34]


def decode_flac_meta(content: bytes) -> dict:
    """STREAMINFO walk only: rate, channels, depth, length — no frames."""
    _pos, rate, ch, bps, total, _md5 = _parse_streaminfo(content)
    return {
        "kind": "flac",
        "sample_rate": int(rate),
        "channels": int(ch),
        "bit_depth": int(bps),
        "n_frames": int(total),
        "duration_s": total / rate,
    }


def _decode_residual(br: _BitReader, blocksize: int, order: int):
    import numpy as np

    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    base = blocksize >> porder
    # RFC 9639 §9.2.7: (blocksize >> porder) MUST be strictly greater
    # than the predictor order — base == order would make the first
    # partition empty, which the spec forbids (ADVICE r14: the old
    # `base < order` check decoded such streams leniently)
    if base << porder != blocksize or base <= order:
        raise ValueError("invalid FLAC residual partition order")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    read, unary = br.read, br.unary
    for p in range(nparts):
        cnt = base - order if p == 0 else base
        param = read(pbits)
        if param == escape:
            raw = read(5)
            for i in range(cnt):
                out[idx + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(cnt):
                v = (unary() << param) | read(param)
                out[idx + i] = (v >> 1) ^ -(v & 1)
        idx += cnt
    return out


def _restore_fixed(order: int, warm, resid, blocksize: int):
    import numpy as np

    if order == 0:
        return np.asarray(resid, dtype=np.int64)
    w = np.asarray(warm, dtype=np.int64)
    # cur holds the k-th finite difference at indices k..blocksize-1;
    # each pass integrates one level, seeding with d_{k-1}[k-1] derived
    # from the warmup samples
    cur = np.asarray(resid, dtype=np.int64)
    for k in range(order, 0, -1):
        seed = int(np.diff(w, n=k - 1)[0]) if k > 1 else int(w[0])
        cur = np.cumsum(np.concatenate(([seed], cur)))
    return cur


def _decode_subframe(br: _BitReader, blocksize: int, bps: int):
    import numpy as np

    if br.read(1):
        raise ValueError("invalid FLAC subframe padding bit")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    eff = bps - wasted
    if eff < 1:
        raise ValueError("FLAC wasted bits exceed sample size")
    if t == 0:
        arr = np.full(blocksize, br.read_signed(eff), dtype=np.int64)
    elif t == 1:
        arr = np.fromiter(
            (br.read_signed(eff) for _ in range(blocksize)),
            dtype=np.int64, count=blocksize,
        )
    elif 8 <= t <= 12:
        order = t - 8
        # strictly less: order == blocksize would leave a zero-length
        # residual, which RFC 9639 forbids (ADVICE r14)
        if order and order >= blocksize:
            raise ValueError("FLAC predictor order exceeds block size")
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        arr = _restore_fixed(order, warm, resid, blocksize)
    elif t >= 32:
        order = (t & 31) + 1
        if order >= blocksize:
            raise ValueError("FLAC predictor order exceeds block size")
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        samples = list(warm)
        for r in resid.tolist():
            i = len(samples)
            pred = 0
            for tt, c in enumerate(coefs):
                pred += c * samples[i - 1 - tt]
            s = int(r) + (pred >> shift)
            # a crafted unstable filter otherwise grows Python bignums
            # without bound (quadratic time, unbounded memory)
            if not -(1 << 48) <= s <= 1 << 48:
                raise ValueError("FLAC LPC output out of range")
            samples.append(s)
        arr = np.asarray(samples, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    if wasted:
        arr = arr << wasted
    return arr


def _decode_frame(br: _BitReader, content: bytes, s_rate: int, s_ch: int,
                  s_bps: int):
    if br.pos & 7:
        raise ValueError("FLAC frame not byte-aligned")
    hdr_start = br.pos >> 3
    if br.read(14) != 0b11111111111110:
        raise ValueError("bad FLAC frame sync")
    if br.read(1):
        raise ValueError("reserved FLAC frame bit set")
    br.read(1)  # blocking strategy — number semantics only
    bs_code = br.read(4)
    rate_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise ValueError("reserved FLAC frame bit set")
    _utf8_decode(br)
    if bs_code == 0:
        raise ValueError("reserved FLAC block size code")
    elif bs_code in _BLOCK_FIXED:
        blocksize = _BLOCK_FIXED[bs_code]
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)
    if rate_code == 0:
        rate = s_rate
    elif rate_code in _RATE_FIXED:
        rate = _RATE_FIXED[rate_code]
    elif rate_code == 12:
        rate = br.read(8) * 1000
    elif rate_code == 13:
        rate = br.read(16)
    elif rate_code == 14:
        rate = br.read(16) * 10
    else:
        raise ValueError("invalid FLAC sample rate code")
    if rate != s_rate:
        raise ValueError("FLAC frame rate disagrees with STREAMINFO")
    if ch_code < 8:
        nch, mode = ch_code + 1, None
    elif ch_code in (8, 9, 10):
        nch, mode = 2, ch_code
    else:
        raise ValueError("reserved FLAC channel assignment")
    if nch != s_ch:
        raise ValueError("FLAC frame channels disagree with STREAMINFO")
    bps = {0: s_bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
    if bps is None:
        raise ValueError("reserved FLAC sample size code")
    if (br.pos & 7) or _crc8(content[hdr_start : br.pos >> 3]) != br.read(8):
        raise ValueError("FLAC frame header CRC-8 mismatch")
    chans = []
    for c in range(nch):
        side = mode is not None and (
            (mode == 8 and c == 1) or (mode == 9 and c == 0)
            or (mode == 10 and c == 1)
        )
        chans.append(_decode_subframe(br, blocksize, bps + (1 if side else 0)))
    br.pos = (br.pos + 7) & ~7
    footer_at = br.pos >> 3
    if _crc16(content[hdr_start:footer_at]) != br.read(16):
        raise ValueError("FLAC frame CRC-16 mismatch")
    if mode == 8:  # left/side
        chans[1] = chans[0] - chans[1]
    elif mode == 9:  # right/side
        chans[0] = chans[1] + chans[0]
    elif mode == 10:  # mid/side
        mid, side = chans
        m2 = (mid << 1) | (side & 1)
        chans = [(m2 + side) >> 1, (m2 - side) >> 1]
    return blocksize, chans, bps


def decode_flac(content: bytes):
    """Full decode -> (samples int32 ndarray [n, channels], rate, bps).
    Verifies per-frame CRC-8/CRC-16 and the STREAMINFO MD5 when set;
    raises ``ValueError`` on anything malformed."""
    import numpy as np

    data_start, rate, ch, s_bps, total, md5 = _parse_streaminfo(content)
    if total * ch > _MAX_SAMPLES:
        raise ValueError("audio exceeds the decode size ceiling")
    br = _BitReader(content, data_start * 8)
    parts = []
    got = 0
    bps = s_bps
    while br.nbits - br.pos >= 16:
        blocksize, chans, bps = _decode_frame(br, content, rate, ch, s_bps)
        got += blocksize
        if got * ch > _MAX_SAMPLES:
            raise ValueError("audio exceeds the decode size ceiling")
        parts.append(np.stack(chans, axis=1))
    if not parts:
        if total:
            raise ValueError("FLAC with no frames")
        # a STREAMINFO-only stream with total=0 is legal (the encode of
        # an all-silence-trimmed clip)
        return np.empty((0, ch), dtype=np.int32), int(rate), int(s_bps)
    arr = np.concatenate(parts, axis=0)
    if total and len(arr) != total:
        raise ValueError("FLAC sample count disagrees with STREAMINFO")
    if md5 != b"\x00" * 16:
        if bps % 8:
            raise ValueError(f"unsupported FLAC bit depth {bps} for MD5")
        # MD5 is over the original interleaved little-endian samples at
        # the stream's width; numpy has no 24-bit dtype, so slice bytes
        width = bps // 8
        if width == 3:
            quads = np.ascontiguousarray(arr.astype("<i4")).view(np.uint8)
            raw = quads.reshape(-1, 4)[:, :3].tobytes()
        else:
            raw = arr.astype(f"<i{width}").tobytes()
        if hashlib.md5(raw).digest() != md5:
            raise ValueError("FLAC MD5 mismatch")
    return arr.astype(np.int32), int(rate), int(bps)


# ---------------------------------------------------------------------------
# encode


def _rice_cost(fold, k: int) -> int:
    import numpy as np

    return int(len(fold) * (k + 1) + int(np.sum(fold >> k)))


def _write_residual(bw: _BitWriter, resid) -> None:
    import numpy as np

    fold = ((resid << 1) ^ (resid >> 63)).astype(np.uint64)
    best_k, best_c = 0, None
    for k in range(31):
        c = _rice_cost(fold, k)
        if best_c is None or c < best_c:
            best_k, best_c = k, c
        if (1 << k) > int(fold.max(initial=0)):
            break
    method = 0 if best_k <= 14 else 1
    bw.write(method, 2)
    bw.write(0, 4)  # partition order 0
    bw.write(best_k, 4 + method)
    q = (fold >> best_k).tolist()
    low = (fold & ((1 << best_k) - 1)).tolist() if best_k else None
    for i in range(len(q)):
        bw.write_unary(int(q[i]))
        if best_k:
            bw.write(int(low[i]), best_k)


def _encode_frame(fi: int, chans, rate: int, bps: int) -> bytes:
    import numpy as np

    bs = len(chans[0])
    if bs == 192:
        bs_code, bs_extra = 1, None
    elif bs in (576, 1152, 2304, 4608):
        bs_code, bs_extra = 2 + (576, 1152, 2304, 4608).index(bs), None
    elif bs in tuple(256 << k for k in range(8)):
        bs_code, bs_extra = 8 + tuple(256 << k for k in range(8)).index(bs), None
    elif bs <= 256:
        bs_code, bs_extra = 6, (bs - 1, 8)
    else:
        bs_code, bs_extra = 7, (bs - 1, 16)
    rate_code, rate_extra = None, None
    for code, r in _RATE_FIXED.items():
        if r == rate:
            rate_code = code
    if rate_code is None:
        if rate % 1000 == 0 and rate // 1000 < 256:
            rate_code, rate_extra = 12, (rate // 1000, 8)
        elif rate < 65536:
            rate_code, rate_extra = 13, (rate, 16)
        elif rate % 10 == 0 and rate // 10 < 65536:
            rate_code, rate_extra = 14, (rate // 10, 16)
        else:
            # rates the header codes can't express defer to STREAMINFO
            # (code 0) — always legal, and encode_flac already bounded
            # the rate to STREAMINFO's 20-bit field
            rate_code, rate_extra = 0, None
    hdr = bytearray([0xFF, 0xF8, (bs_code << 4) | rate_code,
                     ((len(chans) - 1) << 4) | (4 << 1)])  # 16-bit code
    hdr += _utf8_encode(fi)
    if bs_extra:
        hdr += bs_extra[0].to_bytes(bs_extra[1] // 8, "big")
    if rate_extra:
        hdr += rate_extra[0].to_bytes(rate_extra[1] // 8, "big")
    hdr.append(_crc8(bytes(hdr)))
    bw = _BitWriter()
    for b in hdr:
        bw.write(b, 8)
    for x in chans:
        x = np.asarray(x, dtype=np.int64)
        best_order, best_resid, best_cost = 0, x, int(np.abs(x).sum())
        for order in (1, 2):
            if bs <= order:
                break
            r = np.diff(x, n=order)
            c = int(np.abs(r).sum())
            if c < best_cost:
                best_order, best_resid, best_cost = order, r, c
        bw.write(0, 1)
        bw.write(8 + best_order, 6)  # FIXED, order
        bw.write(0, 1)  # no wasted bits
        for w in x[:best_order].tolist():
            bw.write(int(w), bps)
        _write_residual(bw, best_resid)
    bw.align()
    body = bytes(bw.buf)
    return body + _crc16(body).to_bytes(2, "big")


def encode_flac(samples, rate: int, channels: int = 1, *,
                block_size: int = 4096) -> bytes:
    """16-bit PCM -> FLAC (fixed predictors, single-partition Rice) —
    decode's inverse and ``encode_wav``'s drop-in sibling: flat
    int16-valued interleaved samples + a channel count in, a standard
    stream out (STREAMINFO with MD5, fixed-blocking frames)."""
    import numpy as np

    # validate BEFORE touching the samples (ADVICE r14): rate must fit
    # STREAMINFO's 20-bit field or int.to_bytes overflows far below
    if not 1 <= int(rate) < 1 << 20:
        raise ValueError(
            f"FLAC sample rate must be in [1, 2^20): got {rate}"
        )
    if not 1 <= channels <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim != 1:
        arr = arr.reshape(-1)
    n = len(arr) - len(arr) % channels
    arr = arr[:n]
    frames_total = n // channels
    deint = arr.reshape(-1, channels)
    md5 = hashlib.md5(arr.tobytes()).digest()
    # a sub-16-sample stream is one small FINAL frame (legal; only the
    # STREAMINFO min/max fields are spec-bounded to >= 16); an empty
    # stream is STREAMINFO-only with total=0
    bs = min(block_size, frames_total) or block_size
    info = bytearray()
    info += max(bs, 16).to_bytes(2, "big") * 2  # min/max block size
    info += b"\x00\x00\x00" * 2  # min/max frame size unknown
    v = (rate << 44) | ((channels - 1) << 41) | ((16 - 1) << 36) | frames_total
    info += v.to_bytes(8, "big")
    info += md5
    out = bytearray(b"fLaC")
    out.append(0x80)  # last-block flag + STREAMINFO
    out += len(info).to_bytes(3, "big")
    out += info
    for fi, off in enumerate(range(0, frames_total, bs)):
        chunk = deint[off : off + bs]
        out += _encode_frame(
            fi, [chunk[:, c].astype(np.int64) for c in range(channels)],
            rate, 16,
        )
    return bytes(out)
