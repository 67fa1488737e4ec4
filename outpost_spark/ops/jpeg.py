"""JPEG codec (ITU-T T.81 DCT, Huffman) — stdlib+numpy, no codec libs.

Why this exists: real crawl corpora are mostly JPEG, and the engine's
perceptual-dedup / decode / resize stages (`ops/multimodal.py`) previously
covered only PNG on the default path, with JPEG reachable solely through
the injectable-codec seam.  This module closes that gap with an original,
spec-derived implementation:

- **decode_jpeg(content) -> (h, w, c) uint8**: SOI/APPn/DQT/SOF/DHT/
  DRI/SOS marker walk, canonical Huffman entropy decode with byte
  de-stuffing and restart-marker intervals — SEQUENTIAL (SOF0/SOF1)
  and PROGRESSIVE (SOF2: DC first/refine, AC first/refine with EOB
  runs per T.81 G.1.2, interleaved and non-interleaved scans,
  per-scan table redefinition) — coefficients accumulate into
  per-component grids, then one vectorized tail: dequantize +
  dezigzag, 8x8 IDCT (one einsum over every block of a component),
  general h/v chroma-sampling upsample (4:4:4, 4:2:2, 4:2:0, ...),
  JFIF YCbCr->RGB.  Grayscale (1-component) streams decode to (h, w, 1).
- **decode_jpeg_meta(content) -> dict**: header-only dims/channels (SOF
  scan, no entropy decode) — the cheap metadata pass.
- **encode_jpeg(arr, quality=85) -> bytes**: the re-encode half (fixture
  generation, JPEG resize round-trip).  Annex-K quantization tables
  scaled by the conventional quality curve, 4:4:4 or 4:2:0 sampling,
  optional restart intervals, and per-image OPTIMAL length-limited
  Huffman tables built from symbol frequencies (the two-pass
  optimal-coding procedure of Annex K.2 / libjpeg's
  jpeg_gen_optimal_table, reimplemented) — so no Annex-K default code
  tables need shipping and every emitted stream is spec-valid
  canonical Huffman.

Scope and guardrails: Huffman 8-bit only — an arithmetic-coded,
12-bit, lossless, or hierarchical stream raises ``ValueError`` like
any other undecodable blob, which the tolerant mapInPandas featurizers
in ``ops/multimodal.py`` turn into ``decode_ok=false`` rows.  Declared
dims are capped by the same decompression-bomb ceiling as the PNG path
before any coefficient allocation.  The Huffman bit loop is Python
(quarantined inside mapInPandas, linear scale-out — the same contract
as the PNG Paeth filter); everything after entropy decode (dequant,
IDCT, upsample, color convert) is whole-array numpy.  Decoder output
is cross-checked against javax.imageio in tests (sequential both
directions; progressive against its writer AND reader — luma within
rounding; chroma differs only by upsample interpolation style).

Reference parity note: the reference engine ships no image codec at all
(its multimodal handling is opaque-binary passthrough); this module is
part of the LLM-data-pipeline surface (SURVEY §2.11), built from the
public T.81 spec text and the published JFIF conventions.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- shared tables ---------------------------------------------------------

# zigzag scan: position k in the coded stream holds the coefficient at
# natural (row-major) index _ZIGZAG[k]
def _zigzag_order() -> np.ndarray:
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        rows = rng if s % 2 else reversed(rng)
        for r in rows:
            out.append(r * 8 + (s - r))
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag_order()

# orthonormal 8-point DCT-II basis: T.81 Annex A's S(v,u) with C(u)/2
# folded in equals this matrix applied as A @ block @ A.T (forward) and
# A.T @ coefs @ A (inverse)
def _dct_basis() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        alpha = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = alpha * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_DCT_A = _dct_basis()

# Annex K.1 example quantization tables (natural order), the de-facto
# base every encoder scales by quality
_QTBL_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QTBL_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

JPEG_MAGIC = b"\xff\xd8"

# same decompression-bomb ceiling as the PNG path: a crafted SOF cannot
# make the pixel stage allocate more than this many bytes
_MAX_RAW_BYTES = 1 << 28


# ---- decoder ---------------------------------------------------------------

def _parse_segments(content: bytes):
    """Walk the marker stream up to (and including) SOS; yield
    (marker, payload, next_pos) where next_pos for SOS points at the
    first entropy-coded byte."""
    if content[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG")
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        while pos + 4 <= n and content[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2: optional 0xFF fill bytes before a marker
        marker = content[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI/RSTn: no payload
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            return
        (length,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        payload = content[pos + 4 : pos + 2 + length]
        pos += 2 + length
        yield marker, payload, pos
        if marker == 0xDA:  # SOS: entropy data follows, caller takes over
            return


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict:
    """DHT (bits[1..16], values) -> {(length, code): symbol} — the
    canonical assignment of T.81 Annex C (generate_size/code tables)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _entropy_intervals(content: bytes, pos: int):
    """Entropy-coded bytes from ``pos``: de-stuff 0xFF00, split at RSTn
    (each interval restarts DC predictors + EOB run), stop at any other
    marker.  Returns (list[bytes], position of the terminating marker)."""
    out = []
    cur = bytearray()
    n = len(content)
    while pos < n:
        b = content[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = content[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed data byte
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            out.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker: end of scan
            break
    out.append(bytes(cur))
    return out, min(pos, n)


class _BitReader:
    """MSB-first bit reader over one de-stuffed entropy interval."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, want: int) -> None:
        while self.nbits < want:
            if self.pos < len(self.data):
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                # T.81 F.2.2.5: pad with 1-bits past the end (the encoder
                # pads the final byte the same way)
                self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8

    def read_bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        self.nbits -= k
        v = (self.acc >> self.nbits) & ((1 << k) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def decode_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value."""
    if s and v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


def decode_jpeg_meta(content: bytes) -> dict:
    """Header-only decode: dims/channels/precision from the SOF marker,
    no entropy pass.  Raises ValueError for non-JPEG input."""
    for marker, payload, _pos in _parse_segments(content):
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2 all share the layout
            if len(payload) < 6:
                raise ValueError("truncated JPEG SOF segment")
            precision, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            return {
                "kind": "jpeg",
                "width": int(w),
                "height": int(h),
                "bit_depth": int(precision),
                "channels": int(ncomp),
                "progressive": marker == 0xC2,
            }
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG process (non-baseline SOF)")
    raise ValueError("JPEG without an SOF marker")


def decode_jpeg(content: bytes) -> np.ndarray:
    """Full decode -> (h, w, c) uint8 (c=3 RGB or c=1 gray).

    Sequential (SOF0/SOF1) AND progressive (SOF2) Huffman 8-bit, any
    h/v chroma sampling, restart markers, interleaved and
    non-interleaved scans; a scan's coefficients accumulate into
    per-component grids (DC first/refine, AC first/refine with EOB
    runs — T.81 G.1.2) and one vectorized dequant+IDCT tail renders the
    final image.  Arithmetic-coded, 12-bit, lossless, and hierarchical
    streams raise ValueError.

    Contract: EVERY undecodable blob raises ValueError.  Truncated or
    bit-flipped streams can trip indexing/unpacking deep in the entropy
    decoder; this wrapper normalizes those to ValueError so tolerant
    per-row callers (resize/featurize stages) need only one except
    clause.
    """
    try:
        return _decode_jpeg_stream(content)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error, ZeroDivisionError, OverflowError) as e:
        raise ValueError(f"undecodable JPEG stream: {type(e).__name__}") from e


def _decode_jpeg_stream(content: bytes) -> np.ndarray:
    qtables: dict[int, np.ndarray] = {}  # id -> 64 values in ZIGZAG order
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> code table
    frame = None  # (h, w, ncomp, mcus_x, mcus_y)
    comps = []  # per component: dict(id, h, v, tq, bw, bh, cbw, cbh)
    coefs: list[np.ndarray] = []  # per component (bh*bw, 64) int32, zigzag
    restart_interval = 0
    scans_done = 0

    if content[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG")
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        while pos + 4 <= n and content[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2: optional fill bytes before a marker
        marker = content[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        payload = content[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if len(payload) < 6:
                raise ValueError("truncated JPEG SOF segment")
            precision, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            comps = []
            off = 6
            for _ in range(ncomp):
                cid, hv, tq = payload[off], payload[off + 1], payload[off + 2]
                ch, cv = hv >> 4, hv & 15
                # each factor must be 1..4 individually (T.81 B.2.2); a
                # zero factor would divide-by-zero at the upsample step
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError("invalid sampling factors")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
                off += 3
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            coefs = []
            padded = 0
            for c in comps:
                c["bw"] = mcus_x * c["h"]
                c["bh"] = mcus_y * c["v"]
                # non-interleaved scans iterate the component's OWN
                # ceil-grid, which is <= the interleaved (MCU-padded) one
                comp_w = -(-w * c["h"] // hmax)
                comp_h = -(-h * c["v"] // vmax)
                c["cbw"] = -(-comp_w // 8)
                c["cbh"] = -(-comp_h // 8)
                padded += c["bw"] * c["bh"] * 64
            if padded * 4 > _MAX_RAW_BYTES:
                # decompression-bomb guard in BYTES: the coefficient grids
                # are int32 (4 bytes/slot) and are the largest persistent
                # allocation; the float64 IDCT/color tails are chunked
                # below so they never exceed a fixed transient
                raise ValueError("image exceeds the decode size ceiling")
            for c in comps:
                coefs.append(np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32))
            frame = (h, w, ncomp, mcus_x, mcus_y, hmax, vmax, marker == 0xC2)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG process (non-baseline SOF)")
        elif marker == 0xDB:  # DQT: one or more tables, values in zigzag
            off = 0
            while off < len(payload):
                pq, tq = payload[off] >> 4, payload[off] & 15
                off += 1
                if pq == 0:
                    vals = np.frombuffer(
                        payload[off : off + 64], dtype=np.uint8
                    ).astype(np.int64)
                    off += 64
                else:
                    vals = np.frombuffer(
                        payload[off : off + 128], dtype=">u2"
                    ).astype(np.int64)
                    off += 128
                qtables[tq] = vals
        elif marker == 0xC4:  # DHT: one or more tables (redefinable per scan)
            off = 0
            while off < len(payload):
                tc, th = payload[off] >> 4, payload[off] & 15
                bits = list(payload[off + 1 : off + 17])
                nvals = sum(bits)
                huffval = list(payload[off + 17 : off + 17 + nvals])
                htables[(tc, th)] = _canonical_codes(bits, huffval)
                off += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG scan before SOF")
            ns = payload[0]
            sel = []
            off = 1
            for _ in range(ns):
                cs, tt = payload[off], payload[off + 1]
                sel.append({"id": cs, "dc": tt >> 4, "ac": tt & 15})
                off += 2
            ss, se, ahal = payload[off], payload[off + 1], payload[off + 2]
            pos = _decode_scan(
                content,
                pos,
                frame,
                comps,
                coefs,
                htables,
                sel,
                ss,
                se,
                ahal >> 4,
                ahal & 15,
                restart_interval,
            )
            scans_done += 1

    if frame is None or scans_done == 0:
        raise ValueError("JPEG missing SOF or SOS")
    h, w, ncomp, mcus_x, mcus_y, hmax, vmax, _prog = frame

    # dequant + dezigzag + IDCT, vectorized per component; blocks sit in
    # (bh, bw) grid raster order so the plane assembles by reshape
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qtables:
            raise ValueError("JPEG references an undefined DQT table")
        q = qtables[c["tq"]].astype(np.float64)
        grid = coefs[ci]
        # dequant + dezigzag + IDCT in fixed-size block chunks so the
        # float64 intermediates stay ~100 MB regardless of image size
        # (the size-ceiling guard above is stated in coefficient BYTES)
        px = np.empty((grid.shape[0], 8, 8), dtype=np.uint8)
        step = 1 << 16
        for s in range(0, grid.shape[0], step):
            zz = grid[s : s + step].astype(np.float64) * q
            nat = np.zeros_like(zz)
            nat[:, _ZIGZAG] = zz
            nat = nat.reshape(-1, 8, 8)
            # IDCT: A.T @ coefs @ A across every block in the chunk
            spatial = np.einsum("ij,njk,kl->nil", _DCT_A.T, nat, _DCT_A)
            px[s : s + step] = np.clip(np.round(spatial) + 128.0, 0, 255).astype(
                np.uint8
            )
        bh, bw = c["bh"], c["bw"]
        plane = (
            px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # crop to the component's true extent, then upsample to full res
        comp_h = -(-h * c["v"] // vmax)
        comp_w = -(-w * c["h"] // hmax)
        plane = plane[:comp_h, :comp_w]
        if c["v"] != vmax or c["h"] != hmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        planes.append(plane[:h, :w])

    if ncomp == 1:
        return planes[0][..., None]
    # YCbCr -> RGB in row bands: keeps the float64 transient bounded by
    # the band height rather than the full image
    out = np.empty((h, w, 3), dtype=np.uint8)
    band = 1024
    for s in range(0, h, band):
        y = planes[0][s : s + band].astype(np.float64)
        cb = planes[1][s : s + band].astype(np.float64) - 128.0
        cr = planes[2][s : s + band].astype(np.float64) - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        out[s : s + band] = np.clip(
            np.round(np.stack([r, g, b], axis=-1)), 0, 255
        ).astype(np.uint8)
    return out


def _decode_scan(
    content: bytes,
    data_pos: int,
    frame,
    comps,
    coefs,
    htables,
    sel,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> int:
    """Decode one scan's entropy data into the coefficient grids;
    returns the stream position of the marker that ended the scan.

    Sequential scans decode DC+AC per block; progressive scans apply
    one of the four T.81 G.1.2 procedures (DC first, DC refine, AC
    first, AC refine).  Interleaved scans walk MCUs; single-component
    scans walk the component's own ceil-grid in raster order.  Restart
    markers reset DC predictors and the EOB run.
    """
    h, w, ncomp, mcus_x, mcus_y, hmax, vmax, progressive = frame
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    if not 0 <= ss <= se <= 63:
        raise ValueError("invalid spectral selection")
    dc_scan = ss == 0
    if progressive and dc_scan and se != 0:
        raise ValueError("progressive DC scan with nonzero Se")
    if progressive and not dc_scan and len(sel) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not progressive and (ss, se, ah) != (0, 63, 0):
        raise ValueError("sequential scan with partial spectral band")

    order = []  # (ci, dc_table|None, ac_table|None, h, v)
    for s in sel:
        ci = by_id.get(s["id"])
        if ci is None:
            raise ValueError("SOS references unknown component")
        c = comps[ci]
        dc_t = ac_t = None
        needs_dc = dc_scan and ah == 0
        needs_ac = (not progressive) or not dc_scan
        if needs_dc:
            dc_t = htables.get((0, s["dc"]))
            if dc_t is None:
                raise ValueError("JPEG references an undefined DHT table")
        if needs_ac:
            ac_t = htables.get((1, s["ac"]))
            if ac_t is None:
                raise ValueError("JPEG references an undefined DHT table")
        order.append((ci, dc_t, ac_t, c["h"], c["v"]))

    interleaved = len(sel) > 1
    if interleaved:
        n_units = mcus_x * mcus_y
    else:
        ci0 = order[0][0]
        n_units = comps[ci0]["cbh"] * comps[ci0]["cbw"]

    intervals, end_pos = _entropy_intervals(content, data_pos)
    per_interval = restart_interval if restart_interval else n_units
    p1, m1 = 1 << al, -1 << al

    def seq_block(br, dc_t, ac_t, coef, pred):
        t = br.decode_huff(dc_t)
        if t > 11:
            raise ValueError("invalid DC category")
        pred += _extend(br.read_bits(t), t)
        coef[0] = pred
        k = 1
        while k < 64:
            rs = br.decode_huff(ac_t)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC run past block end")
            coef[k] = _extend(br.read_bits(s), s)
            k += 1
        return pred

    def ac_first(br, ac_t, coef, eobrun):
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = br.decode_huff(ac_t)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    return (1 << r) - 1 + br.read_bits(r)  # EOBn (this block done)
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past spectral band")
            coef[k] = _extend(br.read_bits(s), s) << al
            k += 1
        return 0

    def ac_refine(br, ac_t, coef, eobrun):
        # T.81 G.1.2.3 (the libjpeg decode_mcu_AC_refine shape): new
        # coefficients arrive as +-1<<al; every nonzero history
        # coefficient passed over consumes one correction bit
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = br.decode_huff(ac_t)
                r, s = rs >> 4, rs & 15
                val = 0
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) + br.read_bits(r)
                        break  # correction-bit sweep below finishes the block
                    # r == 15: ZRL — skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("invalid refinement magnitude")
                    val = p1 if br.read_bits(1) else m1
                while k <= se:
                    if coef[k]:
                        if br.read_bits(1) and not (coef[k] & p1):
                            coef[k] += p1 if coef[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    coef[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if coef[k]:
                    if br.read_bits(1) and not (coef[k] & p1):
                        coef[k] += p1 if coef[k] > 0 else m1
                k += 1
            eobrun -= 1
        return eobrun

    done = 0
    iv_idx = 0
    br = _BitReader(intervals[0]) if intervals else None
    dc_pred = [0] * len(comps)
    eobrun = 0
    while done < n_units:
        if br is None:
            raise ValueError("entropy stream ended before all MCUs")
        for ci, dc_t, ac_t, ch, cv in order:
            c = comps[ci]
            if interleaved:
                mx, my = done % mcus_x, done // mcus_x
                units = [
                    (my * cv + by) * c["bw"] + (mx * ch + bx)
                    for by in range(cv)
                    for bx in range(ch)
                ]
            else:
                row, col = done // c["cbw"], done % c["cbw"]
                units = [row * c["bw"] + col]
            for ui in units:
                coef = coefs[ci][ui]
                if not progressive:
                    dc_pred[ci] = seq_block(br, dc_t, ac_t, coef, dc_pred[ci])
                elif dc_scan and ah == 0:  # DC first
                    t = br.decode_huff(dc_t)
                    if t > 11:
                        raise ValueError("invalid DC category")
                    dc_pred[ci] += _extend(br.read_bits(t), t)
                    coef[0] = dc_pred[ci] << al
                elif dc_scan:  # DC refine: one raw bit per block
                    if br.read_bits(1):
                        coef[0] |= p1
                elif ah == 0:  # AC first
                    eobrun = ac_first(br, ac_t, coef, eobrun)
                else:  # AC refine
                    eobrun = ac_refine(br, ac_t, coef, eobrun)
        done += 1
        if restart_interval and done % per_interval == 0 and done < n_units:
            iv_idx += 1
            if iv_idx >= len(intervals):
                raise ValueError("missing restart interval")
            br = _BitReader(intervals[iv_idx])
            dc_pred = [0] * len(comps)
            eobrun = 0
    return end_pos


# ---- encoder ---------------------------------------------------------------

def _quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """The conventional quality->table curve (IJG): linear above 50,
    reciprocal below."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _optimal_huffman(freq_in: dict[int, int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies -> (bits[16], huffval) per T.81 Annex K.2's
    optimal-coding procedure: merge the two least-frequent symbols
    (ties toward the larger symbol value), limit code lengths to 16 by
    the pair-demotion adjustment, and reserve one extra slot (pseudo
    symbol 256) so the all-ones codeword stays unused."""
    freq = [0] * 257
    for sym, n in freq_in.items():
        freq[sym] = n
    freq[256] = 1  # reserved: ends up with the longest (all-ones) code
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1, v = -1, None
        for i in range(257):
            if freq[i] > 0 and (v is None or freq[i] <= v):
                v, c1 = freq[i], i
        c2, v = -1, None
        for i in range(257):
            if i != c1 and freq[i] > 0 and (v is None or freq[i] <= v):
                v, c2 = freq[i], i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    for length in range(32, 16, -1):  # limit to 16 bits
        while bits[length] > 0:
            j = length - 2
            while bits[j] == 0:
                j -= 1
            bits[length] -= 2
            bits[length - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    length = 16
    while bits[length] == 0:
        length -= 1
    bits[length] -= 1  # drop the reserved pseudo symbol's slot
    huffval = [
        i for s in range(1, 33) for i in range(256) if codesize[i] == s
    ]
    return bits[1:17], huffval


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (F.1.2.3)
        return bytes(self.out)


def _block_symbols(zz: np.ndarray, dc_pred: int):
    """One zigzag block -> (new_dc_pred, [(kind, sym, value, nbits)...])
    where kind 0 = DC, 1 = AC; value/nbits are the appended raw bits."""
    syms = []
    diff = int(zz[0]) - dc_pred
    s = abs(diff).bit_length()
    v = diff if diff >= 0 else diff + (1 << s) - 1
    syms.append((0, s, v, s))
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        c = int(zz[k])
        if c == 0:
            run += 1
            continue
        while run > 15:
            syms.append((1, 0xF0, 0, 0))  # ZRL
            run -= 16
        s = abs(c).bit_length()
        v = c if c >= 0 else c + (1 << s) - 1
        syms.append((1, (run << 4) | s, v, s))
        run = 0
    if last_nz < 63:
        syms.append((1, 0x00, 0, 0))  # EOB
    return int(zz[0]), syms


def _ac_first_ops(blocks, ss: int, se: int, al: int) -> list:
    """AC first scan (Ah=0) op stream per T.81 G.1.2.2: magnitudes point-
    transformed by ``al``, zero runs with ZRL folding, EOBn run-length
    coding across blocks (run appended bits, capped at 0x7FFF).  Ops:
    (0, sym) = Huffman symbol, (1, value, nbits) = raw appended bits."""
    ops: list = []
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            eobn = eobrun.bit_length() - 1
            ops.append((0, eobn << 4))
            if eobn:
                ops.append((1, eobrun - (1 << eobn), eobn))
            eobrun = 0

    for blk in blocks:
        r = 0
        for k in range(ss, se + 1):
            t = int(blk[k])
            a = abs(t) >> al
            if a == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                ops.append((0, 0xF0))  # ZRL
                r -= 16
            s = a.bit_length()
            x = a if t >= 0 else -a
            v = x if x >= 0 else x + (1 << s) - 1
            ops.append((0, (r << 4) | s))
            ops.append((1, v, s))
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return ops


def _ac_refine_ops(blocks, ss: int, se: int, al: int) -> list:
    """AC refinement scan (Ah=al+1) op stream per T.81 G.1.2.3: newly-
    significant coefficients (shifted magnitude 1) emit run-length
    symbols with a sign bit; already-significant ones emit buffered
    correction bits that ride after the next symbol (or after the EOBn
    that closes their run); ZRLs emit only when a newly-significant
    coefficient follows in the same block (else the run folds into the
    EOB run)."""
    ops: list = []
    eobrun = 0
    be: list[int] = []  # correction bits buffered across eobrun blocks

    def flush_eob():
        nonlocal eobrun, be
        if eobrun:
            eobn = eobrun.bit_length() - 1
            ops.append((0, eobn << 4))
            if eobn:
                ops.append((1, eobrun - (1 << eobn), eobn))
            eobrun = 0
            for b in be:
                ops.append((1, b, 1))
            be = []

    for blk in blocks:
        vals = [int(blk[k]) for k in range(ss, se + 1)]
        absv = [abs(t) >> al for t in vals]
        eobpos = -1  # position of the LAST newly-significant coef
        for i, a in enumerate(absv):
            if a == 1:
                eobpos = i
        r = 0
        br: list[int] = []  # this block's pending correction bits
        for i, (t, a) in enumerate(zip(vals, absv)):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                flush_eob()
                ops.append((0, 0xF0))
                r -= 16
                for b in br:
                    ops.append((1, b, 1))
                br = []
            if a > 1:  # already significant: one correction bit
                br.append(a & 1)
                continue
            flush_eob()
            ops.append((0, (r << 4) | 1))
            ops.append((1, 1 if t >= 0 else 0, 1))  # sign of the new coef
            for b in br:
                ops.append((1, b, 1))
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return ops


# the IJG standard successive-approximation script: DC at Al=1, the AC
# bands at Al=2 split low/high, then two AC refinement sweeps and the
# DC refinement bit
_SA_AC_SCANS = ((1, 5, 0, 2), (6, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0))


def _encode_progressive_sa(out: bytearray, comp_zz, c: int, seg, n_mcus: int) -> bytes:
    """Emit the successive-approximation progressive scan script
    (T.81 G.1.2, the script real encoders default to): every scan gets
    its own per-image optimal Huffman table; the final DC refinement is
    raw bits.  The full script restores every coefficient bit, so the
    stream decodes pixel-identically to the sequential encode."""
    ntab = 1 if c == 1 else 2
    # scan 1: interleaved DC first, Ah=0 Al=1 (arithmetic point shift)
    dc_freq = [dict() for _ in range(ntab)]
    dc_ops = []
    preds = [0] * c
    for i in range(n_mcus):
        for ci in range(c):
            tab = 0 if ci == 0 else 1
            dcv = int(comp_zz[ci][i][0]) >> 1
            diff = dcv - preds[ci]
            preds[ci] = dcv
            s = abs(diff).bit_length()
            v = diff if diff >= 0 else diff + (1 << s) - 1
            dc_ops.append((tab, s, v))
            dc_freq[tab][s] = dc_freq[tab].get(s, 0) + 1
    dc_spec = [_optimal_huffman(f) for f in dc_freq]
    dc_enc = [
        {sym: lc for lc, sym in _canonical_codes(b, v).items()} for b, v in dc_spec
    ]
    for tab in range(ntab):
        bits, vals = dc_spec[tab]
        out += seg(0xC4, bytes([tab]) + bytes(bits) + bytes(vals))
    sos_comps = bytes([c])
    for ci in range(c):
        sos_comps += bytes([ci + 1, ((0 if ci == 0 else 1) << 4) | 0])
    out += seg(0xDA, sos_comps + bytes([0, 0, 0x01]))  # Ss=0 Se=0 Ah=0 Al=1
    bw = _BitWriter()
    for tab, s, v in dc_ops:
        length, code = dc_enc[tab][s]
        bw.write(code, length)
        if s:
            bw.write(v, s)
    out += bw.flush()

    # AC band scans then refinement sweeps, one scan per component each
    for ss, se, ah, al in _SA_AC_SCANS:
        for ci in range(c):
            tab = 0 if ci == 0 else 1
            gen = _ac_refine_ops if ah else _ac_first_ops
            ops = gen(comp_zz[ci], ss, se, al)
            freq: dict[int, int] = {}
            for op in ops:
                if op[0] == 0:
                    freq[op[1]] = freq.get(op[1], 0) + 1
            if not freq:
                freq = {0x00: 1}
            bits, vals = _optimal_huffman(freq)
            enc = {sym: lc for lc, sym in _canonical_codes(bits, vals).items()}
            out += seg(0xC4, bytes([0x10 | tab]) + bytes(bits) + bytes(vals))
            out += seg(
                0xDA, bytes([1, ci + 1, tab]) + bytes([ss, se, (ah << 4) | al])
            )
            bw = _BitWriter()
            for op in ops:
                if op[0] == 0:
                    length, code = enc[op[1]]
                    bw.write(code, length)
                else:
                    bw.write(op[1], op[2])
            out += bw.flush()

    # final scan: interleaved DC refinement — one raw bit per block
    out += seg(0xDA, sos_comps + bytes([0, 0, 0x10]))  # Ah=1 Al=0
    bw = _BitWriter()
    for i in range(n_mcus):
        for ci in range(c):
            bw.write(int(comp_zz[ci][i][0]) & 1, 1)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    *,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
    successive: bool = False,
) -> bytes:
    """(h, w, 1|3) or (h, w) uint8 -> JFIF JPEG bytes.

    ``subsample=False`` emits 4:4:4; ``subsample=True`` emits 4:2:0
    (luma 2x2 sampling, chroma 2x2 box-mean downsample) — the layout
    real-world encoders default to, exercising the decoder's general
    MCU/upsample path.  ``restart_interval=N`` emits DRI + RSTn markers
    every N MCUs (DC predictors reset), exercising the decoder's
    restart path.  ``progressive=True`` emits an SOF2 stream with the
    spectral-selection script (one interleaved DC scan, then one
    full-band AC scan per component, no successive approximation) —
    pixel-identical to the sequential encode at the same quality, but
    exercising the progressive scan machinery; 4:4:4 only, no restarts.
    ``successive=True`` (with ``progressive``) emits the full
    SUCCESSIVE-APPROXIMATION script real encoders default to (T.81
    G.1.2 / the IJG standard script: DC at Al=1, AC bands 1-5 and 6-63
    at Al=2, two AC refinement sweeps, final DC refinement bit) — still
    pixel-identical, since the complete script restores every
    coefficient bit.  Huffman tables are per-image optimal
    (length-limited canonical, Annex K.2 procedure); quant is the
    quality-scaled Annex-K pair.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, c = arr.shape
    if c == 4:
        arr = arr[..., :3]  # drop alpha: JFIF has no alpha channel
        c = 3
    if c == 2:
        arr = arr[..., :1]  # gray+alpha -> gray
        c = 1
    if c not in (1, 3):
        raise ValueError(f"encode_jpeg supports 1/3/4-channel input, got {c}")
    if h < 1 or w < 1:
        raise ValueError("empty image")
    if progressive and (subsample or restart_interval):
        raise ValueError("progressive encode supports 4:4:4 without restarts")
    if successive and not progressive:
        raise ValueError("successive approximation requires progressive=True")

    if c == 3:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        planes = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    else:
        planes = [arr[..., 0].astype(np.float64)]
        samp = [(1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    qz = [  # quant tables in zigzag order, as emitted in DQT
        _quality_scaled(_QTBL_LUMA, quality)[_ZIGZAG],
        _quality_scaled(_QTBL_CHROMA, quality)[_ZIGZAG],
    ]
    comp_zz = []  # per component: (n_mcus * h*v, 64) int32, MCU emission order
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        if (hi, vi) != (hmax, vmax):
            # downsample by box mean over the full-res plane, padded even
            fy, fx = vmax // vi, hmax // hi
            pe = np.pad(
                plane,
                ((0, (-h) % fy), (0, (-w) % fx)),
                mode="edge",
            )
            plane = pe.reshape(pe.shape[0] // fy, fy, pe.shape[1] // fx, fx).mean(
                axis=(1, 3)
            )
        ch, cw = plane.shape
        ph, pw = mcus_y * vi * 8, mcus_x * hi * 8
        pad = np.pad(plane, ((0, ph - ch), (0, pw - cw)), mode="edge") - 128.0
        # blocks in MCU-major / v-major / h-major order (the scan order)
        t = pad.reshape(mcus_y, vi, 8, mcus_x, hi, 8)
        blocks = t.transpose(0, 3, 1, 4, 2, 5).reshape(-1, 8, 8)
        coefs = np.einsum("ij,njk,kl->nil", _DCT_A, blocks, _DCT_A.T).reshape(-1, 64)
        zz = coefs[:, _ZIGZAG]
        q = (qz[0] if ci == 0 else qz[1]).astype(np.float64)
        comp_zz.append(np.round(zz / q).astype(np.int32))

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def headers(sof_marker: int) -> bytearray:
        out = bytearray(JPEG_MAGIC)
        out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qz[0]))
        if c == 3:
            out += seg(0xDB, bytes([0x01]) + bytes(int(x) for x in qz[1]))
        sof = struct.pack(">BHHB", 8, h, w, c)
        for ci in range(c):
            sof += bytes(
                [ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1]
            )
        out += seg(sof_marker, sof)
        return out

    if progressive and successive:
        return _encode_progressive_sa(headers(0xC2), comp_zz, c, seg, n_mcus)

    if progressive:
        # spectral-selection script: interleaved DC scan (Ss=Se=0), then
        # one full-band AC scan per component (Ss=1, Se=63), Ah=Al=0 —
        # coefficient-identical to the sequential encode
        out = headers(0xC2)
        ntab = 1 if c == 1 else 2
        dc_freq = [dict() for _ in range(ntab)]
        dc_syms = []  # (tab, s, v) in interleaved MCU order
        dc_pred = [0] * c
        for i in range(n_mcus):
            for ci in range(c):
                tab = 0 if ci == 0 else 1
                dc = int(comp_zz[ci][i][0])
                diff = dc - dc_pred[ci]
                dc_pred[ci] = dc
                s = abs(diff).bit_length()
                v = diff if diff >= 0 else diff + (1 << s) - 1
                dc_syms.append((tab, s, v))
                dc_freq[tab][s] = dc_freq[tab].get(s, 0) + 1
        dc_spec = [_optimal_huffman(f) for f in dc_freq]
        dc_enc = [
            {sym: lc for lc, sym in _canonical_codes(b, v).items()}
            for b, v in dc_spec
        ]
        for tab in range(ntab):
            bits, vals = dc_spec[tab]
            out += seg(0xC4, bytes([tab]) + bytes(bits) + bytes(vals))
        sos = bytes([c])
        for ci in range(c):
            sos += bytes([ci + 1, ((0 if ci == 0 else 1) << 4) | 0])
        out += seg(0xDA, sos + b"\x00\x00\x00")  # Ss=0 Se=0 AhAl=0
        bw = _BitWriter()
        for tab, s, v in dc_syms:
            length, code = dc_enc[tab][s]
            bw.write(code, length)
            if s:
                bw.write(v, s)
        out += bw.flush()
        for ci in range(c):
            tab = 0 if ci == 0 else 1
            freq: dict[int, int] = {}
            blocks_ac = []
            for blk in comp_zz[ci]:
                _pred, syms = _block_symbols(blk, 0)
                ac = [x for x in syms if x[0] == 1]
                blocks_ac.append(ac)
                for _k, sym, _v, _n in ac:
                    freq[sym] = freq.get(sym, 0) + 1
            if not freq:
                freq = {0x00: 1}  # degenerate: all blocks end at k=63
            bits, vals = _optimal_huffman(freq)
            enc = {sym: lc for lc, sym in _canonical_codes(bits, vals).items()}
            out += seg(0xC4, bytes([0x10 | tab]) + bytes(bits) + bytes(vals))
            out += seg(
                0xDA, bytes([1, ci + 1, tab]) + b"\x01\x3f\x00"
            )  # Ss=1 Se=63 AhAl=0
            bw = _BitWriter()
            for ac in blocks_ac:
                for _k, sym, value, nbits in ac:
                    length, code = enc[sym]
                    bw.write(code, length)
                    if nbits:
                        bw.write(value, nbits)
            out += bw.flush()
        out += b"\xff\xd9"
        return bytes(out)

    # pass 1: symbol streams in emission order (restarts reset DC preds),
    # plus frequency counts (tables: luma=0, chroma=1)
    ntab = 1 if c == 1 else 2
    dc_freq = [dict() for _ in range(ntab)]
    ac_freq = [dict() for _ in range(ntab)]
    nblk = [s[0] * s[1] for s in samp]
    mcu_syms = []  # per MCU: [(tab, kind, sym, value, nbits), ...]
    dc_pred = [0] * c
    for i in range(n_mcus):
        if restart_interval and i and i % restart_interval == 0:
            dc_pred = [0] * c
        cur = []
        for ci in range(c):
            tab = 0 if ci == 0 else 1
            for j in range(nblk[ci]):
                blk = comp_zz[ci][i * nblk[ci] + j]
                dc_pred[ci], syms = _block_symbols(blk, dc_pred[ci])
                for kind, sym, value, nbits in syms:
                    cur.append((tab, kind, sym, value, nbits))
                    f = dc_freq[tab] if kind == 0 else ac_freq[tab]
                    f[sym] = f.get(sym, 0) + 1
        mcu_syms.append(cur)

    dc_spec = [_optimal_huffman(f) for f in dc_freq]
    ac_spec = [_optimal_huffman(f) for f in ac_freq]
    # invert the canonical assignment: symbol -> (length, code)
    dc_enc = [
        {sym: lc for lc, sym in _canonical_codes(b, v).items()} for b, v in dc_spec
    ]
    ac_enc = [
        {sym: lc for lc, sym in _canonical_codes(b, v).items()} for b, v in ac_spec
    ]

    # pass 2: emit entropy data, flushing at restart boundaries
    entropy = bytearray()
    bw = _BitWriter()
    for i in range(n_mcus):
        if restart_interval and i and i % restart_interval == 0:
            entropy += bw.flush()
            entropy += bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)])
            bw = _BitWriter()
        for tab, kind, sym, value, nbits in mcu_syms[i]:
            length, code = (dc_enc if kind == 0 else ac_enc)[tab][sym]
            bw.write(code, length)
            if nbits:
                bw.write(value, nbits)
    entropy += bw.flush()

    out = headers(0xC0)
    for tab in range(ntab):
        bits, vals = dc_spec[tab]
        out += seg(0xC4, bytes([tab]) + bytes(bits) + bytes(vals))
        bits, vals = ac_spec[tab]
        out += seg(0xC4, bytes([0x10 | tab]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([c])
    for ci in range(c):
        tab = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tab << 4) | tab])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
