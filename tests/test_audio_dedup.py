"""Perceptual audio dedup (ops/multimodal.py::audio_fingerprint + the
shared pigeonhole Hamming band join): analytic bit fixtures on the
planted spectral grid, volume invariance, corrupt-member tolerance, and
the dedup_audio_* catalog entries pinned against the independently
computed planted-group answer — the audio analog of
tests/test_image_dedup.py (VERDICT r12 task #1)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from outpost_spark.ops.multimodal import (
    _wav_samples,
    audio_fingerprint,
    audio_fingerprints,
    audio_fp_pairs,
    audio_fp_survivors,
    encode_wav,
    planted_audio_dedup_corpus,
    planted_clip_wav,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ── the fingerprint itself ──────────────────────────────────────────────


def test_fingerprint_bits_follow_the_planted_rank_grid():
    """The plant is constructed so band energies are analytically
    c * A^2 (bin-centered Hann-windowed sines leak into only 3 bins,
    cells align exactly with non-overlapping frames): the 64 fingerprint
    bits must equal the rank grid's sign-of-delta EXACTLY — no
    tolerance, the whole DSP chain is deterministic."""
    for seed in (0, 5, 17):
        ranks = np.empty((8, 9), dtype=np.int64)
        for t in range(8):
            d = hashlib.md5(f"aud|{seed}|{t}".encode()).digest()
            order = sorted(range(9), key=lambda b: (d[b], b))
            ranks[t][order] = np.arange(9)
        want = 0
        for bit in (ranks[:, 1:] > ranks[:, :-1]).flatten():
            want = (want << 1) | int(bit)
        if want >= 1 << 63:
            want -= 1 << 64
        assert audio_fingerprint(planted_clip_wav(seed, 0)) == want


def test_twins_near_unrelated_far():
    for seed in range(8):
        fps = [audio_fingerprint(planted_clip_wav(seed, t)) for t in range(4)]
        for a in range(4):
            for b in range(a + 1, 4):
                assert _ham(fps[a], fps[b]) <= 2
    cross = [
        _ham(
            audio_fingerprint(planted_clip_wav(a, 0)),
            audio_fingerprint(planted_clip_wav(b, 0)),
        )
        for a in range(8)
        for b in range(a + 1, 8)
    ]
    assert min(cross) > 10  # unrelated clips never pair


def test_volume_invariance():
    """Scaling every sample scales every band energy equally: the
    sign-of-delta fingerprint must not move — the perceptual property
    that makes re-mastered / re-normalized copies near-dups."""
    w = planted_clip_wav(3, 1)
    arr, rate = _wav_samples(w)
    for scale in (0.5, 0.25, 0.9):
        scaled = encode_wav(np.round(arr[:, 0] * scale).astype("<i2"), rate)
        assert audio_fingerprint(scaled) == audio_fingerprint(w)


def test_stereo_mixdown_matches_mono():
    w = planted_clip_wav(7, 0)
    arr, rate = _wav_samples(w)
    stereo = encode_wav(
        np.repeat(arr[:, 0], 2).astype("<i2"), rate, channels=2
    )
    assert audio_fingerprint(stereo) == audio_fingerprint(w)


def test_cross_rate_invariance_with_hz_anchored_bands():
    """fmax_hz anchors the bands to a fixed Hz range, so a clip and
    its RESAMPLED copy fingerprint within a few bits — the audio
    analog of cross-format image re-encodes hashing together.  Linear
    resampling adds rolloff distortion, so near (<= 4 bits), not
    equal; unrelated clips stay far."""
    from outpost_spark.ops.multimodal import resample_wav

    for seed in range(6):
        w8 = planted_clip_wav(seed, 0)  # 8 kHz plant
        w16 = resample_wav(w8, target_rate=16000)
        d = _ham(
            audio_fingerprint(w8, fmax_hz=3800.0),
            audio_fingerprint(w16, fmax_hz=3800.0),
        )
        assert d <= 4, (seed, d)
    cross = _ham(
        audio_fingerprint(planted_clip_wav(0, 0), fmax_hz=3800.0),
        audio_fingerprint(
            resample_wav(planted_clip_wav(4, 0), target_rate=16000),
            fmax_hz=3800.0,
        ),
    )
    assert cross > 10
    # a clip that cannot represent the band range is rejected
    with pytest.raises(ValueError, match="cannot represent"):
        audio_fingerprint(planted_clip_wav(0, 0), fmax_hz=9000.0)
    # and the default (no fmax) path is unchanged
    w = planted_clip_wav(3, 1)
    assert audio_fingerprint(w) == audio_fingerprint(w, fmax_hz=None)


def _wav_container(tag, bits, payload, ch=1, rate=8000, ext=False):
    """Hand-build a WAV with an arbitrary fmt tag/depth (the stdlib
    wave module can't write these variants)."""
    import struct

    if ext:  # WAVE_FORMAT_EXTENSIBLE: the real tag leads the GUID
        fmt = (
            struct.pack("<HHIIHH", 0xFFFE, ch, rate, rate * bits // 8 * ch,
                        bits // 8 * ch, bits)
            + struct.pack("<HHI", 22, bits, 3)
            + struct.pack("<H", tag)
            + bytes(14)
        )
    else:
        fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * bits // 8 * ch,
                          bits // 8 * ch, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + (b"\x00" if len(fmt) & 1 else b"")
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    import struct as _s

    return b"RIFF" + _s.pack("<I", len(body)) + body


def test_wav_variants_normalize_to_int16():
    """Real corpora carry more than 16-bit PCM: unsigned 8-bit, 24/32-bit
    PCM, IEEE float32/64, and EXTENSIBLE wrappers all decode through the
    direct RIFF parse and normalize to int16 — a float32 re-encode of a
    planted clip fingerprints IDENTICALLY (r13)."""
    from outpost_spark.ops.multimodal import _wav_samples

    s16 = np.round(10000 * np.sin(np.arange(8000) * 0.1)).astype("<i2")
    f32 = (s16.astype(np.float32) / 32767.0).astype("<f4")
    arr, rate = _wav_samples(_wav_container(3, 32, f32.tobytes()))
    assert rate == 8000
    assert np.abs(arr[:, 0].astype(int) - s16.astype(int)).max() <= 1
    arr, _ = _wav_samples(
        _wav_container(3, 64, (s16.astype("<f8") / 32767.0).tobytes())
    )
    assert np.abs(arr[:, 0].astype(int) - s16.astype(int)).max() <= 1
    u8 = ((s16.astype(np.int32) >> 8) + 128).astype(np.uint8)
    arr, _ = _wav_samples(_wav_container(1, 8, u8.tobytes()))
    assert (arr[:, 0].astype(int) == (s16.astype(int) & ~0xFF)).all()
    b32 = (s16.astype("<i4") << 8).tobytes()
    p24 = b"".join(b32[i : i + 3] for i in range(0, len(b32), 4))
    arr, _ = _wav_samples(_wav_container(1, 24, p24))
    assert (arr[:, 0] == s16).all()
    arr, _ = _wav_samples(
        _wav_container(1, 32, (s16.astype("<i4") << 16).tobytes())
    )
    assert (arr[:, 0] == s16).all()
    arr, _ = _wav_samples(_wav_container(3, 32, f32.tobytes(), ext=True))
    assert np.abs(arr[:, 0].astype(int) - s16.astype(int)).max() <= 1
    # fingerprint invariance across the container depth
    w = planted_clip_wav(5, 0)
    a, r = _wav_samples(w)
    fw = _wav_container(
        3, 32, (a[:, 0].astype("<f4") / 32767.0).tobytes(), rate=r
    )
    assert audio_fingerprint(w) == audio_fingerprint(fw)
    # mu-law / a-law tags stay honest ValueErrors
    with pytest.raises(ValueError, match="unsupported format tag"):
        _wav_samples(_wav_container(7, 8, u8.tobytes()))


def test_rejects_short_junk_and_bad_grid():
    with pytest.raises(ValueError, match="shorter"):
        audio_fingerprint(encode_wav(np.zeros(100, dtype="<i2"), 8000))
    with pytest.raises(ValueError, match="not a WAV"):
        audio_fingerprint(b"JUNK: not audio")
    with pytest.raises(ValueError, match="1..64"):
        audio_fingerprint(planted_clip_wav(0, 0), grid_t=9, n_bands=9)


def test_spectral_edit_flips_at_most_one_bit_vs_canonical():
    flips = []
    for seed in range(12):
        base = audio_fingerprint(planted_clip_wav(seed, 0))
        for t in range(1, 4):
            flips.append(_ham(base, audio_fingerprint(planted_clip_wav(seed, t))))
    assert max(flips) <= 1
    assert any(f == 1 for f in flips)  # some edits actually flip a bit


# ── the Spark stages ────────────────────────────────────────────────────


def _expected_pairs(ids, group=4, corrupt_every=29):
    ok = [i for i in ids if i % corrupt_every != 0]
    return {
        (a, b)
        for a in ok
        for b in ok
        if a < b and a // group == b // group
    }


def _expected_survivors(ids, group=4, corrupt_every=29):
    from collections import defaultdict

    ok = defaultdict(list)
    survivors = set()
    for i in ids:
        if corrupt_every and i % corrupt_every == 0:
            survivors.add(i)  # no fingerprint: passes through untouched
        else:
            ok[i // group].append(i)
    for members in ok.values():
        survivors.add(min(members))
    return survivors


def test_audio_fingerprints_tolerate_corrupt_members(spark):
    ids = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    clips = planted_audio_dedup_corpus(ids, id_col="doc_id")
    rows = {r["id"]: r for r in audio_fingerprints(clips).collect()}
    assert len(rows) == 60
    for i in (0, 29, 58):  # the junk members
        assert rows[i]["afp_ok"] is False
        assert rows[i]["afp"] is None
    assert sum(r["afp_ok"] for r in rows.values()) == 57


def test_audio_fp_pairs_finds_exactly_the_planted_groups(spark):
    ids = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    clips = planted_audio_dedup_corpus(ids, id_col="doc_id")
    got = {
        (r["id_a"], r["id_b"])
        for r in audio_fp_pairs(clips, max_hamming=4).collect()
    }
    want = _expected_pairs(range(120))
    assert got == want
    assert len(want) > 100  # the plant is non-trivial


def test_audio_survivors_collapse_planted_groups(spark):
    ids = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    clips = planted_audio_dedup_corpus(ids, id_col="doc_id")
    got = {r["id"] for r in audio_fp_survivors(clips).collect()}
    want = _expected_survivors(range(120))
    assert got == want
    assert len(got) < 120  # clusters actually collapsed


def test_crossrate_pairs_find_exactly_the_planted_groups(spark):
    """The cross-rate corpus (odd ids resampled to 16 kHz) pairs
    exactly the planted groups when fingerprinted with Hz-anchored
    bands at max_hamming=6 — duplicate detection across sample rates."""
    ids = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    clips = planted_audio_dedup_corpus(ids, id_col="doc_id", cross_rate=True)
    got = {
        (r["id_a"], r["id_b"])
        for r in audio_fp_pairs(
            clips, max_hamming=6, fmax_hz=3800.0
        ).collect()
    }
    assert got == _expected_pairs(range(120))


def test_crossrate_catalog_entry_matches_planted_answer(spark):
    from outpost_spark.queries_catalog import queries

    sf_dir = "/root/testdata/sf0.001"
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    got = {
        (r["id_a"], r["id_b"])
        for r in queries()["dedup_audio_crossrate_pairs"](
            spark, sf_dir
        ).collect()
    }
    assert got == _expected_pairs(doc_ids)


def test_catalog_entries_match_planted_answer(spark):
    from outpost_spark.queries_catalog import queries

    sf_dir = "/root/testdata/sf0.001"
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    got_pairs = {
        (r["id_a"], r["id_b"])
        for r in queries()["dedup_audio_fingerprint_pairs"](
            spark, sf_dir
        ).collect()
    }
    assert got_pairs == _expected_pairs(doc_ids)
    got_surv = {
        r["id"]
        for r in queries()["dedup_audio_survivors"](spark, sf_dir).collect()
    }
    assert got_surv == _expected_survivors(doc_ids)


def test_rate_too_high_for_band_resolution_raises():
    """When fmax_hz maps to fewer rFFT bins than n_bands, widening the
    band range silently would break the fixed-Hz cross-rate guarantee —
    the fingerprint must refuse instead (ADVICE r13)."""
    rate = 48000
    n = 8 * 512
    samples = np.round(
        2000 * np.sin(2 * np.pi * 440 * np.arange(n + 64) / rate)
    ).astype("<i2")
    w = encode_wav(samples, rate)
    with pytest.raises(ValueError, match="too high to resolve"):
        audio_fingerprint(w, fmax_hz=500.0)
    # plenty of resolution: unaffected
    audio_fingerprint(w, fmax_hz=9000.0)
