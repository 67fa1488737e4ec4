"""Adversarial recall-contract pin for the numpy-path signature-estimate
prefilter (VERDICT r06 minor / "Next round" #5).

``minhash_dedup_pairs(hash_fn="numpy")`` sheds band candidates whose
signature-estimate (matching lanes / lanes) sits below
``rows_per_band + 1`` — a deliberate false-negative beyond plain LSH for
pairs that collide in EXACTLY one band with no extra lane agreement.
This test CONSTRUCTS such a pair under the real numpy hash family
(greedy char-append search driving the 12 out-of-band lanes to mismatch
while preserving one full band and a true Jaccard above threshold) and
pins the documented outcome on every path:

- numpy path: pair DROPPED (the prefilter's contract, quantified in the
  ops/dedup.py docstring);
- md5 and xxhash64 paths (no prefilter, independent hash families):
  pair EMITTED — plain-LSH recall, the oracle-verified behavior.

The construction is seed-searched deterministically: band collisions
under the INDEPENDENT md5/xxhash64 families are probabilistic at the
pair's final Jaccard, so seeds iterate until one pair exhibits all
three behaviors at once; the chosen seed is then stable."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from outpost_spark.ops.dedup import minhash_dedup_pairs

K = 5
NUM_HASHES = 16
BANDS, ROWS = 4, 4

_POWS = np.array(
    [pow(1099511628211, e, 1 << 64) for e in range(K - 1, -1, -1)],
    dtype=np.uint64,
)
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_M32 = np.uint64((1 << 32) - 1)


def _splitmix(x: int) -> int:
    z = x & ((1 << 64) - 1)
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
    return z ^ (z >> 31)


_KEYS = np.array(
    [_splitmix(0x9E3779B97F4A7C15 * (j + 1)) for j in range(NUM_HASHES)],
    dtype=np.uint64,
)[None, :]


def _gram_hashes(text: str) -> np.ndarray:
    """Distinct 64-bit gram hashes — mirror of the mapInPandas kernel in
    ops/dedup.py::minhash_grams_and_signature_numpy."""
    cp = np.frombuffer(text.lower().encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    n = cp.size - (K - 1)
    assert n > 0
    with np.errstate(over="ignore"):
        h = cp[:n] * _POWS[0]
        for j in range(1, K):
            h += cp[j : j + n] * _POWS[j]
        h ^= h >> np.uint64(30)
        h *= _C1
        h ^= h >> np.uint64(27)
        h *= _C2
        h ^= h >> np.uint64(31)
    return np.unique(h)


def _lane_vals(u: np.ndarray) -> np.ndarray:
    """(n_grams, 16) 32-bit lane values (independent per-lane avalanche)."""
    with np.errstate(over="ignore"):
        z = u[:, None] ^ _KEYS
        z ^= z >> np.uint64(30)
        z *= _C1
        z ^= z >> np.uint64(27)
        z *= _C2
        z ^= z >> np.uint64(31)
    return z & _M32


def _state(a: str, b: str):
    """(matched_lanes, jaccard) for the doc pair — ground-truth check."""
    ua, ub = _gram_hashes(a), _gram_hashes(b)
    inter = np.intersect1d(ua, ub)
    union = np.union1d(ua, ub)
    vals = _lane_vals(union)
    argmins = union[np.argmin(vals, axis=0)]
    in_inter = np.isin(argmins, inter)
    matched = {j for j in range(NUM_HASHES) if in_inter[j]}
    jac = inter.size / union.size
    return matched, jac


def _try_build(seed: int):
    """One seeded construction attempt; returns (a, b, preserve_lanes)
    or None.  Incremental state: each appended char adds exactly one
    sliding-window gram, whose 16 lane values against the current lane
    minima decide break / neutral / preserve-violation in O(16)."""
    rng = random.Random(seed)
    alpha = list("abcdefghijklmnopqrstuvwxyz ")
    prefix = "".join(rng.choice(alpha) for _ in range(4000))
    shared = _gram_hashes(prefix)
    curmin = _lane_vals(shared).min(axis=0).astype(np.uint64)
    # preserve the band holding the globally hardest lane (smallest
    # current minimum = most draws needed to undercut); everything else
    # must break, and small minima are exactly what stalls the search
    hardest = int(np.argmin(curmin))
    band = hardest // ROWS
    preserve = set(range(band * ROWS, band * ROWS + ROWS))
    target = set(range(NUM_HASHES)) - preserve
    broken: set[int] = set()
    inter = {int(x) for x in shared}
    own: list[set[int]] = [set(), set()]
    extras = 0
    # the J >= 0.7 contract bounds the extras budget (small margin kept)
    max_extras = int(len(inter) * (1 / 0.705 - 1)) - 4
    texts = [prefix, prefix]
    side = 0
    for _ in range(20000):
        if broken == target:
            break
        if extras >= max_extras:
            return None
        rng.shuffle(alpha)
        fallback = None  # (char, None) = free dup, (char, (g, gv)) = new gram
        committed = False
        for c in alpha:
            g = int(_gram_hashes((texts[side] + c)[-K:])[0])
            if g in inter or g in own[side]:
                if fallback is None:
                    fallback = (c, None)  # free window advance
                continue
            if g in own[1 - side]:
                continue  # would join the intersection and could re-match
            gv = _lane_vals(np.array([g], dtype=np.uint64))[0]
            if any(int(gv[j]) < int(curmin[j]) for j in preserve):
                continue  # would break the preserved band
            if any(
                int(gv[j]) < int(curmin[j]) for j in target if j not in broken
            ):
                texts[side] += c
                own[side].add(g)
                extras += 1
                for j in range(NUM_HASHES):
                    if int(gv[j]) < int(curmin[j]):
                        curmin[j] = gv[j]
                        broken.add(j)
                committed = True
                break
            if fallback is None or fallback[1] is not None:
                if fallback is None:
                    fallback = (c, (g, gv))
        if not committed:
            if fallback is None:
                return None
            c, info = fallback
            texts[side] += c
            if info is not None:
                g, gv = info
                own[side].add(g)
                extras += 1
                for j in range(NUM_HASHES):
                    if int(gv[j]) < int(curmin[j]):
                        curmin[j] = gv[j]
                        if j in target:
                            broken.add(j)
        side ^= 1
    if broken != target:
        return None
    # ground-truth verification with the full-state computation
    matched, jac = _state(texts[0], texts[1])
    if matched != preserve or jac < 0.7:
        return None
    return texts[0], texts[1], preserve


def _pairs(spark, a, b, hash_fn):
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    out = minhash_dedup_pairs(
        df,
        "doc_id",
        "text",
        num_hashes=NUM_HASHES,
        bands=BANDS,
        rows_per_band=ROWS,
        shingle_len=K,
        verify_ngram=K,
        threshold=0.7,
        hash_fn=hash_fn,
        materialize=False,
    )
    return {(r["id_a"], r["id_b"]) for r in out.collect()}


@pytest.mark.slow
def test_prefilter_drops_single_band_no_extra_lane_pair(spark):
    for seed in range(8):
        built = _try_build(seed)
        if built is None:
            continue
        a, b, preserve = built
        matched, jac = _state(a, b)
        assert matched == preserve and jac >= 0.7
        # md5 / xxhash64 carry no prefilter (plain-LSH recall, the
        # oracle-verified paths).  A band collision under these
        # INDEPENDENT families is probabilistic at this pair's J, so a
        # seed only qualifies when both emit — then pin all three.
        if _pairs(spark, a, b, "md5") != {(1, 2)}:
            continue
        if _pairs(spark, a, b, "xxhash64") != {(1, 2)}:
            continue
        # numpy path: the preserved band collides, but est_matches =
        # rows_per_band = 4 < est_min = 5 -> the prefilter DROPS the
        # pair.  The documented false-negative beyond plain LSH.
        assert _pairs(spark, a, b, "numpy") == set()
        return
    pytest.fail("no seed produced a qualifying adversarial pair")
