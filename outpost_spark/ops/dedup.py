"""Deduplication operators for large-scale training-data pipelines.

All hashing is engine-portable and deterministic — reproducible in any
engine with md5 (the DuckDB oracles use identical formulas), stable across
runs/partitions, no RNG.  MinHash uses ONE base hash per shingle (md5 by
default, ``h(s) = int(md5('h|'||s)[:8], 16)``), then derives the k
signature lanes with universal-hash mixing ``h_j = (h·A_j + B_j) mod
4294967291`` — pure integer arithmetic, so the expensive digest runs once
per shingle instead of once per (lane × shingle).  The per-lane constants
A_j, B_j are LARGE (~2^30, Knuth multiplicative sequence): with small
multipliers a single ultra-common shingle that draws a small base hash
stays minimal in EVERY lane simultaneously (lane values are affine in the
same h), collapsing most of the corpus into one LSH bucket per band —
measured as a 90× candidate-pair explosion on the sf0.1 documents table.
Large A_j decorrelate the lanes: a small h maps to h·A_j mod p, uniform
across lanes.  A_j < 2^30 keeps h·A_j + B_j < 2^62, inside signed-64
range for both Spark and the DuckDB oracle.

Scale design (100 TB):
- Signatures are computed scan-side with pure Column expressions
  (transform/aggregate over shingle arrays) — whole-stage codegen, no
  Python, no shuffle.  The base-hash array is produced in its own
  projection; Catalyst keeps it materialized per-row (CollapseProject
  refuses to duplicate non-cheap expressions referenced k times), so the
  md5 pass is not re-inlined into every lane.
- LSH banding turns the quadratic all-pairs problem into an equi-join on
  (band, bucket): only documents sharing a band bucket meet in the shuffle.
  Band keys are emitted with one ``explode`` pass over the signature —
  not one plan-copy per band.  Bucket skew (giant near-dup clusters) is
  handled by AQE skew-join splitting; pair explosion within a bucket is
  bounded by verifying with exact Jaccard immediately after the join and
  by distinct-ing pairs.
- ``exact_dedup`` is a hash aggregation on a digest, not on the full text:
  group keys are 32-byte md5 values, so the shuffle moves digests + ids,
  never document bodies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_expr(s: Column, seed: int | str, hash_fn: str = "md5") -> Column:
    """32-bit-range hash of a string column.

    ``"md5"`` (default): int(md5(seed || '|' || s)[:8], 16) — portable, the
    DuckDB oracles reproduce it bit-for-bit, but md5 inside interpreted
    higher-order functions is the dedup pipeline's constant-factor tax.
    ``"xxhash64"``: pmod(xxhash64(seed, s), 2^32) — Spark-native, one
    codegen'd call, ~an order of magnitude cheaper; same distribution
    quality, not reproducible outside Spark (no SQL oracle).
    """
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(str(seed)), s), F.lit(1 << 32)).cast("long")
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}|"), s)), 1, 8), 16, 10).cast(
        "long"
    )


def _hash_expr_wide(s: Column, seed: int | str, hash_fn: str = "md5") -> Column:
    """Wide hash of a string column whose top 32 bits reproduce
    :func:`_hash_expr` exactly.

    ``"md5"``: int(md5(seed || '|' || s)[:15], 16) — 60 bits (15 hex
    chars keep the value < 2^63, safe in a signed BIGINT in any engine);
    ``_hash_expr``'s 32-bit value is this ``>> 28``.  ``"xxhash64"``: the
    full signed 64-bit xxhash64; ``_hash_expr`` is ``pmod(·, 2^32)``.

    Used by the fused MinHash verify: Jaccard over 32-bit gram hashes
    suffers birthday collisions once |grams| nears 10^5
    (|grams|^2/2^33 ≈ 1), inflating near-threshold similarities; at 60+
    bits the same corpus sits at |grams|^2/2^61 ≈ 10^-8.  One digest
    pass still feeds both the verify arrays and (via the cheap
    projection above) the minhash lanes.
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(F.lit(str(seed)), s)
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), s)), 1, 15), 16, 10
    ).cast("long")


def _narrow_from_wide(g: Column, hash_fn: str = "md5") -> Column:
    """Project a :func:`_hash_expr_wide` value back to :func:`_hash_expr`."""
    if hash_fn == "xxhash64":
        return F.pmod(g, F.lit(1 << 32))
    return F.shiftrightunsigned(g, 28)


def wide_gram_hashes(
    text: Column, shingle_len: int, hash_fn: str = "md5", seed: str | int = "h"
) -> Column:
    """``array<long>`` of the text's distinct wide shingle hashes in
    first-occurrence order:
    ``array_distinct(transform(shingle_seq(text, k), s ->
    _hash_expr_wide(s, seed, hash_fn)))`` — the shared digest stage of
    the MinHash operators (fused self-join, cross-corpus, ingest gate).

    Measured negative, do not redo (r16, guide §1.3): an Arrow/hashlib
    replacement for the md5 path (one pandas stage, bit-identical
    output) benched SLOWER than this interpreted HOF chain on the sf0.1
    corpus — isolated noop timings old 0.86-1.29 s vs Arrow 1.04-1.75 s
    warm — because ~300-char docs leave too little md5 work per row to
    amortize the text->Python->array serialization.  (The simhash
    fingerprint is different: its 32 per-bit aggregate() passes made the
    Arrow form 3.6x faster — see :func:`_simhash_md5_fingerprint`.)
    """
    return F.array_distinct(
        F.transform(
            shingle_seq(text, shingle_len),
            lambda s: _hash_expr_wide(s, seed, hash_fn),
        )
    )


_BYTE_SUFFIXES = {
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
}


def _parse_byte_size(value: str, default: int = 134217728) -> int:
    """Parse a Spark byte-size conf value ("134217728", "128m", "1g").

    Naive digit-stripping would read "128m" as 128 bytes and wildly inflate
    the estimated split count, silently skipping the repartition guard; a
    malformed value falls back to the Spark default (128 MiB) instead.
    """
    s = value.strip().lower()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    digits, suffix = s[:i], s[i:].strip()
    if not digits or not digits.isdigit():
        return default
    mult = _BYTE_SUFFIXES.get(suffix, None) if suffix else 1
    if mult is None:
        return default
    return int(digits) * mult


def _parallelize_narrow_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition a low-parallelism input before CPU-heavy
    per-row work (shingling/hashing are interpreted HOFs — the cost is
    compute, not I/O).

    A small input (one parquet file → one split → one task) would pin the
    whole signature computation to a single core.  At 100 TB the scan
    already has thousands of splits and this is a no-op — the guard only
    fires when the input's parallelism is below the cluster's.

    Parallelism is estimated from ``inputFiles()`` (file-backed scans)
    rather than ``df.rdd.getNumPartitions()`` — touching ``.rdd`` forces a
    full plan conversion on every call.  Few-but-large files still split:
    local file sizes are stat'ed against ``files.maxPartitionBytes`` so a
    corpus of 8 one-GB files is NOT needlessly reshuffled (the scan
    already yields enough splits).  Non-file inputs (local test
    relations) and un-stat-able remote files below the file-count bar are
    repartitioned — at cluster scale the file count alone clears the bar.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files:
        if len(files) >= target:
            return df
        try:
            from urllib.parse import unquote, urlparse

            import os as _os

            total = 0
            for f in files:
                p = urlparse(f)
                if p.scheme not in ("", "file"):
                    raise OSError(f"cannot stat {p.scheme}:// cheaply")
                total += _os.path.getsize(unquote(p.path))
            max_pb = _parse_byte_size(
                str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
            )
            est_splits = max(len(files), -(-total // max(max_pb, 1)))
            if est_splits >= target:
                return df
        except OSError:
            pass
    return df.repartition(target)


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups: md5 digest -> canonical (min id) + copy count."""
    return df.groupBy(F.md5(F.col(content_col)).alias("content_hash")).agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("copies")
    )


def shingle_seq(text: Column, k: int = 5) -> Column:
    """ALL character k-shingles of the lowercased text, in position order
    (duplicates included).

    The cheap building block for pipelines that hash the shingles anyway:
    dedup AFTER hashing (`array_distinct` on longs) costs far less than a
    string-level distinct over the same multiset, and min-based consumers
    (minhash lanes) need no dedup at all.  Texts shorter than k yield an
    empty array — guarded explicitly because ``sequence(1, 0)`` in Spark
    generates a DESCENDING sequence, not an empty one.

    The lowered text is BOUND as a lambda variable through a one-element
    outer ``transform`` before the sliding window runs: a directly
    captured ``lower(text)`` expression would re-evaluate inside the
    interpreted per-element lambda — O(len^2) character work per
    document (same pathology as ops/lm.py::doc_bigrams; measured 5.6 ->
    1.6 s for the sf0.1 shingle stage, byte-identical output).
    """

    def gen(tt: Column) -> Column:
        n = F.length(tt) - (k - 1)
        return F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.substring(tt, i.cast("int"), k),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(F.lower(text)), gen), 1)


def shingle_set(text: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of the lowercased text (JVM-side)."""
    return F.array_distinct(shingle_seq(text, k))


_MINHASH_PRIME = 4294967291  # largest 32-bit prime


def _mix_consts(j: int) -> tuple[int, int]:
    """Per-lane universal-hash constants (module docstring): large odd
    multiplier + large increment, both < 2^30, from the Knuth
    multiplicative sequence.  Mirrored verbatim in the DuckDB oracle SQL —
    change both together or the catalog entry goes red."""
    a = ((2654435761 * (j + 1)) % 1073741824) | 1
    b = (2246822519 * j) % 1073741824
    return a, b


def minhash_signature(
    df: DataFrame,
    text_col: str,
    *,
    num_hashes: int = 16,
    shingle_len: int = 5,
    out_col: str = "minhash",
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash signature: lane j = min over shingles of the j-th universal
    mix of the base hash (module docstring).  One base hash per shingle.

    ``hash_fn="xxhash64"`` swaps the portable md5 base hash for the
    Spark-native one (see :func:`_hash_expr`) — the production path when
    cross-engine reproducibility is not required.

    Documents shorter than ``shingle_len`` get an empty-shingle sentinel
    signature (all 2^32 ≥ the mixing prime) so they never collide with
    real content.
    """
    # non-distinct shingles: array_min is duplicate-insensitive, so the
    # string-level distinct pass (the most expensive part of shingling at
    # corpus scale) is pure waste on the signature path
    sh = shingle_seq(F.col(text_col), shingle_len)
    # own projection: referenced num_hashes times below — CollapseProject
    # leaves it materialized instead of re-inlining the hash pass per lane
    hashed = df.withColumn(
        "__basehash", F.transform(sh, lambda s: _hash_expr(s, "h", hash_fn))
    )

    return hashed.withColumn(
        out_col, signature_from_basehash(F.col("__basehash"), num_hashes)
    ).drop("__basehash")


def signature_from_basehash(basehash: Column, num_hashes: int) -> Column:
    """MinHash signature array from a per-shingle base-hash array column.

    Split out of :func:`minhash_signature` so pipelines that already hold
    the hashed shingles (the fused path in :func:`minhash_dedup_pairs`, the
    ingest gate) can derive signatures without re-running the digest pass —
    the mixing is pure integer arithmetic, ~5x cheaper than the md5 pass
    it postdates.

    Lane layout note: a single aggregate() pass with a num_hashes-wide
    zip_with accumulator computes identical signatures and benches 2x
    faster in isolation, but measurably SLOWER (4.1s -> 6.0s at sf0.1)
    once fused into the full LSH pipeline stage — per-lane
    transform+array_min is the empirically faster layout end-to-end.
    """

    def _min_hash(j: int):
        # closure factory: a default-arg lambda would be parsed as the
        # binary (element, index) HOF form and silently corrupt the seed
        a, b = _mix_consts(j)
        return F.coalesce(
            F.array_min(
                F.transform(
                    basehash,
                    lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(_MINHASH_PRIME),
                )
            ),
            F.lit(1 << 32).cast("long"),
        )

    return F.array(*[_min_hash(j) for j in range(num_hashes)])


def signature_from_wide_grams(
    grams: Column, num_hashes: int, hash_fn: str = "md5"
) -> Column:
    """MinHash signature from a wide gram-hash array column as ONE Arrow
    stage — the vectorized twin of
    ``signature_from_basehash(transform(grams, _narrow_from_wide))``.

    Bit-exact to the Column form (pinned by
    ``tests/test_dedup.py::test_signature_from_wide_grams_matches_column_form``):
    the narrow projection (md5: ``g >> 28``; xxhash64: ``pmod(g, 2^32)``
    = ``uint64(g) & (2^32-1)``) and the per-lane affine mixes
    ``(h*a_j + b_j) % PRIME`` run entirely in uint64 without wraparound
    (h < 2^32, a < 2^30, so h*a + b < 2^63); gram-less / NULL arrays emit
    the same all-sentinel (2^32) signature ``coalesce`` produces.

    Why a Python stage on the hot path (guide §4.2, the simhash lesson):
    the Column form is ``num_hashes`` interpreted transform+array_min HOF
    passes over the gram array per row — measured 5.5-7.4 s noop at
    sf0.1 (5k docs, ~200 grams/doc) vs 1.2-1.4 s for this stage.  The
    mixing is one (grams x lanes) numpy broadcast per row, and only the
    long arrays cross the Arrow boundary (no text).  The md5 DIGEST pass
    stays in the JVM — its Arrow form measured slower (see
    :func:`wide_gram_hashes`); this stage postdates it and is pure
    integer arithmetic, which is exactly what numpy amortizes.
    """
    from pyspark.sql.types import ArrayType, LongType

    consts = [_mix_consts(j) for j in range(num_hashes)]
    is_md5 = hash_fn != "xxhash64"

    def fn(series):
        import numpy as np
        import pandas as pd

        a = np.array([c[0] for c in consts], dtype=np.uint64)[None, :]
        b = np.array([c[1] for c in consts], dtype=np.uint64)[None, :]
        prime = np.uint64(_MINHASH_PRIME)
        sent = np.full(num_hashes, 1 << 32, dtype=np.int64)
        s28 = np.uint64(28)
        m32 = np.uint64((1 << 32) - 1)
        out = []
        for g in series:
            if g is None or len(g) == 0:
                out.append(sent)
                continue
            u = np.asarray(g, dtype=np.int64).view(np.uint64)
            h = ((u >> s28) if is_md5 else (u & m32))[:, None]
            out.append(((h * a + b) % prime).min(axis=0).astype(np.int64))
        return pd.Series(out)

    return F.pandas_udf(fn, ArrayType(LongType()), F.PandasUDFType.SCALAR)(grams)


def minhash_grams_and_signature_numpy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    shingle_len: int = 5,
    grams_col: str = "__grams",
    sig_col: str = "minhash",
) -> DataFrame:
    """Arrow-batched numpy twin of the fused gram-hash + signature stage:
    (id, distinct 64-bit gram hashes, minhash signature) in ONE
    ``mapInPandas`` pass.

    Why a Python stage on the hot path, against this repo's own rule:
    Spark evaluates higher-order functions (``transform``) interpreted,
    outside whole-stage codegen, so the per-shingle hash dominates the
    corpus-scale dedup bench (~290 interpreted hashes/doc -> 182 s for 1M
    docs, VERDICT r04 task #4).  Here the whole doc is hashed with ~25
    numpy kernel calls: codepoints via fixed-width UTF-32-LE decode (so
    shingle boundaries are CHARACTER-exact, matching ``substring``
    semantics on non-ASCII text, not byte windows), a degree-(k-1)
    polynomial over a sliding window in wrapping uint64, a splitmix64
    avalanche, ``np.unique`` for the distinct gram set, and one
    (grams x lanes) broadcast matrix for all lane minima.

    The hash family differs from the md5/xxhash64 paths (values are not
    comparable across paths), and so does the lane derivation: each lane
    applies an INDEPENDENT splitmix64 avalanche of ``gram ^ K_j`` instead
    of the Column paths' affine mixes of one shared base hash.  Affine
    lanes have a measured pathology this corpus-scale path cannot afford:
    one unlucky shingle whose images under several lane multipliers are
    simultaneously tiny pins those lanes' minima for EVERY document
    containing it — on the 1M-doc scale corpus this produced a single
    band bucket holding 0.5% of all documents and a 13.2M-candidate
    explosion (vs 5.8M for an ideal random oracle, measured).  Per-lane
    avalanche restores random-oracle banding statistics at ~6 extra
    numpy ops per (grams x lanes) matrix.  The verified pair set is
    pinned to the md5 oracle path by pytest on both the planted and the
    real sf0.001 corpora.

    Scale: the stage is a narrow map (no shuffle); Arrow ships ~one text
    column per task and gets back (id, longs).  Empty/short docs emit an
    empty gram set and the same all-sentinel signature as the Column path.
    """
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_field.name, id_field.dataType, id_field.nullable),
            StructField(grams_col, ArrayType(LongType(), False), False),
            StructField(sig_col, ArrayType(LongType(), False), False),
        ]
    )
    k = shingle_len

    def _splitmix(x: int) -> int:
        z = x & ((1 << 64) - 1)
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
        return z ^ (z >> 31)

    lane_keys = [_splitmix(0x9E3779B97F4A7C15 * (j + 1)) for j in range(num_hashes)]

    def gen(batches):
        import numpy as np
        import pandas as pd

        # degree-(k-1) polynomial in the FNV-1a prime, wrapping in uint64
        pows = np.array(
            [pow(1099511628211, e, 1 << 64) for e in range(k - 1, -1, -1)],
            dtype=np.uint64,
        )
        c1 = np.uint64(0xBF58476D1CE4E5B9)
        c2 = np.uint64(0x94D049BB133111EB)
        s30, s27, s31 = np.uint64(30), np.uint64(27), np.uint64(31)
        m32 = np.uint64((1 << 32) - 1)
        keys = np.array(lane_keys, dtype=np.uint64)[None, :]
        sentinel = np.full(num_hashes, 1 << 32, dtype=np.int64)
        empty = np.empty(0, dtype=np.int64)

        with np.errstate(over="ignore"):
            for pdf in batches:
                grams_out: list = []
                sig_out: list = []
                for text in pdf[text_col]:
                    cp = np.frombuffer(
                        ("" if text is None else text).lower().encode("utf-32-le"),
                        dtype=np.uint32,
                    ).astype(np.uint64)
                    n = cp.size - (k - 1)
                    if n <= 0:
                        grams_out.append(empty)
                        sig_out.append(sentinel)
                        continue
                    h = cp[:n] * pows[0]
                    for j in range(1, k):
                        h += cp[j : j + n] * pows[j]
                    h ^= h >> s30
                    h *= c1
                    h ^= h >> s27
                    h *= c2
                    h ^= h >> s31
                    u = np.unique(h)
                    grams_out.append(u.view(np.int64))
                    # independent per-lane avalanche (docstring: affine
                    # lanes correlate); lane value = low 32 bits -> min
                    z = u[:, None] ^ keys
                    z ^= z >> s30
                    z *= c1
                    z ^= z >> s27
                    z *= c2
                    z ^= z >> s31
                    sig_out.append((z & m32).min(axis=0).astype(np.int64))
                yield pd.DataFrame(
                    {
                        id_field.name: pdf[id_col],
                        grams_col: grams_out,
                        sig_col: sig_out,
                    }
                )

    return df.select(id_col, text_col).mapInPandas(gen, out_schema)


def band_keys_expr(sig_col: Column, bands: int, rows_per_band: int) -> Column:
    """The LSH band bucket keys ("<band>:<v_v_v_v>") as one array column.

    Single source of truth for the banding layout — the batch pair join
    AND the incremental ingestion index derive buckets from here, so they
    can never silently diverge.
    """
    return F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                # slice() is 1-indexed
                F.concat_ws("_", F.slice(sig_col, b * rows_per_band + 1, rows_per_band)),
            )
            for b in range(bands)
        ]
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    *,
    bands: int = 4,
    rows_per_band: int = 4,
    sig_col: str = "minhash",
    materialize: bool = True,
) -> DataFrame:
    """LSH banding: docs sharing any band's bucket become candidate pairs.

    Output: (id_a, id_b) with id_a < id_b, distinct.  The band/bucket
    equi-join is the only shuffle; each side carries (bucket_key, id).

    ``materialize`` (default on) localCheckpoints the exploded bucket
    frame before the self-join.  Without it Spark computes the whole
    signature pipeline once PER SIDE — measured: ReusedExchange never
    fires across the two sides of a self-join under AQE, hint or no hint —
    which doubled the single most expensive stage of the dedup bench.
    The checkpointed frame is (bucket_key, id) only — tiny relative to the
    corpus — and truncates lineage, the same trade the ingest gate makes
    (streaming/ingest.py).  Pass ``materialize=False`` to keep the
    operator fully stateless (e.g. when composing into a larger plan that
    the caller materializes itself).
    """
    band_keys = band_keys_expr(F.col(sig_col), bands, rows_per_band)
    # one explode pass emits every band key — the signature plan is not
    # copied once per band as a union would do
    buckets = sigs.select(
        F.col(id_col).alias("__id"), F.explode(band_keys).alias("__bucket")
    )
    if materialize:
        buckets = buckets.localCheckpoint(eager=True)
    # shuffle-hash (not broadcast/sort-merge) self-join: hash join avoids
    # sorting either side, and at corpus scale the bucket table cannot
    # broadcast
    left = buckets.alias("l").hint("shuffle_hash")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            (F.col("l.__bucket") == F.col("r.__bucket"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )


def minhash_cross_pairs(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    shingle_len: int = 5,
    threshold: float = 0.7,
    hash_fn: str = "md5",
    materialize: bool = True,
) -> DataFrame:
    """Cross-corpus near-dup join: which training documents are near-dups
    of ANY benchmark document (document-level decontamination — the
    companion to :func:`ngram_contamination`'s n-gram overlap test).

    Same fused single-hash-pass design as :func:`minhash_dedup_pairs`,
    but the band-bucket equi-join runs BETWEEN the two corpora instead of
    as a self-join, so the work is |train| + |benchmark| signatures and a
    train-vs-benchmark bucket join — never a quadratic self-product.  The
    benchmark side is typically small (an eval suite), so AQE broadcasts
    its bucket/gram frames and the train side streams map-side.

    Output: (train_id, bench_id, jaccard), exact-verified >= threshold.
    """

    def prep(df: DataFrame, side: str):
        hashed = _parallelize_narrow_input(df.select(id_col, text_col)).select(
            F.col(id_col).alias(f"__{side}"),
            wide_gram_hashes(F.col(text_col), shingle_len, hash_fn).alias(
                f"__{side}_grams"
            ),
        )
        if materialize:
            # Arrow lane stage (see minhash_dedup_pairs) — gated on the
            # checkpoint for the same ExtractPythonUDFs reason
            hashed = hashed.localCheckpoint(eager=True)
            sigs = hashed.withColumn(
                "minhash",
                signature_from_wide_grams(
                    F.col(f"__{side}_grams"), num_hashes, hash_fn
                ),
            )
        else:
            basehash = F.transform(
                F.col(f"__{side}_grams"), lambda g: _narrow_from_wide(g, hash_fn)
            )
            sigs = hashed.withColumn(
                "minhash", signature_from_basehash(basehash, num_hashes)
            )
        # sentinel-signature (gram-less) docs excluded from banding —
        # they can never verify and would otherwise share one bucket
        buckets = sigs.filter(F.size(f"__{side}_grams") > 0).select(
            f"__{side}",
            F.explode(
                band_keys_expr(F.col("minhash"), bands, rows_per_band)
            ).alias("__bucket"),
        )
        return hashed.select(f"__{side}", f"__{side}_grams"), buckets

    tg, tb = prep(train, "tid")
    bg, bb = prep(benchmark, "bid")
    cands = (
        tb.hint("shuffle_hash")
        .join(bb, "__bucket")
        .select("__tid", "__bid")
        .distinct()
    )
    # size-ratio shed before the gram joins — same sound J <= min/max
    # bound (with the 1e-6 rounding margin) as _verify_exact_jaccard
    cands = (
        cands.join(tg.select("__tid", F.size("__tid_grams").alias("__na")), "__tid")
        .join(bg.select("__bid", F.size("__bid_grams").alias("__nb")), "__bid")
        .filter(
            F.least("__na", "__nb")
            >= F.greatest("__na", "__nb") * F.lit(threshold - 1e-6)
        )
        .select("__tid", "__bid")
    )
    return (
        cands.join(tg, "__tid")
        .join(bg, "__bid")
        # Arrow intersect + JVM rounding, same split as
        # _verify_exact_jaccard (grams here are always hashed longs)
        .withColumn(
            "__i", _intersect_size_arrow(F.col("__tid_grams"), F.col("__bid_grams"))
        )
        .withColumn(
            "jaccard",
            _jaccard_round6(F.col("__tid_grams"), F.col("__bid_grams"), F.col("__i")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("__tid").alias("train_id"),
            F.col("__bid").alias("bench_id"),
            "jaccard",
        )
    )


def ngram_set(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams (lowercased) — the exact-Jaccard unit."""
    return shingle_set(text, n)


def jaccard_expr(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays; empty∪empty -> 0.0.

    |A∪B| is computed as |A|+|B|-|A∩B| (exact for distinct-element
    arrays) — one hash-set pass instead of the two an explicit
    ``array_union`` would add; the verify join over tens of thousands of
    candidate pairs is where this matters.
    """
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def _intersect_size_arrow(a: Column, b: Column) -> Column:
    """``|A ∩ B|`` of two DISTINCT-element long-array columns as ONE
    Arrow stage — the numpy twin of ``size(array_intersect(a, b))``.

    Exact: the arrays hold distinct int64 gram hashes (``array_distinct``
    / ``np.unique`` upstream), so ``np.intersect1d(assume_unique=True)``
    counts precisely the same elements; NULL inputs return 0, which the
    caller's NULL-propagating union arithmetic turns into the same 0.0
    jaccard the Column form yields.  Marked **non-deterministic** purely
    as an optimizer fence (guide §4.4): the ``jaccard >= threshold``
    filter above it otherwise duplicates the UDF into a second
    ArrowEvalPython below the pushed-down filter, and multiple
    references inside one projection would not be CSE'd.

    Why Python on the hot path (guide §4.2): per-pair
    ``array_intersect`` is the verify stage's dominant cost (the gram
    joins are broadcast, zero shuffles) — measured 2.7 s JVM vs 0.95 s
    for this stage on the sf0.1 post-shed candidate set, results
    byte-identical.
    """
    from pyspark.sql.types import LongType

    def fn(it):
        import numpy as np
        import pandas as pd

        for a_s, b_s in it:
            out = [
                0
                if x is None or y is None
                else len(
                    np.intersect1d(
                        np.asarray(x, dtype=np.int64),
                        np.asarray(y, dtype=np.int64),
                        assume_unique=True,
                    )
                )
                for x, y in zip(a_s, b_s)
            ]
            yield pd.Series(out, dtype="int64")

    return (
        F.pandas_udf(fn, LongType(), F.PandasUDFType.SCALAR_ITER)
        .asNondeterministic()(a, b)
    )


def _jaccard_round6(a: Column, b: Column, inter: Column) -> Column:
    """round(J, 6) from a precomputed ``|A ∩ B|`` column reference —
    arithmetic identical to :func:`jaccard_expr` (|A∪B| = |A|+|B|-|A∩B|,
    empty∪empty -> 0.0), so swapping how the intersect size is computed
    cannot move the emitted value."""
    i = inter.cast("double")
    union = F.size(a) + F.size(b) - i
    return F.round(F.when(union > 0, i / union).otherwise(F.lit(0.0)), 6)


def _verify_exact_jaccard(cands: DataFrame, grams: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of LSH candidate pairs against the
    (__gid, __grams) hashed-gram frame — false LSH positives never
    reach the output.

    Size-ratio shed (r16, guide §1.2 "don't compute things you throw
    away"): J = |A∩B|/|A∪B| <= min(|A|,|B|)/max(|A|,|B|), so a pair
    whose gram-count ratio cannot reach the threshold cannot verify —
    it is dropped BEFORE the gram arrays are joined in and intersected
    (the per-pair array_intersect is the verify stage's dominant cost:
    boilerplate band collisions produce ~10x more candidates than
    verified pairs, 33% of them shed by this bound on the sf0.1
    corpus).  The bound keeps a 1e-6 margin because the emitted filter
    compares the ROUNDED jaccard (round(J, 6) >= t admits J >= t-5e-7);
    sound, never drops a pair the exact filter would keep — results
    byte-identical.
    """
    sizes = grams.select(F.col("__gid"), F.size("__grams").alias("__n"))
    cands = (
        cands.join(
            sizes.withColumnRenamed("__gid", "id_a").withColumnRenamed("__n", "__na"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("__gid", "id_b").withColumnRenamed("__n", "__nb"),
            "id_b",
        )
        .filter(
            F.least("__na", "__nb")
            >= F.greatest("__na", "__nb") * F.lit(threshold - 1e-6)
        )
        .select("id_a", "id_b")
    )
    joined = cands.join(
        grams.withColumnRenamed("__gid", "id_a").withColumnRenamed("__grams", "__ga"),
        "id_a",
    ).join(
        grams.withColumnRenamed("__gid", "id_b").withColumnRenamed("__grams", "__gb"),
        "id_b",
    )
    if dict(grams.dtypes)["__grams"] == "array<bigint>":
        # hashed-gram paths: the intersect count runs as one Arrow
        # stage (r16, guide §4.2 — see _intersect_size_arrow); the
        # division + rounding stay in the JVM so the emitted jaccard is
        # bit-identical to the Column form
        joined = joined.withColumn(
            "__i", _intersect_size_arrow(F.col("__ga"), F.col("__gb"))
        ).withColumn(
            "jaccard", _jaccard_round6(F.col("__ga"), F.col("__gb"), F.col("__i"))
        )
    else:
        # string-gram path (md5 with verify_ngram != shingle_len): the
        # oracle is string-exact and the numpy intersect is int64-only
        joined = joined.withColumn(
            "jaccard", F.round(jaccard_expr(F.col("__ga"), F.col("__gb")), 6)
        )
    return joined.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def minhash_pairs_from_signatures(
    hashed: DataFrame,
    id_col: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    threshold: float = 0.7,
    materialize: bool = True,
    grams_col: str = "__grams",
    sig_col: str = "minhash",
) -> DataFrame:
    """LSH banding + signature-estimate prefilter + exact-Jaccard verify
    over a PRECOMPUTED (id, distinct gram-hash array, minhash signature)
    frame — the tail of the numpy fast path, split out so a persisted
    signature frame (e.g. the catalog's parquet oracle fixture) can feed
    the identical candidate/verify pipeline.

    Signature-estimate prefilter: the bucket frame carries the
    16-long signature, so each candidate's estimated Jaccard
    (matching lanes / lanes) is available AT the bucket join.  The
    bar must sit STRICTLY above rows_per_band — a band collision
    already guarantees rows_per_band matching lanes, so any bar at
    or below that is a no-op (VERDICT r05 advice).  At
    rows_per_band+1 of 16 lanes (est J ~0.31 vs threshold 0.7) it
    sheds low-J boilerplate collisions (J~0.1 corpora: millions of
    band candidates at 1M docs, measured) before the expensive
    gram-array verify join.  Recall cost: a true J>=0.7 pair fails
    only with exactly rows_per_band matching lanes ALL forming the
    colliding band — P(Bin(16,0.7)=4) * P(4 aligned) ~ 5e-7.
    Exact Jaccard still decides every emitted pair.  The contract
    is pinned adversarially: tests/test_minhash_recall.py
    CONSTRUCTS a J~0.88 pair agreeing in exactly one band with no
    extra lane and asserts it is dropped here but emitted by the
    prefilter-less md5/xxhash64 paths (plain-LSH recall).
    """
    if materialize:
        hashed = hashed.localCheckpoint(eager=True)
    est_min = max(rows_per_band + 1, num_hashes // 4)
    # gram-less docs (shorter than the shingle) all carry the same
    # all-sentinel signature: every one lands in ONE band bucket, a
    # quadratic candidate hazard on corpora with many empty docs.
    # They can never verify (Jaccard vs anything, incl. each other,
    # is 0 < threshold), so excluding them changes no results.
    buckets = hashed.filter(F.size(grams_col) > 0).select(
        F.col(id_col).alias("__id"),
        F.col(sig_col).alias("__sig"),
        F.explode(
            band_keys_expr(F.col(sig_col), bands, rows_per_band)
        ).alias("__bucket"),
    )
    if materialize:
        buckets = buckets.localCheckpoint(eager=True)
    joined = (
        buckets.alias("l")
        .hint("shuffle_hash")
        .join(
            buckets.alias("r"),
            (F.col("l.__bucket") == F.col("r.__bucket"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
    )
    est_matches = F.size(
        F.filter(
            F.zip_with("l.__sig", "r.__sig", lambda x, y: x == y),
            lambda v: v,
        )
    )
    cands = (
        joined.filter(est_matches >= F.lit(est_min))
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )
    grams = hashed.select(F.col(id_col).alias("__gid"), F.col(grams_col).alias("__grams"))
    return _verify_exact_jaccard(cands, grams, threshold)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    shingle_len: int = 5,
    verify_ngram: int = 5,
    threshold: float = 0.7,
    hash_fn: str = "md5",
    materialize: bool = True,
) -> DataFrame:
    """End-to-end MinHash+LSH near-dup detection with exact verification.

    signature -> band-bucket join -> candidate pairs -> exact shingle
    Jaccard >= threshold.  The verify step re-joins the (small) candidate
    pair set against the shingle arrays, so false LSH positives never reach
    the output.  ``hash_fn="xxhash64"`` selects the Spark-native base hash
    (same banding math, ~10x cheaper signatures, no SQL oracle).

    When ``verify_ngram == shingle_len`` (the default) the pipeline fuses:
    the verify grams ARE the signature shingles, so ONE hashed-shingle
    frame — localCheckpoint'ed when ``materialize`` (default) — feeds both
    the LSH banding and the exact-Jaccard verification.  The expensive
    per-shingle digest pass runs exactly once for the whole operator, and
    the verify intersects long arrays instead of strings (Jaccard over
    distinct hashed grams: deterministic in both engines, equal to string
    Jaccard up to ~|grams|^2/2^32 collision probability; the DuckDB oracle
    applies the identical hash so results stay bit-exact).  The
    checkpointed frame is (id, hashed-gram array) — roughly the footprint
    of the text column itself, spilled to local disk by Spark when it
    exceeds storage memory.
    """
    df = _parallelize_narrow_input(df.select(id_col, text_col))
    if hash_fn == "numpy":
        if verify_ngram != shingle_len:
            raise ValueError("hash_fn='numpy' requires verify_ngram == shingle_len")
        # grams + signature in one Arrow-batched numpy pass (the 1M-doc
        # signature bottleneck fix — see minhash_grams_and_signature_numpy)
        hashed = minhash_grams_and_signature_numpy(
            df, id_col, text_col, num_hashes=num_hashes, shingle_len=shingle_len
        )
        return minhash_pairs_from_signatures(
            hashed,
            id_col,
            num_hashes=num_hashes,
            bands=bands,
            rows_per_band=rows_per_band,
            threshold=threshold,
            materialize=materialize,
        )
    if verify_ngram == shingle_len:
        # ONE digest pass: store the wide (60/64-bit) gram hash — the
        # verify unit — and derive the 32-bit minhash base by projection
        # (signatures/banding identical to the unfused path; see
        # _hash_expr_wide for the collision math).
        # hash ALL shingles then distinct the LONGS: same set in the same
        # first-occurrence order as distinct-then-hash, without the
        # string-level distinct pass (strings hash/compare far slower);
        # md5 runs as one Arrow stage (see wide_gram_hashes)
        hashed = df.select(
            F.col(id_col),
            wide_gram_hashes(F.col(text_col), shingle_len, hash_fn).alias("__grams"),
        )
        if materialize:
            hashed = hashed.localCheckpoint(eager=True)
        # no distinct on the narrow projection: array_min per lane is
        # duplicate-insensitive, so the signatures are identical and the
        # extra O(|grams|) pass is pure cost.  Lanes run as one Arrow
        # stage over the checkpointed long arrays (r16, guide §4.2 —
        # bit-exact twin of the interpreted HOF form, ~4x measured).
        # Arrow only when materialized: un-checkpointed, the bucket
        # self-join duplicates the UDF-bearing subtree and Spark's
        # ExtractPythonUDFs misses the deduplicated right copy (the raw
        # fn(...) lands in a plain Project and fails at run time with
        # INTERNAL_ERROR "Cannot evaluate expression") — reproduced on
        # Spark 4.1.2, so the stateless path keeps the Column form.
        if materialize:
            sigs = hashed.withColumn(
                "minhash",
                signature_from_wide_grams(F.col("__grams"), num_hashes, hash_fn),
            )
        else:
            basehash = F.transform(
                F.col("__grams"), lambda g: _narrow_from_wide(g, hash_fn)
            )
            sigs = hashed.withColumn(
                "minhash", signature_from_basehash(basehash, num_hashes)
            )
        # sentinel-signature docs excluded from banding (see the numpy
        # branch note): no result change, kills the empty-doc mega-bucket
        cands = lsh_candidate_pairs(
            sigs.filter(F.size("__grams") > 0), id_col,
            bands=bands, rows_per_band=rows_per_band, materialize=materialize
        )
        grams = hashed.select(F.col(id_col).alias("__gid"), F.col("__grams"))
    else:
        sigs = minhash_signature(
            df, text_col, num_hashes=num_hashes, shingle_len=shingle_len, hash_fn=hash_fn
        )
        cands = lsh_candidate_pairs(
            sigs, id_col, bands=bands, rows_per_band=rows_per_band, materialize=materialize
        )
        gram_arr = ngram_set(F.col(text_col), verify_ngram)
        if hash_fn == "xxhash64":
            # verify on 64-bit gram hashes instead of the strings: long-array
            # intersect/union is much cheaper and the arrays shuffle smaller;
            # Jaccard is unchanged up to (negligible) 64-bit collisions.  The
            # md5 path keeps string grams — its DuckDB oracle is string-exact.
            gram_arr = F.transform(gram_arr, lambda g: F.xxhash64(g))
        grams = df.select(F.col(id_col).alias("__gid"), gram_arr.alias("__grams"))
    return _verify_exact_jaccard(cands, grams, threshold)


def connected_components(
    pairs: DataFrame,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components of the near-dup pair graph: (node, component)
    where component = the smallest node id reachable from ``node``.

    Iterative min-label propagation: each round joins the (undirected)
    edge list against current labels and takes the per-node minimum —
    both sides shuffle on the node id, so successive rounds reuse the
    same hash partitioning.  Rounds needed = graph diameter, which for
    LSH near-dup graphs is small (clusters are band-collision cliques,
    diameter 1-3); ``max_iters`` bounds adversarial chains.  Each round
    is localCheckpoint'ed (eager) so lineage — and the replay cost of a
    lost executor — stays O(1) instead of O(rounds); convergence is
    detected with a cheap ``limit(1)`` existence probe, not a full count.
    Deterministic: min over ids, no RNG.
    """
    # materialize the pair list ONCE before mirroring it (r15, guide §5):
    # the union below references ``pairs`` twice, and Spark executes the
    # (expensive — LSH verify join, IVF scoring) upstream subtree once per
    # reference; the pairs frame itself is tiny by construction (only
    # near-dup pairs), so checkpointing it costs almost nothing and the
    # candidate generator runs exactly once per dedup call
    fwd = pairs.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).localCheckpoint(eager=True)
    edges = fwd.union(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select("u").distinct().select(F.col("u").alias("node"), F.col("u").alias("component"))
    ).localCheckpoint(eager=True)
    comp_t = dict(labels.dtypes)["component"]  # ids may be any orderable type
    for _ in range(max_iters):
        prop = (
            edges.join(labels, edges["v"] == labels["node"])
            .select(
                F.col("u").alias("node"),
                F.col("component"),
                F.lit(None).cast(comp_t).alias("__old"),
            )
        )
        # carry each node's OLD label through the aggregation (max skips
        # the neighbor rows' NULLs; every node has exactly one own-row),
        # so the convergence probe below is a shuffle-free filter over
        # the just-checkpointed frame instead of a join of two label
        # frames — one fewer shuffle job per iteration
        own = labels.select(
            "node", "component", F.col("component").alias("__old")
        )
        new_labels = (
            prop.unionByName(own)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.max("__old").alias("__old"),
            )
            .localCheckpoint(eager=True)
        )
        # min-label propagation only ever lowers a label
        changed = (
            new_labels.filter(F.col("component") < F.col("__old")).limit(1).count()
        )
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    return labels


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Fuzzy-dedup survivor set: collapse each near-dup component to its
    canonical (minimum-id) member and keep every untouched document.

    The components frame is tiny relative to the corpus (only documents
    that appear in a pair), so the anti-join side is the small one —
    broadcast when it fits.
    """
    comp = connected_components(pairs, src_col=src_col, dst_col=dst_col)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Quality-weighted fuzzy-dedup survivors: each near-dup component
    keeps its HIGHEST-``score_col`` member (ties -> lowest id) instead
    of :func:`dedup_keep_canonical`'s lowest-id member — the form
    production curation pipelines want, since near-dup clusters usually
    mix a clean original with mangled scrapes and "min id" keeps an
    arbitrary one.

    Shuffle shape matches keep-canonical: components only exist for
    paired documents, so the member/winner frames are tiny relative to
    the corpus; scores for just those members arrive via one semi-sized
    join, the per-component argmax is a map-side-combining ``min_by``
    aggregate (not a window), and the corpus is filtered with a
    broadcast-friendly left-anti join.  Determinism: ``score_col``
    values must be engine-stable (the quality scores here are exact
    multiples of 1/4, so cross-engine equality is exact).
    """
    comp = connected_components(pairs, src_col=src_col, dst_col=dst_col)
    members = comp.join(
        df.select(F.col(id_col).alias("node"), F.col(score_col).alias("__s")),
        "node",
    )
    winners = members.groupBy("component").agg(
        F.min_by(
            F.col("node"),
            F.struct((-F.col("__s")).alias("ns"), F.col("node").alias("n")),
        ).alias("__winner")
    )
    losers = (
        comp.join(winners, "component")
        .filter(F.col("node") != F.col("__winner"))
        .select(F.col("node").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens of the lowercased text (empty-string safe)."""
    t = F.lower(F.trim(text))
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def _simhash_md5_fingerprint(toks: Column, bits: int) -> Column:
    """SimHash fingerprint (long) from a token-array column, md5 base
    hash, as ONE Arrow stage.  Bit-identical to the JVM expression form
    in :func:`simhash`: bit b set iff sum over tokens of
    (bit b of int(md5('0|'||tok)[:8],16) ? +1 : -1) > 0; empty/NULL
    token arrays map to 0 (every bit sum is the 0 initial)."""
    from pyspark.sql.types import LongType

    def fn(series):
        import numpy as np
        import pandas as pd
        from hashlib import md5

        memo: dict = {}

        def h(tok: str) -> int:
            v = memo.get(tok)
            if v is None:
                v = memo[tok] = int(
                    md5(b"0|" + tok.encode("utf-8")).hexdigest()[:8], 16
                )
            return v

        shifts = np.arange(bits, dtype=np.uint64)
        out = []
        for toks_v in series:
            if toks_v is None or len(toks_v) == 0:
                out.append(0)
                continue
            hs = np.fromiter(
                (h(t) for t in toks_v), dtype=np.uint64, count=len(toks_v)
            )
            ones = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64).sum(
                axis=0
            )
            pos = (2 * ones - len(hs)) > 0  # bit sum over +/-1 votes
            val = 0
            for b in np.nonzero(pos)[0]:
                val += (1 << int(b)) if b < 63 else -(1 << 63)
            out.append(val)
        return pd.Series(out, dtype="int64")

    return F.pandas_udf(fn, LongType(), F.PandasUDFType.SCALAR)(toks)


def simhash(
    df: DataFrame,
    text_col: str,
    *,
    bits: int = 32,
    out_col: str = "simhash",
    hash_fn: str = "md5",
) -> DataFrame:
    """SimHash: bit b of the output is 1 iff sum over tokens of
    (bit b of h(token) ? +1 : -1) is positive.

    ``bits`` is bounded by the base hash width — [1, 32] for ``"md5"``
    (oracle-portable 32-bit base), [1, 64] for ``"xxhash64"`` (full
    Spark-native 64-bit base, no SQL oracle): higher bit positions would
    be constant 0 for every document — silently degrading, never
    informative.  At corpus scale the width matters: 32-bit fingerprints
    at hamming <= 3 collide at ~5.5k/2^32 per pair, which is ~1.3M false
    pairs in a 1M-doc corpus (measured on the scale bench); at 64 bits
    the same corpus expects ~10^-3 collision pairs total.

    Pure Column expressions — no explode, no shuffle; near-dup docs
    differ in few bits (compare with ``bit_count(a ^ b)``).  The token
    hash array gets its OWN projection before the per-bit aggregates:
    referenced ``bits`` times, CollapseProject keeps it materialized, so
    the expensive md5-per-token pass runs once per row instead of once
    per (row x bit) — measured 6x on the pair bench at sf0.1.
    """
    max_bits = 64 if hash_fn == "xxhash64" else 32
    if not 1 <= bits <= max_bits:
        raise ValueError(
            f"bits must be in [1, {max_bits}] ({max_bits}-bit {hash_fn} base hash), got {bits}"
        )
    toks = tokens_expr(F.col(text_col))
    if hash_fn == "md5":
        # r16 (guide §4.2): the md5 fingerprint runs as ONE Arrow stage —
        # the JVM form paid an interpreted md5-per-token transform PLUS
        # ``bits`` interpreted aggregate() passes over the hash array per
        # row.  Tokenization stays in the JVM (lower/trim/split — locale
        # and regex semantics are the JVM's); Python md5s each token and
        # folds the bit sums vectorized.  Bit-exact: integer arithmetic
        # both sides, pinned by tests and the DuckDB oracle.
        return df.withColumn(out_col, _simhash_md5_fingerprint(toks, bits))
    tok_hash = lambda t: F.xxhash64(F.lit("0"), t)  # noqa: E731 — full 64-bit
    hashed = df.withColumn("__tokhash", F.transform(toks, tok_hash))

    def _bit_sum(b: int):
        # closure factory: HOF lambdas must take exactly (acc, x);
        # shiftrightunsigned extracts bits correctly for NEGATIVE 64-bit
        # base hashes too (arithmetic shiftright would sign-extend and
        # make `% 2` return -1)
        return F.aggregate(
            F.col("__tokhash"),
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftrightunsigned(h, b) % 2) * 2 - 1,
        )

    bit_sums = [_bit_sum(b) for b in range(bits)]
    value = None
    for b, s in enumerate(bit_sums):
        # bit 63's weight is the sign bit: its two's-complement long value
        bit_val = (1 << b) if b < 63 else -(1 << 63)
        contrib = F.when(s > 0, F.lit(bit_val).cast("long")).otherwise(F.lit(0).cast("long"))
        value = contrib if value is None else value + contrib
    return hashed.withColumn(out_col, value).drop("__tokhash")


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bits: int = 32,
    max_hamming: int = 3,
    bands: int | None = None,
    materialize: bool = True,
    hash_fn: str = "md5",
) -> DataFrame:
    """SimHash near-dup pairs: band-of-bits equi-join + exact Hamming verify.

    Pigeonhole guarantee: split the ``bits``-bit fingerprint into
    ``bands`` (> max_hamming, default max_hamming+1, widths as equal as
    the remainder allows) segments — two fingerprints within Hamming
    distance ``max_hamming`` differ in at
    most ``max_hamming`` segments, so they agree EXACTLY on at least one.
    The (band index, band value) equi-join therefore finds every
    qualifying pair with zero false negatives and no quadratic self-join;
    ``bit_count(a XOR b)`` then verifies candidates exactly.  Output:
    (id_a, id_b, hamming), id_a < id_b, distinct.

    Scale shape mirrors :func:`lsh_candidate_pairs`: the join sides carry
    (band key, id, fingerprint) — one long beyond the LSH layout — and
    the band explode is the only row multiplication (x bands).
    ``materialize`` (default) localCheckpoints the tiny banded frame so
    the fingerprint pipeline is not computed once per join side (same
    trade, and same escape hatch, as the LSH operator).
    """
    fp = simhash(df.select(id_col, text_col), text_col, bits=bits, hash_fn=hash_fn)
    return hamming_banded_pairs(
        fp,
        id_col,
        "simhash",
        bits=bits,
        max_hamming=max_hamming,
        bands=bands,
        materialize=materialize,
    )


def hamming_banded_pairs(
    fp_df: DataFrame,
    id_col: str,
    fp_col: str,
    *,
    bits: int,
    max_hamming: int = 3,
    bands: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """The pigeonhole band join on its own: pairs of rows whose
    ``bits``-bit fingerprint column is within Hamming distance
    ``max_hamming`` — shared by :func:`simhash_pairs` (text) and the
    perceptual image dedup (ops/multimodal.py dHash), and usable on any
    integer fingerprint.  Guarantee and scale shape as documented on
    :func:`simhash_pairs`: ``bands`` (> max_hamming) bit segments — a
    pair within the distance flips at most ``max_hamming`` segments, so
    it agrees exactly on >= 1, and the (band index, band value)
    equi-join has zero false negatives; ``bit_count(xor)`` verifies
    exactly.  Segments need NOT be equal-width (the pigeonhole argument
    never uses width), so the default is the MINIMAL ``max_hamming + 1``
    bands with the remainder bits spread across the first bands — the
    widest segments the bound allows.  Wider segments matter at corpus
    scale: bucket count per band is 2^width, so 5x13-bit bands give
    ~8192-way selectivity where 8x8-bit bands give 256-way — ~32x
    smaller equi-join buckets AND 38% fewer exploded rows per id.
    Output: (id_a, id_b, hamming), id_a < id_b, distinct."""
    if bands is None:
        bands = max_hamming + 1
    if bands <= max_hamming:
        raise ValueError(f"bands ({bands}) must exceed max_hamming ({max_hamming})")
    base, rem = divmod(bits, bands)
    if base == 0:
        raise ValueError(f"bands ({bands}) cannot exceed bits ({bits})")
    # shiftrightunsigned + bitwiseAND: band values stay correct when the
    # 64-bit fingerprint's sign bit is set (arithmetic shift + signed %
    # would emit negative keys — consistent but needlessly confusing)
    exprs, pos = [], 0
    for b in range(bands):
        w = base + (1 if b < rem else 0)
        exprs.append(
            F.concat_ws(
                ":",
                F.lit(str(b)),
                F.shiftrightunsigned(F.col(fp_col), pos)
                .bitwiseAND(F.lit((1 << w) - 1))
                .cast("string"),
            )
        )
        pos += w
    band_arr = F.array(*exprs)
    buckets = fp_df.select(
        F.col(id_col).alias("__id"),
        F.col(fp_col).alias("__sim"),
        F.explode(band_arr).alias("__band"),
    )
    if materialize:
        buckets = buckets.localCheckpoint(eager=True)
    left, right = buckets.alias("l"), buckets.alias("r")
    return (
        left.join(
            right,
            (F.col("l.__band") == F.col("r.__band")) & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.bit_count(F.col("l.__sim").bitwiseXOR(F.col("r.__sim"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    group_col: str | None = None,
    materialize: bool = True,
    hash_fn: str | None = "md5",
) -> DataFrame:
    """N-gram Jaccard similarity pairs within optional groups.

    Without LSH this is quadratic — ``group_col`` (e.g. language, length
    bucket) bounds the blow-up; for unbounded corpora use
    :func:`minhash_dedup_pairs` instead.

    Cost controls, all output-preserving on the planted corpora:
    - grams are HASHED before the quadratic core (``hash_fn="md5"``
      default — portable, the DuckDB oracle applies the identical hash,
      so results stay bit-exact; ``"xxhash64"`` Spark-native; ``None``
      raw strings).  Long-array intersects measured 2.3x faster than
      string intersects at sf0.1; Jaccard over distinct hashed grams
      equals string Jaccard up to ~|grams|^2/2^32 collision probability.
    - the gram-size bound ``min(|A|,|B|) >= threshold * max(|A|,|B|)``
      is IMPLIED by Jaccard >= threshold (intersect <= min, union >=
      max), so pairs it discards never reach the array intersect.
    - ``materialize`` (default) localCheckpoints the gram frame so the
      shingling+hash pass isn't computed once per join side.
    """
    df = _parallelize_narrow_input(df)
    gram_arr = ngram_set(F.col(text_col), n)
    if hash_fn is not None:
        gram_arr = F.array_distinct(
            F.transform(gram_arr, lambda g: _hash_expr(g, "g", hash_fn))
        )
    g = df.select(
        F.col(id_col).alias("__id"),
        gram_arr.alias("__grams"),
        *( [F.col(group_col).alias("__grp")] if group_col else [] ),
    ).withColumn("__sz", F.size(F.col("__grams")))
    if materialize:
        g = g.localCheckpoint(eager=True)
    left, right = g.alias("l"), g.alias("r")
    cond = F.col("l.__id") < F.col("r.__id")
    if group_col:
        cond = cond & (F.col("l.__grp") == F.col("r.__grp"))
    cond = cond & (
        F.least(F.col("l.__sz"), F.col("r.__sz"))
        >= F.lit(threshold) * F.greatest(F.col("l.__sz"), F.col("r.__sz"))
    )
    return (
        left.join(right, cond)
        .withColumn("jaccard", F.round(jaccard_expr(F.col("l.__grams"), F.col("r.__grams")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"), F.col("jaccard")
        )
    )


def word_ngrams_expr(text: Column, n: int) -> Column:
    """Distinct word n-grams of the whitespace-tokenized text (space-joined)."""
    toks = tokens_expr(text)
    m = F.size(toks) - (n - 1)
    return F.when(
        m >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), m),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    hash_fn: str = "md5",
) -> DataFrame:
    """Test-set decontamination: flag training documents sharing any word
    n-gram with a benchmark corpus (the standard n-gram-overlap
    contamination check used before training on scraped data).

    Output: one row per training document — (id, matched_ngrams,
    contaminated); ``matched_ngrams`` counts the DISTINCT benchmark
    n-grams the document contains.

    Scale shape: both sides explode to hashed (gram, id) pairs — fixed
    width, never text — and meet in an equi-join on the gram hash.  The
    benchmark side is the distinct gram set of a *benchmark* (thousands
    of documents, not the corpus), so Spark broadcasts it under AQE;
    the training side streams through map-side.  The final per-document
    count aggregates (id, gram) pairs for matched grams only — output is
    one row per train doc, and the only wide exchange is keyed by the
    gram hash.  ``hash_fn="md5"`` is the engine-portable default (DuckDB
    oracle); ``"xxhash64"`` is the cheaper Spark-native production path.
    """
    def grams(df: DataFrame, with_id: bool) -> DataFrame:
        df = _parallelize_narrow_input(df)  # the gram hash pass is CPU-bound
        g = F.explode(word_ngrams_expr(F.col(text_col), n)).alias("__gram")
        base = df.select(*( [F.col(id_col).alias("__id")] if with_id else [] ), g)
        # md5: the full 32-char hex digest (fixed width, portable, no
        # truncation collisions); xxhash64: one codegen'd long
        h = (
            F.xxhash64(F.col("__gram"))
            if hash_fn == "xxhash64"
            else F.md5(F.col("__gram"))
        )
        return base.select(*( ["__id"] if with_id else [] ), h.alias("__g"))

    bench_grams = grams(benchmark, with_id=False).distinct()
    hits = (
        grams(train, with_id=True)
        .join(bench_grams, "__g")
        .groupBy("__id")
        .agg(F.count_distinct("__g").alias("matched_ngrams"))
    )
    return (
        train.select(F.col(id_col).alias("__id"))
        .join(hits, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("matched_ngrams"), F.lit(0)).alias("matched_ngrams"),
            (F.coalesce(F.col("matched_ngrams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def paragraphs_expr(text: Column, sep: str = "\n") -> Column:
    """Non-empty trimmed paragraphs of a document, order preserved.

    ``sep`` is a LITERAL separator (regex-escaped before it reaches
    ``split`` — a '|' or '.' separator must not be parsed as a pattern,
    which would shred the text into characters).
    """
    import re as _re

    return F.filter(
        F.transform(F.split(text, _re.escape(sep)), lambda p: F.trim(p)),
        lambda p: p != "",
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    sep: str = "\n",
    broadcast_removed: bool = True,
) -> DataFrame:
    """Global paragraph-level dedup (the C4/RefinedWeb curation step):
    every repeated paragraph is removed from ALL documents except its
    first global occurrence (ordering by (doc id, position)); documents
    are rebuilt from their surviving paragraphs.

    Output: (id, text_clean, n_kept, n_removed) — one row per input
    document, paragraphs joined back with ``sep``.

    Scale shape: the first-occurrence decision runs over (hash, id, idx)
    triples ONLY — paragraph text never enters the shuffle (same narrow-
    projection pattern as ``sampling.stratified_quota``).  The decision is
    a groupBy(hash) min + join back, NOT a window over partitionBy(hash):
    paragraph frequency is the canonical skew case (one boilerplate line
    in 30% of documents would pin a window's sort to one task), and the
    aggregation's map-side partial combine collapses each partition to
    its distinct hashes before anything shuffles.  The join-back side is
    the REMOVED positions — duplicate instances only, a small fraction of
    the corpus at realistic dup rates — broadcast by default
    (``broadcast_removed``) so the document text itself never enters any
    exchange; each document's clean text is re-derived from its own
    original row with an index-membership filter.  Disable the broadcast
    for pathological dup rates where the removed set itself is
    corpus-sized (the join then shuffles by id, still ints vs text on the
    small side).
    """
    paras = paragraphs_expr(F.col(text_col), sep)
    # __h is the raw 16-byte digest (unhex) rather than the 32-char hex
    # string — same collision space (full md5), half the bytes through
    # the checkpoint and both downstream exchanges (r16, guide §2.3;
    # same change as dedup_substrings)
    narrow = df.select(
        F.col(id_col).alias("__id"), F.posexplode(paras).alias("__pos", "__p")
    ).select("__id", "__pos", F.unhex(F.md5(F.col("__p"))).alias("__h"))
    narrow = narrow.localCheckpoint(eager=True)  # reused by the agg AND the join
    firsts = narrow.groupBy("__h").agg(F.min(F.struct("__id", "__pos")).alias("__first"))
    removed = (
        narrow.join(firsts, "__h")
        .filter(
            (F.col("__first.__id") != F.col("__id"))
            | (F.col("__first.__pos") != F.col("__pos"))
        )
        .groupBy("__id")
        .agg(F.array_sort(F.collect_list("__pos")).alias("__drop"))
    )
    drop = F.coalesce(F.col("__drop"), F.array().cast("array<int>"))
    keep_paras = F.filter(
        F.col("__paras"), lambda p, i: ~F.array_contains(drop, i.cast("int"))
    )
    if broadcast_removed:
        removed = F.broadcast(removed)
    rebuilt = (
        df.join(removed, df[id_col] == removed["__id"], "left")
        .withColumn("__paras", paras)
        .select(
            F.col(id_col),
            F.array_join(keep_paras, sep).alias("text_clean"),
            (F.size("__paras") - F.coalesce(F.size("__drop"), F.lit(0)))
            .cast("int")
            .alias("n_kept"),
            F.coalesce(F.size("__drop"), F.lit(0)).cast("int").alias("n_removed"),
        )
    )
    return rebuilt


def dedup_substrings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    window: int = 40,
    stride: int = 1,
    broadcast_removed: bool = True,
) -> DataFrame:
    """Substring-level exact dedup (the Lee-et-al. "Deduplicating Training
    Data Makes Language Models Better" granularity — document > paragraph
    > substring): every character covered by a length-``window`` substring
    that already occurred earlier in the corpus is removed; the first
    global occurrence (ordering by (doc id, position)) keeps its text.

    Rabin-Karp-style design re-expressed relationally: each document
    emits its rolling windows as (hash, id, pos) triples; the
    first-occurrence decision is a groupBy(hash) min — the same
    skew-proof narrow-shuffle shape as :func:`dedup_paragraphs` (window
    text never enters a shuffle, only its hash).  Non-first occurrences
    become [pos, pos+window) spans, merged per document with a fold over
    the sorted start positions, and the cleaned text is rebuilt by
    cutting the merged spans — both pure Column expressions, zero
    Python.  ``stride > 1`` trades alignment coverage for an O(stride)
    reduction in window rows (a repeated substring is then only caught
    when its alignment hits a sampled start).

    Output: (id, text_clean, n_removed) — n_removed counts removed
    characters.  Documents shorter than ``window`` pass through
    untouched.
    """
    # the rolling-window md5 pass hashes ~|text| windows per document —
    # CPU-bound codegen that a single-file scan would pin to one core
    # (same guard as the minhash signature pass; no-op at cluster scale)
    df = _parallelize_narrow_input(df)
    text = F.col(text_col)
    n_wins = F.greatest(F.length(text) - F.lit(window) + 1, F.lit(0))
    starts = F.when(
        n_wins > 0, F.sequence(F.lit(1), n_wins, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    # r16 (guide §2.4): the first-occurrence decision is ONE window
    # min(struct) over the hash — the previous groupBy(hash) + re-join
    # shape shuffled the window rows TWICE on __h and needed the frame
    # localCheckpoint'ed (it had two consumers); the window form has one
    # consumer, one __h exchange, and no materialization, so the md5
    # pass streams straight into the shuffle.  __h is the raw 16-byte
    # digest (unhex) rather than the 32-char hex string — same
    # collision space (full md5), half the exchange bytes (§2.3).
    narrow = df.select(
        F.col(id_col).alias("__id"), F.explode(starts).alias("__pos"), text.alias("__t")
    ).select(
        "__id",
        "__pos",
        F.unhex(
            F.md5(F.col("__t").substr(F.col("__pos"), F.lit(window)))
        ).alias("__h"),
    )
    wh = Window.partitionBy("__h")
    removed = (
        narrow.withColumn("__first", F.min(F.struct("__id", "__pos")).over(wh))
        .filter(
            (F.col("__first.__id") != F.col("__id"))
            | (F.col("__first.__pos") != F.col("__pos"))
        )
        .groupBy("__id")
        .agg(F.array_sort(F.collect_list("__pos")).alias("__starts"))
    )
    if broadcast_removed:
        removed = F.broadcast(removed)

    # merge sorted starts into disjoint spans, then cut them out —
    # evaluated only on documents that HAVE removals (inner-join side)
    empty_spans = F.expr("CAST(array() AS array<struct<s: int, e: int>>)")
    spans = F.aggregate(
        F.col("__starts"),
        empty_spans,
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        (p + F.lit(window)).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(p.alias("s"), (p + F.lit(window)).alias("e"))))
        ),
    )
    cut = F.aggregate(
        F.col("__spans"),
        F.struct(F.lit(1).alias("cur"), F.lit("").alias("out")),
        lambda acc, sp: F.struct(
            sp["e"].alias("cur"),
            F.concat(acc["out"], text.substr(acc["cur"], sp["s"] - acc["cur"])).alias(
                "out"
            ),
        ),
        lambda acc: F.concat(
            acc["out"], text.substr(acc["cur"], F.length(text) - acc["cur"] + 1)
        ),
    )
    return (
        df.join(removed, df[id_col] == removed["__id"], "left")
        .withColumn("__spans", spans)
        .withColumn(
            "text_clean", F.when(F.col("__spans").isNull(), text).otherwise(cut)
        )
        .select(
            F.col(id_col),
            "text_clean",
            (F.length(text) - F.length("text_clean")).cast("int").alias("n_removed"),
        )
    )
