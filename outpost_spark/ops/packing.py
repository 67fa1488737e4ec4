"""Sequence packing: fill fixed-length training sequences with documents.

LLM pretraining consumes fixed-size token windows; feeding one (short)
document per sequence wastes the padding remainder, so pipelines PACK
multiple documents into each sequence (first-fit-decreasing bin packing
— the shape used by T5/GPT-style "example packing").  Exact FFD is
inherently sequential; the distributed form here:

1. documents hash-partition into ``n_groups`` independent packing
   groups (deterministic ``pmod(xxhash64(id), n_groups)`` — at corpus
   scale each group still holds millions of documents, and packing
   quality is a per-group property, so partitioning costs ~nothing);
2. each group packs with first-fit-decreasing inside one
   ``applyInPandas`` call: sort by (length desc, id), drop each doc into
   the first open bin with room (binary-search bisect over a sorted
   remaining-capacity list keeps a group's packing O(n log n));
3. output is one row per document: (group, bin, doc id, length), with
   ``pack_id = group * 2^32 + bin`` globally unique.

Documents LONGER than ``max_len`` are routed to the companion
:func:`outpost_spark.ops.text.chunk_documents` in a real pipeline;
here they raise by default (``oversize="error"``) or each take a
dedicated bin (``oversize="own_bin"``), never silently truncate.

Packing efficiency: FFD guarantees <= (11/9 OPT + 6/9) bins; the tests
pin exact packs on crafted inputs and a >=90 % fill ratio on realistic
length distributions.  Determinism: ties order by id, groups are
hash-stable, so the same corpus packs identically on every run/cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    *,
    max_len: int = 2048,
    n_groups: int = 64,
    oversize: str = "error",
) -> DataFrame:
    """Assign every document to a packed sequence.

    Output: (``id_col``, ``pack_id`` long, ``pack_group`` int,
    ``seq_len`` = the doc's length as packed).  Aggregate by ``pack_id``
    downstream to materialize sequences (ids in a pack, fill ratio).
    """
    if oversize not in ("error", "own_bin"):
        raise ValueError(f"oversize must be 'error' or 'own_bin', got {oversize!r}")

    def pack_group(pdf):
        import bisect

        import pandas as pd

        pdf = pdf.sort_values(["__len", "__id"], ascending=[False, True])
        # bins: sorted list of (remaining_capacity, bin_no) for bisect
        remaining: list = []  # sorted by remaining capacity
        assignment = []
        next_bin = 0
        for doc_id, length in zip(pdf["__id"], pdf["__len"]):
            length = int(length)
            if length > max_len:
                if oversize == "error":
                    raise ValueError(
                        f"document {doc_id} length {length} exceeds max_len "
                        f"{max_len} — chunk it first (ops.text.chunk_documents)"
                    )
                assignment.append((doc_id, length, next_bin))
                next_bin += 1
                continue
            # first(-fit by capacity) bin with room: smallest remaining
            # capacity >= length keeps bins tight (best-fit decreasing —
            # same FFD bound, better constants)
            i = bisect.bisect_left(remaining, (length, -1))
            if i < len(remaining):
                cap, bin_no = remaining.pop(i)
                cap -= length
                if cap > 0:
                    bisect.insort(remaining, (cap, bin_no))
            else:
                bin_no = next_bin
                next_bin += 1
                cap = max_len - length
                if cap > 0:
                    bisect.insort(remaining, (cap, bin_no))
            assignment.append((doc_id, length, bin_no))
        group = int(pdf["__grp"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                "__id": [a[0] for a in assignment],
                "seq_len": [a[1] for a in assignment],
                "pack_group": group,
                "pack_id": [(group << 32) | a[2] for a in assignment],
            }
        )

    src = df.select(
        F.col(id_col).alias("__id"),
        F.col(len_col).cast("long").alias("__len"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)).cast("int").alias("__grp"),
    )
    # id type flows through from the input schema (string/long/... ids all
    # work — same pattern as minhash_grams_and_signature_numpy)
    id_type = df.schema[id_col].dataType.simpleString()
    out = src.groupBy("__grp").applyInPandas(
        pack_group, f"__id {id_type}, seq_len long, pack_group int, pack_id long"
    )
    return out.select(
        F.col("__id").alias(id_col), "pack_id", "pack_group", "seq_len"
    )


def pack_stats(packed: DataFrame, *, max_len: int) -> DataFrame:
    """Per-pack fill statistics: (pack_id, n_docs, used, fill_ratio)."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("seq_len").alias("used"),
        F.round(F.sum("seq_len") / F.lit(float(max_len)), 6).alias("fill_ratio"),
    )
