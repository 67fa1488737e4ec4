"""Pure-Python byte-level BPE — the exact tokenizer the token-budget
samplers were missing in this environment (VERDICT r08 task #6).

Algorithm: byte-level BPE exactly as published — Sennrich et al. 2016
(subword NMT) for the merge loop, Radford et al. 2019 (GPT-2) for the
byte-to-unicode alphabet and pre-tokenizer shape.  Nothing here needs a
third-party tokenizer package:

- :func:`bytes_to_unicode` — GPT-2's reversible byte→printable-unicode
  alphabet (the 188 printable latin-1 bytes map to themselves, the rest
  shift into U+0100..), so merges operate on strings, never raw bytes;
- :func:`pretokenize` — GPT-2-shaped piece splitter (contraction
  suffixes, space-prefixed letter/digit/symbol runs, trailing
  whitespace), stdlib ``re`` only;
- :func:`train_bpe_merges` — the classic merge loop over a WORD
  FREQUENCY table (training never needs the corpus itself, only the
  word histogram — Sennrich et al.'s key property);
- :func:`train_bpe` — Spark does the one corpus-sized step (pretoken
  histogram via mapInPandas + groupBy), the driver trains on the
  bounded top-``max_words`` histogram: 100 TB in, ``max_words`` rows
  collected, merges out;
- :class:`BpeEncoder` — encode/decode with an LRU per-word cache; the
  merges table is plain data (a list of string pairs), broadcast to
  executors inside UDF closures.

A frozen default vocabulary (trained on the deterministic testdata
corpus; see ``bpe_default_vocab.py``) backs
``ops.text.exact_token_counts`` when no encoder is injected, so exact
token budgets work out of the box — reference analog: the reference
has no tokenizer at all; this is part of the training-data-pipeline
surface SURVEY §2.11 adds on top.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache

__all__ = [
    "bytes_to_unicode",
    "pretokenize",
    "train_bpe_merges",
    "train_bpe",
    "BpeEncoder",
    "default_encoder",
]


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte -> unicode-char table: printable bytes
    keep their own codepoint, the 68 others (controls, space, DEL, a
    latin-1 gap) shift to U+0100+i so every byte is a visible,
    non-space character and merged symbols stay valid dict keys."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_BYTE_TO_CHAR = bytes_to_unicode()
_CHAR_TO_BYTE = {c: b for b, c in _BYTE_TO_CHAR.items()}

# GPT-2-shaped pre-tokenizer in stdlib `re`: [^\W\d_] is the unicode
# letter class, (?:[^\s\w]|_) the symbol class (underscore is \w but
# not a letter/number, so it belongs with symbols, as \p{L}/\p{N}
# exclusion would put it)
_PRETOKEN_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[^\W\d_]+"
    r"| ?\d+"
    r"| ?(?:[^\s\w]|_)+"
    r"|\s+(?!\S)"
    r"|\s+"
)


def pretokenize(text: str) -> list[str]:
    """Split text into BPE pre-tokens (merges never cross these)."""
    return _PRETOKEN_RE.findall(text)


def _word_symbols(word: str) -> tuple[str, ...]:
    """Pre-token -> initial symbol sequence (one mapped char per byte)."""
    return tuple(_BYTE_TO_CHAR[b] for b in word.encode("utf-8"))


def train_bpe_merges(
    word_counts: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """The Sennrich merge loop over a word-frequency histogram: repeat
    ``num_merges`` times — count adjacent symbol pairs weighted by word
    frequency, merge the most frequent pair everywhere (ties break
    lexicographically for determinism across runs/engines)."""
    words: list[tuple[list[str], int]] = [
        (list(_word_symbols(w)), c) for w, c in word_counts.items() if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for syms, _c in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def train_bpe(
    df,
    text_col: str,
    *,
    num_merges: int = 512,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Train a BPE merges table from a corpus DataFrame.

    Spark runs the only corpus-sized step — pretoken histogram
    (mapInPandas pretokenizer, then one groupBy(word) count) — and the
    driver collects the top ``max_words`` rows (BOUNDED: scale the
    corpus 1000×, the collect stays max_words) to run the merge loop.
    Deterministic: the histogram is exact, ties in both the top-k cut
    and the merge loop break lexicographically."""
    from pyspark.sql import functions as F

    def split(batches):
        import pandas as pd

        for pdf in batches:
            out = Counter()
            for t in pdf[text_col]:
                if t:
                    out.update(pretokenize(t))
            yield pd.DataFrame(
                {"word": list(out.keys()), "n": list(out.values())}
            )

    hist = (
        df.select(text_col)
        .mapInPandas(split, "word string, n long")
        .groupBy("word")
        .agg(F.sum("n").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return train_bpe_merges({r["word"]: r["n"] for r in hist}, num_merges)


class BpeEncoder:
    """Byte-level BPE encoder over a merges table (plain data — ship it
    to executors in a UDF closure; it broadcasts with the task).

    Token ids: 0..255 are the byte alphabet (in ``bytes_to_unicode``
    order), 256+i is merge i — the standard ranking for a trained-from-
    scratch vocabulary.  ``encode`` caches per pre-token (Zipf makes
    the hit rate very high), so throughput is dominated by the
    pretokenizer regex, not the merge loop."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}
        vocab = [c for _b, c in sorted(_BYTE_TO_CHAR.items())]
        self.token_ids = {s: i for i, s in enumerate(vocab)}
        for a, b in self.merges:
            self.token_ids[a + b] = len(self.token_ids)
        self._encode_word = lru_cache(maxsize=65536)(self._encode_word_raw)

    def _encode_word_raw(self, word: str) -> tuple[int, ...]:
        syms = list(_word_symbols(word))
        while len(syms) > 1:
            ranked = [
                (self.ranks.get((syms[i], syms[i + 1])), i)
                for i in range(len(syms) - 1)
            ]
            ranked = [(r, i) for r, i in ranked if r is not None]
            if not ranked:
                break
            _r, i = min(ranked)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        return tuple(self.token_ids[s] for s in syms)

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for w in pretokenize(text):
            out.extend(self._encode_word(w))
        return out

    def decode(self, ids: list[int]) -> str:
        by_id = {i: s for s, i in self.token_ids.items()}
        data = bytes(
            _CHAR_TO_BYTE[c] for i in ids for c in by_id[i]
        )
        return data.decode("utf-8", "replace")


_DEFAULT: BpeEncoder | None = None


def default_encoder() -> BpeEncoder:
    """The frozen in-tree vocabulary (see ``bpe_default_vocab.py``) —
    what ``exact_token_counts`` uses when nothing is injected."""
    global _DEFAULT
    if _DEFAULT is None:
        from outpost_spark.ops.bpe_default_vocab import DEFAULT_MERGES

        _DEFAULT = BpeEncoder(DEFAULT_MERGES)
    return _DEFAULT
