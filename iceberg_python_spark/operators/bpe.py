"""Byte-pair-encoding tokenizer training and corpus encoding.

The missing member of the tokenizer-adjacent family (token_stats
counts whitespace/BPE-ish regex tokens; pack_sequences packs them):
actually LEARN a subword vocabulary from the corpus and encode with
it — the step every LLM data pipeline runs between curation and
packing.

Spark shape (100 TB), following the published scalable design
(Sennrich et al., ACL 2016 — BPE is trained on the WORD HISTOGRAM,
not the raw token stream):

- **The corpus-wide work is one word-frequency groupBy** (explode of
  whitespace tokens). The histogram is then pruned by ``min_freq``
  and capped at ``max_words`` DETERMINISTICALLY (freq DESC, word ASC)
  — at web scale the distinct-word tail is unbounded (URLs, typos);
  the cap is the honest, documented driver-memory bound, the same
  size-guarded-collect contract the planner uses elsewhere.
- **Merge learning runs over the bounded histogram** on the driver:
  classic greedy BPE (argmax pair count, ties broken (count DESC,
  pair ASC) so the merge sequence is fully deterministic). Cost is
  O(n_merges · words-containing-pair), independent of corpus size —
  every token of the 100 TB corpus is represented by its word's one
  histogram row.
- **Encoding never collects**: merge ranks broadcast to executors and
  each document encodes inside Arrow-batched ``mapInPandas``
  (per-word memoized), the same per-payload-unit floor as the codec
  family.

Words carry an end-of-word marker (``</w>``), so decoding is
``concat(tokens) with </w> → space`` and round-trips EXACTLY to the
whitespace-normalized document — the property the oracle row
value-hashes per doc against ANSI SQL.

No reference counterpart (published-recipe operator).
"""

from __future__ import annotations

import re
from typing import Iterator, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_EOW = "</w>"

# ASCII whitespace, matching Java's and RE2's default \s — Python's
# str.split() would also split on Unicode whitespace (U+00A0 …) and
# silently diverge from the JVM histogram / SQL oracle on exotic docs
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def word_histogram(
    df: DataFrame, text_col: str, min_freq: int = 1, max_words: int | None = None
) -> DataFrame:
    """(word, freq) over whitespace-split text — the single corpus-wide
    shuffle of the BPE stack. ``max_words`` keeps the strongest rows by
    (freq DESC, word ASC): deterministic, and a hard bound on what a
    driver collect downstream can cost."""
    # monster tokens (unbroken base64/minified-JS runs) are excluded
    # from MERGE LEARNING — they aren't vocabulary, and one such row
    # would dominate the driver-side pair scans; encoding still
    # handles them by cap-sized chunking (_encode_word)
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"),
        lambda t: (t != "") & (F.length(t) <= _MAX_WORD_CHARS),
    )
    hist = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= min_freq)
    )
    if max_words is not None:
        hist = hist.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(max_words)
    return hist


def _pairs(seq: Tuple[str, ...]):
    return zip(seq, seq[1:])


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_freq: int = 2,
    max_words: int = 1_000_000,
) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` merge rules from the corpus. Returns the
    ordered merge list (rank = position). Deterministic: pair argmax
    ties break (count DESC, pair ASC)."""
    hist = word_histogram(df, text_col, min_freq=1, max_words=None).localCheckpoint(
        eager=True
    )
    total = hist.agg(F.sum(F.col("freq") * F.length("word")).alias("m")).collect()[0]["m"] or 0
    kept = hist.where(F.col("freq") >= min_freq)
    rows = kept.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(max_words).collect()
    kept_mass = sum(int(r["freq"]) * len(r["word"]) for r in rows)
    # coverage warning (VERDICT r12 #8): min_freq pruning on a
    # no-space/CJK corpus silently drops ~all the mass — say so loudly
    _warn_low_coverage(kept_mass, int(total), "bpe_train")
    # word → symbol sequence (chars + end-of-word marker)
    vocab = {tuple(list(r["word"]) + [_EOW]): int(r["freq"]) for r in rows}
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict = {}
        for seq, freq in vocab.items():
            for p in _pairs(seq):
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab = {}
        for seq, freq in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == best[0] and seq[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


# greedy merge scanning is O(len^2) per word — unbounded on the
# unbroken monster tokens real crawls contain (base64 blobs, minified
# JS, DNA strings: a single 100 KB "word" would be ~10^10 operations
# in one executor thread). Words above the cap encode in cap-sized
# pieces — only the LAST piece carries the end-of-word marker, so
# decode (concat + marker→space) still round-trips EXACTLY — the same
# practical bound GPT-2's regex pre-split and SentencePiece's
# max-piece-length impose.
_MAX_WORD_CHARS = 512


def _encode_piece(piece: str, ranks: dict, eow: bool) -> List[str]:
    seq: List[str] = list(piece) + ([_EOW] if eow else [])
    while len(seq) > 1:
        best_rank, best_i = None, None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def _encode_word(word: str, ranks: dict) -> List[str]:
    if len(word) <= _MAX_WORD_CHARS:
        return _encode_piece(word, ranks, eow=True)
    out: List[str] = []
    for i in range(0, len(word), _MAX_WORD_CHARS):
        piece = word[i : i + _MAX_WORD_CHARS]
        out.extend(_encode_piece(piece, ranks, eow=i + _MAX_WORD_CHARS >= len(word)))
    return out


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: Sequence[Tuple[str, str]],
    id_col: str,
) -> DataFrame:
    """Encode each document: ``(id, tokens array<string>, n_tokens)``.
    Merge ranks broadcast once; encoding runs in Arrow-batched
    ``mapInPandas`` with a per-batch word memo (Zipf makes the memo hit
    rate high). Decode is ``concat + </w>→space``; round-trips to the
    whitespace-normalized text exactly."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    spark = df.sparkSession
    b_ranks = spark.sparkContext.broadcast(ranks)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        rk = b_ranks.value
        for pdf in batches:
            toks_out, n_out = [], []
            for text in pdf[text_col]:
                toks: List[str] = []
                for w in (x for x in _WS_RE.split(text or "") if x):
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word(w, rk)
                    toks.extend(got)
                toks_out.append(toks)
                n_out.append(len(toks))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "tokens": toks_out, "n_tokens": n_out}
            )

    schema = f"{df.select(id_col).schema[id_col].dataType.simpleString()}"
    return df.select(id_col, text_col).mapInPandas(
        enc, schema=f"{id_col} {schema}, tokens array<string>, n_tokens long"
    )


def bpe_decode_col(tokens_col: str):
    """JVM-side decode expression: concat the token array and turn
    end-of-word markers back into single spaces (trailing one
    trimmed). A document containing the literal marker string would
    round-trip it as a space — the classic char-BPE marker ambiguity;
    byte-level vocabularies escape it, this implementation documents
    it."""
    return F.trim(F.regexp_replace(F.array_join(F.col(tokens_col), ""), _EOW, " "))


# ---------------------------------------------------------------------------
# byte-level BPE (GPT-2 shape): base vocabulary = 256 bytes, so ANY
# text round-trips exactly — no end-of-word marker (and therefore no
# marker-literal ambiguity), no whitespace-split degeneracy on CJK /
# no-space corpora. Published recipe: Radford et al. 2019 (GPT-2),
# bytes_to_unicode + regex pre-tokenization + greedy rank merges.
# ---------------------------------------------------------------------------

# GPT-2-ish pre-tokenizer: letter runs, digit runs, underscore runs,
# symbol runs, whitespace runs — each with an optional leading space
# folded in, so spaces are PART of the pre-token (no marker needed).
# Python `re` lacks \p{L}; [^\W\d_] is the unicode-letter class. This
# SAME compiled regex runs in the histogram build and in the encoder
# (both Arrow-batched Python), so the two can never diverge — the
# reason the byte histogram does not use a JVM regexp_extract_all.
_BYTE_PRETOK_RE = re.compile(r" ?[^\W\d_]+| ?\d+| ?_+| ?[^\s\w]+|\s+")


def _bytes_to_unicode() -> dict:
    """The GPT-2 byte↔printable-unicode bijection: printable latin-1
    ranges map to themselves, the rest shift to U+0100+i — merges then
    operate on ordinary 1-char strings and never collide with real
    whitespace/control bytes."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_B2U = _bytes_to_unicode()
_U2B = {v: k for k, v in _B2U.items()}


def _pretoken_units(text: str) -> List[str]:
    """Pre-tokens of ``text`` in byte-unicode space (each unit ≤ the
    monster-run cap; oversize runs chunk like _encode_word)."""
    out: List[str] = []
    for m in _BYTE_PRETOK_RE.finditer(text):
        u = "".join(_B2U[b] for b in m.group(0).encode("utf-8"))
        if len(u) <= _MAX_WORD_CHARS:
            out.append(u)
        else:
            out.extend(u[i : i + _MAX_WORD_CHARS] for i in range(0, len(u), _MAX_WORD_CHARS))
    return out


def byte_unit_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(unit, freq) over byte-level pre-tokens — the byte-mode
    counterpart of :func:`word_histogram`. Runs in Arrow-batched
    ``mapInPandas`` + one groupBy: the pre-tokenizer must be the SAME
    compiled regex the encoder uses, so the split happens Python-side
    by design (one corpus pass either way)."""

    def units(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts: dict = {}
            for text in pdf[text_col]:
                for u in _pretoken_units(text or ""):
                    counts[u] = counts.get(u, 0) + 1
            if counts:
                yield pd.DataFrame(
                    {"unit": list(counts.keys()), "freq": list(counts.values())}
                )

    partial = df.select(text_col).mapInPandas(units, schema="unit string, freq long")
    return partial.groupBy("unit").agg(F.sum("freq").alias("freq"))


def _warn_low_coverage(kept_mass: int, total_mass: int, where: str) -> float:
    cov = kept_mass / total_mass if total_mass else 1.0
    if total_mass and cov < 0.5:
        import warnings

        warnings.warn(
            f"{where}: the pruned histogram covers only {cov:.1%} of corpus "
            "token occurrences - the learned vocabulary will be degenerate "
            "(typical cause: min_freq pruning on a no-space/CJK corpus; "
            "lower min_freq or use the byte-level trainer with min_freq=1)",
            stacklevel=3,
        )
    return cov


def bpe_train_bytes(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_freq: int = 1,
    max_words: int = 1_000_000,
) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` byte-level merge rules. Same driver-side
    greedy loop as :func:`bpe_train` (pair argmax, ties (count DESC,
    pair ASC)), but over the byte-unicode alphabet with NO end-of-word
    marker — the 256-byte base vocabulary makes every input encodable
    and every encoding exactly byte-reversible. ``min_freq`` defaults
    to 1: pair counts aggregate ACROSS histogram rows, so freq-1 units
    (every "word" of a no-space corpus) still teach frequent pairs —
    pruning them is what made the char-level trainer degenerate on
    CJK. A coverage warning fires if pruning drops >50% of the
    occurrence mass."""
    hist = byte_unit_histogram(df, text_col).localCheckpoint(eager=True)
    total = hist.agg(F.sum(F.col("freq") * F.length("unit")).alias("m")).collect()[0]["m"] or 0
    kept = hist.where(F.col("freq") >= min_freq)
    kept = kept.orderBy(F.col("freq").desc(), F.col("unit").asc()).limit(max_words)
    rows = kept.collect()
    kept_mass = sum(int(r["freq"]) * len(r["unit"]) for r in rows)
    _warn_low_coverage(kept_mass, int(total), "bpe_train_bytes")
    vocab = {tuple(r["unit"]): int(r["freq"]) for r in rows}
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict = {}
        for seq, freq in vocab.items():
            for p in _pairs(seq):
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab = {}
        for seq, freq in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == best[0] and seq[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def bpe_decode_bytes(tokens: Sequence[str]) -> str:
    """Inverse of the byte-level encoding: concat tokens, map each
    byte-unicode char back to its byte, UTF-8 decode. Exact for any
    input text — including literal '</w>' (no marker exists here)."""
    bs = bytes(_U2B[c] for c in "".join(tokens))
    return bs.decode("utf-8")


def bpe_encode_bytes(
    df: DataFrame,
    text_col: str,
    merges: Sequence[Tuple[str, str]],
    id_col: str,
    emit_decoded: bool = False,
) -> DataFrame:
    """Byte-level encode: ``(id, tokens array<string>, n_tokens[,
    decoded])``. Tokens live in byte-unicode space (GPT-2 wire form);
    ``emit_decoded=True`` adds the exact round-tripped text column for
    verification rows. Merge ranks broadcast once; Arrow-batched
    ``mapInPandas`` with a per-batch unit memo."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    spark = df.sparkSession
    b_ranks = spark.sparkContext.broadcast(ranks)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        rk = b_ranks.value
        for pdf in batches:
            toks_out, n_out, dec_out = [], [], []
            for text in pdf[text_col]:
                toks: List[str] = []
                for u in _pretoken_units(text or ""):
                    got = memo.get(u)
                    if got is None:
                        got = memo[u] = _encode_piece(u, rk, eow=False)
                    toks.extend(got)
                toks_out.append(toks)
                n_out.append(len(toks))
                if emit_decoded:
                    dec_out.append(bpe_decode_bytes(toks))
            out = {id_col: pdf[id_col], "tokens": toks_out, "n_tokens": n_out}
            if emit_decoded:
                out["decoded"] = dec_out
            yield pd.DataFrame(out)

    id_t = df.select(id_col).schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_t}, tokens array<string>, n_tokens long"
    if emit_decoded:
        schema += ", decoded string"
    return df.select(id_col, text_col).mapInPandas(enc, schema=schema)
