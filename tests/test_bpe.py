"""BPE tokenizer training, encoding, and the exact round-trip law."""

from collections import Counter

from pyspark.sql import functions as F

from iceberg_python_spark.operators.bpe import (
    _EOW,
    _encode_word,
    bpe_decode_col,
    bpe_encode,
    bpe_train,
    word_histogram,
)

CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest widest widest"),
    (3, "the newest of the new, the widest of the wide"),
    (4, ""),
    (5, "  spaced   out\ttabs\nand newlines  "),
]


def test_word_histogram_and_cap(spark):
    df = spark.createDataFrame(CORPUS, "doc_id: long, text: string")
    hist = {r["word"]: r["freq"] for r in word_histogram(df, "text").collect()}
    ref = Counter()
    for _, t in CORPUS:
        ref.update(x for x in t.split() if x)
    assert hist == dict(ref)
    # deterministic (freq DESC, word ASC) cap
    top2 = [r["word"] for r in word_histogram(df, "text", max_words=2).collect()]
    expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert sorted(top2) == sorted(w for w, _ in expect)


def test_train_learns_frequent_pairs_deterministically(spark):
    """The classic Sennrich toy corpus: the first merges assemble the
    high-frequency word suffixes, and two runs give the identical
    sequence."""
    df = spark.createDataFrame(CORPUS, "doc_id: long, text: string")
    m1 = bpe_train(df, "text", n_merges=12, min_freq=1)
    m2 = bpe_train(df, "text", n_merges=12, min_freq=1)
    assert m1 == m2 and len(m1) == 12
    joined = {a + b for a, b in m1}
    # 'newest' appears 7x — its pieces must be among the learned merges
    assert any(s.startswith("ne") or s.endswith("est" + _EOW) or "est" in s for s in joined)


def test_encode_decode_roundtrip_exact(spark):
    """decode(encode(x)) == whitespace-normalized x for EVERY doc —
    the law the oracle row value-hashes. Holds for any merge list by
    construction (merges only concatenate)."""
    df = spark.createDataFrame(CORPUS, "doc_id: long, text: string")
    merges = bpe_train(df, "text", n_merges=8, min_freq=1)
    enc = bpe_encode(df, "text", merges, "doc_id")
    got = {
        r["doc_id"]: r["d"]
        for r in enc.select("doc_id", bpe_decode_col("tokens").alias("d")).collect()
    }
    for d, t in CORPUS:
        assert got[d] == " ".join(t.split()), d


def test_encode_compresses_and_bounds(spark):
    """n_tokens is positive for non-empty docs, bounded above by the
    base symbol count (chars + one EOW per word), and strictly below
    it once merges exist (every learned merge that fires saves one
    symbol)."""
    df = spark.createDataFrame(CORPUS, "doc_id: long, text: string")
    merges = bpe_train(df, "text", n_merges=15, min_freq=1)
    enc = bpe_encode(df, "text", merges, "doc_id")
    base = df.select(
        "doc_id",
        (
            F.length(F.regexp_replace("text", r"\s", ""))
            + F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != ""))
        ).alias("n_base"),
    )
    rows = enc.join(base, "doc_id").collect()
    total_tok = total_base = 0
    for r in rows:
        assert r["n_tokens"] <= r["n_base"]
        total_tok += r["n_tokens"]
        total_base += r["n_base"]
    assert total_tok < total_base


def test_encode_word_greedy_rank_order():
    """Lowest-rank merge fires first — 'ab' before 'bc' when ranked
    earlier, changing the segmentation deterministically."""
    assert _encode_word("abc", {("a", "b"): 0, ("b", "c"): 1}) == ["ab", "c", _EOW]
    assert _encode_word("abc", {("b", "c"): 0, ("a", "b"): 1}) == ["a", "bc", _EOW]
    assert _encode_word("x", {}) == ["x", _EOW]


def test_bpe_monster_words_bounded_and_exact(spark):
    """A single unbroken 50 KB token (base64 blob / minified JS — real
    crawl content) must encode in bounded time via cap-sized chunking
    and still round-trip EXACTLY (only the final chunk carries the
    end-of-word marker). Monster tokens are excluded from merge
    learning but never from encoding."""
    import time

    from iceberg_python_spark.operators.bpe import (
        _MAX_WORD_CHARS,
        _encode_word,
        bpe_decode_col,
        bpe_encode,
        bpe_train,
        word_histogram,
    )

    monster = "ab" * 25_000  # 50k chars, no whitespace
    docs = spark.createDataFrame(
        [(0, f"the quick fox {monster} jumps"), (1, "the quick fox jumps")],
        "doc_id: long, text: string",
    )
    merges = bpe_train(docs, "text", n_merges=30)
    # training histogram never saw the monster
    words = {r["word"] for r in word_histogram(docs, "text").collect()}
    assert monster not in words and "quick" in words
    t0 = time.time()
    toks = _encode_word(monster, {tuple(m): i for i, m in enumerate(merges)})
    assert time.time() - t0 < 5.0  # O(len * cap), not O(len^2)
    assert sum(len(t.replace("</w>", "")) for t in toks) == len(monster)
    # full-path exact round trip through Spark
    enc = bpe_encode(docs, "text", merges, "doc_id")
    dec = enc.select("doc_id", bpe_decode_col("tokens").alias("decoded"))
    got = {r["doc_id"]: r["decoded"] for r in dec.collect()}
    assert got[0] == f"the quick fox {monster} jumps"
    assert got[1] == "the quick fox jumps"
    assert _MAX_WORD_CHARS < 50_000
