"""BPE tokenizer training, encoding, and the exact round-trip law."""

from collections import Counter

import pytest

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


def test_bytes_to_unicode_bijection():
    from iceberg_python_spark.operators.bpe import _B2U, _U2B

    assert len(_B2U) == 256 and len(_U2B) == 256
    assert all(_U2B[_B2U[b]] == b for b in range(256))


def test_byte_bpe_exact_roundtrip_cjk_emoji_marker(spark):
    """Byte-level BPE round-trips ANY text exactly — CJK without
    spaces, emoji, the literal '</w>' marker string (char-BPE's
    documented ambiguity), and leading/trailing whitespace."""
    from iceberg_python_spark.operators.bpe import (
        bpe_encode_bytes,
        bpe_train_bytes,
    )

    texts = [
        "数据湖表格式快照隔离数据湖表格式",  # no-space CJK, repeated units
        "emoji 🧪🧪 and </w> literal markers </w>",
        "  leading and trailing whitespace  ",
        "mixed 中文 and english tokens 中文",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train_bytes(df, "text", n_merges=50)
    assert merges  # CJK corpus learns a NON-degenerate vocabulary
    out = {
        r["doc_id"]: r
        for r in bpe_encode_bytes(df, "text", merges, "doc_id", emit_decoded=True).collect()
    }
    for i, t in enumerate(texts):
        assert out[i]["decoded"] == t, i  # exact — not whitespace-normalized
        assert out[i]["n_tokens"] <= len(t.encode("utf-8"))
    # the repeated CJK doc genuinely compresses below its byte count
    assert out[0]["n_tokens"] < len(texts[0].encode("utf-8"))


def test_byte_bpe_deterministic_merges(spark):
    from iceberg_python_spark.operators.bpe import bpe_train_bytes

    df = spark.createDataFrame(
        [(i, "低频词汇表学习低频词汇表学习 abc abc") for i in range(6)],
        "doc_id long, text string",
    )
    m1 = bpe_train_bytes(df, "text", n_merges=20)
    m2 = bpe_train_bytes(df, "text", n_merges=20)
    assert m1 == m2 and len(m1) == 20


def test_char_bpe_coverage_warning_on_cjk(spark):
    """VERDICT r12 #8: min_freq pruning on a no-space corpus drops
    ~all occurrence mass — the char trainer must WARN instead of
    silently learning a useless vocabulary; the byte trainer at its
    min_freq=1 default must not warn."""
    import warnings

    from iceberg_python_spark.operators.bpe import bpe_train, bpe_train_bytes

    rows = [(i, f"句子{i}每行都不相同所以每个词频率为一") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.warns(UserWarning, match="covers only"):
        bpe_train(df, "text", n_merges=5, min_freq=2)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        merges = bpe_train_bytes(df, "text", n_merges=5)
    assert merges


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(max_size=300), st.booleans())
@settings(max_examples=120, deadline=None)
def test_byte_bpe_pure_roundtrip_property(text, with_merges):
    """decode(encode(x)) == x for ARBITRARY unicode text — with and
    without learned merges — exercising the pre-tokenizer, the
    byte↔unicode bijection, and the greedy merge scan without Spark."""
    from iceberg_python_spark.operators.bpe import (
        _encode_piece,
        _pretoken_units,
        bpe_decode_bytes,
    )

    ranks = {}
    if with_merges:
        # learn a tiny rank table from the text's own frequent pairs
        units = _pretoken_units(text)
        pairs = {}
        for u in units:
            for a, b in zip(u, u[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
        for i, (p, _) in enumerate(sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:8]):
            ranks[p] = i
    toks = []
    for u in _pretoken_units(text):
        toks.extend(_encode_piece(u, ranks, eow=False))
    assert bpe_decode_bytes(toks) == text
