"""Text analysis operators for training-data pipelines.

All pure ``pyspark.sql.functions`` (JVM-side, codegen) — narrow
projections with no shuffle, so they stream at scan speed at any scale.

- token_stats    — whitespace + BPE-ish regex token counts, char stats
- quality_score  — length/punctuation/stopword/repetition heuristics
- language_id    — stopword-hit n-gram heuristic over a small built-in
                   lexicon (en/fr/de/es) + CJK character ratio (zh)
- fingerprint    — md5 content digest + 64-bit rolling-hash winnowing set
- ngram_doc_freq_topk — corpus top-k n-grams by document frequency
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import DataFrame, functions as F

_WS = r"\s+"
# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbol
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
    "es": ["el", "la", "los", "las", "de", "y", "un", "una", "es", "que"],
}


def _ws_tokens(col):
    return F.split(F.trim(col), _WS)


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_chars, n_ws_tokens, n_bpe_tokens, avg_token_len)."""
    t = F.col(text_col)
    ws = _ws_tokens(t)
    # escape backslashes: the pattern goes through a SQL string literal
    bpe = F.expr(f"regexp_extract_all({text_col}, '{BPE_TOKEN_RE.replace(chr(92), chr(92) * 2)}', 0)")
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(ws)).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.round(
            F.when(F.size(ws) > 0, F.length(F.trim(t)) / F.size(ws)).otherwise(F.lit(0.0)), 4
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality features + composite score in [0,1]:
    punctuation ratio, uppercase ratio, stopword ratio, distinct-token
    ratio (repetition), mean word length band."""
    t = F.col(text_col)
    n = F.greatest(F.length(t), F.lit(1))
    toks = _ws_tokens(F.lower(t))
    n_toks = F.greatest(F.size(toks), F.lit(1))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]-]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_toks
    out = df.select(
        F.col(id_col),
        F.round(punct / n, 4).alias("punct_ratio"),
        F.round(upper / n, 4).alias("upper_ratio"),
        F.round(stop_hits / F.lit(10.0), 4).alias("stopword_cov"),
        F.round(distinct_ratio, 4).alias("distinct_token_ratio"),
    )
    score = (
        F.lit(1.0)
        - F.least(F.col("punct_ratio") * 2, F.lit(0.5))
        - F.least(F.col("upper_ratio"), F.lit(0.25))
    ) * (F.lit(0.5) + F.col("distinct_token_ratio") / 2)
    # floor-truncate instead of round: engines disagree on .5 ties
    # (Spark HALF_UP vs DuckDB half-even), floor is unambiguous
    quality = F.floor(F.greatest(score, F.lit(0.0)) * 10000) / 10000
    return out.withColumn("quality", quality)


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-hit language guess over {en,fr,de,es} plus a CJK-ratio
    test for zh. Deterministic argmax with fixed language order."""
    toks = _ws_tokens(F.lower(F.col(text_col)))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
    cjk_ratio = cjk / F.greatest(F.length(F.col(text_col)), F.lit(1))
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in ("en", "fr", "de", "es"):  # fixed priority on ties
        cond = hits[lang] > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, hits[lang]).otherwise(best_hits)
    guess = F.when(cjk_ratio > 0.2, F.lit("zh")).otherwise(best)
    return df.select(F.col(id_col), guess.alias("lang_guess"))


def fingerprint(
    df: DataFrame, text_col: str, id_col: str, k: int = 5, window: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Content fingerprints: md5 digest + winnowing — the minimum
    k-gram hash of each sliding window, deduplicated (Schleimer et al.,
    SIGMOD'03). All built-ins: two array transforms.

    ``hash_fn`` picks the gram hash: ``"md5"`` (default) uses the first
    16 hex chars of md5 — fixed-width lowercase hex, so lexicographic
    min == numeric min and ANY engine (DuckDB included) reproduces the
    fingerprint set bit-for-bit; ``"xxhash64"`` is the faster JVM-only
    variant for production pipelines that don't need cross-engine
    reproducibility."""
    if hash_fn == "md5":
        def gram_hash(s):
            return F.substring(F.md5(s), 1, 16)
    elif hash_fn == "xxhash64":
        gram_hash = F.xxhash64
    else:
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    toks = _ws_tokens(F.lower(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9\s]", " ")))
    n_grams = F.greatest(F.size(F.col("_toks")) - k + 1, F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: gram_hash(F.array_join(F.slice(F.col("_toks"), i, k), " "))
    )
    n_windows = F.greatest(F.size(F.col("_grams")) - window + 1, F.lit(1))
    minima = F.transform(F.sequence(F.lit(1), n_windows), lambda i: F.array_min(F.slice(F.col("_grams"), i, window)))
    # materialize _toks/_grams as real columns: inlining the gram expression
    # into both size() and transform() makes Catalyst recompute it per
    # reference (quadratic blowup on long docs)
    return (
        df.withColumn("_toks", toks)
        .withColumn("_grams", grams)
        .select(
            F.col(id_col),
            F.md5(F.col(text_col)).alias("md5"),
            F.array_sort(F.array_distinct(minima)).alias("winnow_fp"),
        )
    )


def ngram_doc_freq_topk(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, k: int = 50
) -> DataFrame:
    """Top-k word n-grams by document frequency — the corpus-statistics
    pass behind boilerplate detection and benchmark-contamination checks.

    Spark shape: shingle (distinct per doc) → explode → one count
    groupBy (map-side combined) → global top-k via sort+limit (Spark
    runs it as per-partition top-k + a k-row merge on one reducer, not a
    full sort). Ties broken by ngram text so the result is a total
    order.

    Unlike the dedup path this does NOT build per-doc shingle arrays:
    tokens are exploded once and n-grams assembled with window lead()s
    keyed on the doc id. Crucially every post-explode expression
    references only attributes the Generate/Window already materialized —
    a filter on e.g. ``size(tokens)`` would be inlined by CollapseProject
    and re-run the regex tokenizer once per exploded row (measured 20×
    slower). The shingle-boundary condition is therefore written as
    ``lead(tok, n-1) IS NOT NULL OR pos == 0`` (short docs keep their
    single truncated shingle, matching with_ngram_shingles)."""
    from pyspark.sql import Window

    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " ")), r"\s+"
    )
    t = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, n)]
    ngram = F.concat_ws(" ", F.col("tok"), *leads)
    complete = leads[-1].isNotNull() | (F.col("pos") == 0) if leads else F.lit(True)
    return (
        t.select(F.col(id_col), ngram.alias("ngram"), complete.alias("_keep"))
        .where(F.col("_keep") & (F.col("ngram") != ""))
        .select(id_col, "ngram")
        .distinct()
        .groupBy("ngram")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("ngram").asc())
        .limit(k)
    )


def contamination_flags(
    df: DataFrame,
    benchmark_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing ANY word
    n-gram with a benchmark set (the exact-overlap check run before
    training on scraped data).

    Spark shape: both sides tokenize+explode into (id, ngram) pairs via
    the window-lead path (no per-doc arrays, no generator-inlining trap
    — see ngram_doc_freq_topk); the benchmark side collapses to distinct
    n-grams and the corpus side left-semi joins against it — one
    shuffle keyed on the n-gram, map-side combinable, and the benchmark
    side is broadcastable whenever the benchmark is small (AQE decides).
    Returns distinct flagged (id) rows."""
    from pyspark.sql import Window

    def ngrams(d: DataFrame, ident: str) -> DataFrame:
        toks = F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " ")), r"\s+"
        )
        t = d.select(F.col(ident), F.posexplode(toks).alias("pos", "tok"))
        w = Window.partitionBy(ident).orderBy("pos")
        leads = [F.lead("tok", i).over(w) for i in range(1, n)]
        ngram = F.concat_ws(" ", F.col("tok"), *leads)
        complete = leads[-1].isNotNull() | (F.col("pos") == 0) if leads else F.lit(True)
        return (
            t.select(F.col(ident), ngram.alias("ngram"), complete.alias("_keep"))
            .where(F.col("_keep") & (F.col("ngram") != ""))
            .select(ident, "ngram")
        )

    bench_ngrams = ngrams(benchmark_df, id_col).select("ngram").distinct()
    corpus = ngrams(df, id_col)
    return corpus.join(bench_ngrams, "ngram", "left_semi").select(id_col).distinct()


# Each (label, pattern, replacement); applied in order, so more-specific
# patterns (SSN) run before broader ones (phone). RE2-compatible — no
# lookaround — so a DuckDB/Trino oracle reproduces the redaction exactly.
PII_PATTERNS: List[tuple] = [
    ("email", r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,253}\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def strip_html(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Boilerplate-lite HTML cleanup for scraped corpora: drop script
    and style blocks wholesale, strip the remaining tags, decode the
    five XML entities, collapse runs of whitespace. Pure JVM
    regexp_replace chain — RE2-safe patterns, so any engine reproduces
    the output bit-for-bit. Returns (id, text)."""
    t = F.col(text_col)
    # Sentinel close tags appended first: per HTML5 an unclosed
    # <script>/<style> element runs to end-of-input, and without a
    # close ANYWHERE the lazy .*? below would rescan to EOF once per
    # dangling open — quadratic on adversarial pages (measured ~6 s
    # for 12k unclosed opens in 96 KB; one match to the sentinel is
    # linear). On well-formed pages the sentinels match nothing and
    # are stripped by the generic tag rule below. The DuckDB oracle
    # appends the same sentinels.
    t = F.concat(t, F.lit("</script></style>"))
    # (?is) case-insensitive + dot-matches-newline; RE2 supports inline flags
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        t = F.regexp_replace(t, ent, ch)
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return df.select(F.col(id_col), t.alias(text_col))


def paragraph_dedup(df: DataFrame, text_col: str, id_col: str, min_chars: int = 20) -> DataFrame:
    """Corpus-level exact paragraph dedup (the C4/RefinedWeb pass that
    removes boilerplate repeated across documents): a paragraph kept in
    exactly ONE place — its first occurrence in (doc id, position)
    order — and dropped everywhere else; paragraphs under ``min_chars``
    are never treated as duplicates (short lines repeat legitimately).
    Returns (id, text) with each doc's surviving paragraphs rejoined.

    Spark shape: posexplode -> one window over md5(paragraph) ranked by
    (id, pos) -> filter rank 1 or short -> re-assemble with
    collect-list sorted by position. One shuffle on the paragraph hash,
    one on the doc id — both map-side combinable, no driver state."""
    from pyspark.sql import Window

    paras = F.split(F.col(text_col), r"\n")
    ex = df.select(F.col(id_col), F.posexplode(paras).alias("pos", "para"))
    w = Window.partitionBy(F.md5("para")).orderBy(F.col(id_col), F.col("pos"))
    ranked = ex.withColumn("_rk", F.row_number().over(w))
    kept = ranked.where((F.length("para") < min_chars) | (F.col("_rk") == 1))
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))), lambda s: s.para
            ),
            "\n",
        ).alias(text_col)
    )
    # docs whose every paragraph deduplicated away still come back (empty)
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
    )


def pii_redact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """PII scrubbing for training corpora: mask emails / SSNs / phone
    numbers / IPv4s with typed placeholders and report per-category hit
    counts. Pure JVM regexp_replace chain — narrow, no shuffle, streams
    at scan speed; patterns are RE2-safe so any engine reproduces them.

    Returns (id, redacted text, n_email, n_ssn, n_phone, n_ipv4)."""
    t = F.col(text_col)
    counts = []
    red = t
    for label, pat, repl in PII_PATTERNS:
        # count BEFORE masking (earlier replacements can't create matches:
        # placeholders contain no digits or @). Escape backslashes: the
        # pattern passes through a SQL string literal
        sql_pat = pat.replace(chr(92), chr(92) * 2)
        counts.append(F.size(F.expr(f"regexp_extract_all({text_col}, '{sql_pat}', 0)")).alias(f"n_{label}"))
        red = F.regexp_replace(red, pat, repl)
    return df.select(F.col(id_col), red.alias(text_col), *counts)


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Repetition quality signals (the CCNet/Gopher-rules family): the
    fraction of duplicate lines and the share of all word bigrams taken
    by the single most frequent bigram — high values flag boilerplate,
    spam, and degenerate generations.

    All array built-ins, no shuffle. The top-bigram count is a sorted
    run-length maximum — one array_sort + one aggregate fold, O(n log n)
    per doc instead of the distinct×grams quadratic compare (measured
    ~2× on the bench corpus); the alternative explode+groupBy costs a
    corpus-wide shuffle for a per-doc statistic."""
    lines = F.filter(F.split(F.col(text_col), r"\n"), lambda s: F.trim(s) != "")
    n_lines = F.greatest(F.size(F.col("_lines")), F.lit(1))
    dup_line_ratio = (F.size(F.col("_lines")) - F.size(F.array_distinct(F.col("_lines")))) / n_lines
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " ")), r"\s+"
    )
    grams = F.transform(
        F.slice(F.col("_toks"), 1, F.greatest(F.size(F.col("_toks")) - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(F.col("_toks"), i + 2)),
    )
    n_grams = F.greatest(F.size(F.col("_grams")), F.lit(1))
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"), F.lit(0).cast("long").alias("best")
    )

    def _run_step(acc, x):
        new_run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(x.alias("prev"), new_run.alias("run"), F.greatest(acc.best, new_run).alias("best"))

    top_count = F.aggregate(F.array_sort(F.col("_grams")), acc0, _run_step, lambda acc: acc.best)
    return (
        df.withColumn("_lines", lines)
        .withColumn("_toks", toks)
        .withColumn("_grams", grams)
        .select(
            F.col(id_col),
            (F.floor(dup_line_ratio * 10000) / 10000).alias("dup_line_ratio"),
            F.size(F.col("_grams")).alias("n_bigrams"),
            F.coalesce(top_count, F.lit(0)).alias("top_bigram_count"),
            (F.floor(F.coalesce(top_count, F.lit(0)) / n_grams * 10000) / 10000).alias(
                "top_bigram_frac"
            ),
        )
    )


def ngram_lm_perplexity(df: DataFrame, text_col: str, id_col: str, add_k: float = 0.5) -> DataFrame:
    """Bigram language-model perplexity as a quality signal (the
    CCNet/KenLM idea: score each document under an n-gram LM; documents
    far from the corpus distribution — gibberish, boilerplate, wrong
    language — score high). The LM here is trained on the corpus itself
    in the same job: add-k-smoothed bigram MLE,
    ``P(w2|w1) = (c(w1,w2)+k) / (c(w1)+k·V)``.

    Spark shape (two aggregations + ONE scoring join):
    - tokenize + posexplode once; the bigram stream (w1, w2) comes from
      a per-doc ``lead()`` window, and is persisted — it feeds both the
      count table and the scoring pass.
    - the bigram count table carries its own context totals via a
      ``sum() over (partition by w1)`` window on the *aggregated* table
      (vocab-sized, not corpus-sized), so scoring needs a single shuffle
      join on (w1, w2) instead of two.
    - V (distinct tokens) is a 1-row aggregate, broadcast.

    At scale the count table is O(distinct bigrams) — far smaller than
    the corpus — and every shuffle is keyed on bigram text, which is
    near-uniform; no skew guard needed. Documents with <2 tokens carry
    no bigram and are excluded (same as the oracle).

    Returns (id, n_bigrams, cross_entropy_bits, ppl)."""
    from pyspark.sql import Window

    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " ")), r"\s+"
    )
    t = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok")).where(F.col("tok") != "")
    w = Window.partitionBy(id_col).orderBy("pos")
    # localCheckpoint (not persist): the materialized blocks are RDD-level
    # and the ContextCleaner releases them once the returned DataFrame is
    # garbage-collected, so repeated calls in a long-lived session don't
    # accumulate CacheManager entries that only an explicit unpersist —
    # which a lazy return value gives callers no safe point to issue —
    # would remove.
    bigrams = (
        t.select(F.col(id_col), F.col("tok").alias("w1"), F.lead("tok", 1).over(w).alias("w2"))
        .where(F.col("w2").isNotNull())
        .localCheckpoint(eager=True)
    )
    vocab = t.agg(F.countDistinct("tok").alias("v"))
    counts = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count("*").alias("n2"))
        .withColumn("n1", F.sum("n2").over(Window.partitionBy("w1")))
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.log((F.col("n2") + F.lit(add_k)) / (F.col("n1") + F.lit(add_k) * F.col("v"))).alias("_lp"),
        )
    )
    ln2 = 0.6931471805599453
    return (
        bigrams.join(counts, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            (-F.avg("_lp") / F.lit(ln2)).alias("cross_entropy_bits"),
        )
        .withColumn("ppl", F.pow(F.lit(2.0), F.col("cross_entropy_bits")))
    )


def chunk_documents(
    df: DataFrame, text_col: str, id_col: str, max_chars: int = 1000, overlap: int = 100
) -> DataFrame:
    """Split documents into overlapping fixed-size chunks — the layout
    step between a cleaned corpus and a RAG index / context-window
    bounded consumer. Returns (id, chunk_id, chunk_start, chunk_text,
    n_chunks); empty documents produce no chunks.

    Pure built-ins, no shuffle: a ``sequence()`` of chunk starts is
    posexploded and each chunk is a ``substring`` of the ORIGINAL text
    column — every post-explode expression references only base or
    Generate-materialized attributes, so CollapseProject inlining
    re-evaluates nothing per row (the generator-inlining pitfall
    SCALE.md documents). Chunk count per doc is
    ceil((len - overlap) / stride), deterministic."""
    if overlap >= max_chars:
        raise ValueError(f"overlap {overlap} must be < max_chars {max_chars}")
    stride = max_chars - overlap
    starts = F.sequence(F.lit(0), F.greatest(F.length(F.col(text_col)) - 1, F.lit(0)), F.lit(stride))
    n = F.size(starts)
    exploded = df.where(F.length(F.col(text_col)) > 0).select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        n.alias("n_chunks"),
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    )
    return exploded.select(
        id_col,
        "chunk_id",
        "chunk_start",
        F.substring(F.col("_t"), F.col("chunk_start") + 1, max_chars).alias("chunk_text"),
        "n_chunks",
    )


def quality_deciles(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n_buckets: int = 10,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Quantile-bucket a score column (curriculum / quality-mixture
    binning) WITHOUT a global sort: the naive ``ntile() over (order by
    score)`` is one single-task window at any scale. Instead: one
    quantile aggregate (map-side combinable) produces the n_buckets-1
    cut points, broadcast back as a 1-row frame, and the bucket is the
    count of cut points strictly below the score — deterministic, one
    narrow pass + one tiny broadcast join.

    The default cut-point aggregate is ``approx_percentile`` — a
    Greenwald-Khanna sketch whose merged state is O(accuracy) REGARDLESS
    of cardinality, so it is safe over continuous double scores (e.g.
    LM perplexities) at any scale; each returned quantile q is an
    element whose true rank is within n/accuracy of q·n (rank error
    1/accuracy, default 0.01%), so bucket populations deviate from
    n/n_buckets by at most that fraction. ``exact=True`` switches to
    Spark's exact ``percentile``, whose aggregation state is a
    value→count map — O(distinct scores), unbounded on continuous
    doubles — reserve it for modest-cardinality columns or oracle
    comparisons that need reproducible cut points.

    Bucket populations are approximately equal (threshold binning puts
    boundary ties in the same bucket — the correct behavior for
    curriculum weights, where equal scores should never land in
    different bins). Returns (id, score, bucket 1..n)."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    arr = f"array({','.join(str(p) for p in probs)})"
    fn = (
        f"percentile({score_col}, {arr})"
        if exact
        else f"approx_percentile({score_col}, {arr}, {accuracy})"
    )
    th = df.agg(F.expr(fn).alias("_th"))
    bucket = F.lit(1)
    for i in range(len(probs)):
        bucket = bucket + F.when(F.col(score_col) > F.col("_th")[i], 1).otherwise(0)
    return (
        df.crossJoin(F.broadcast(th))
        .select(F.col(id_col), F.col(score_col), bucket.cast("int").alias("bucket"))
    )


def source_token_sketch(df: DataFrame, text_col: str, source_col: str, rsd: float = 0.02) -> DataFrame:
    """Per-source corpus statistics with BOUNDED aggregation state:
    token totals exactly (a sum), distinct-token cardinality via
    ``approx_count_distinct`` (HyperLogLog++, state O(1/rsd^2) per
    group REGARDLESS of cardinality — the only viable shape for
    distinct counts over a 100 TB corpus, where an exact
    count-distinct shuffles every distinct token). rsd is the target
    relative standard deviation (default 2%).

    Returns (source, n_docs, n_tokens, approx_distinct_tokens). The
    oracle row pairs this with an exact DuckDB count at test scale and
    pins the relative error."""
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " ")), r"\s+")
    t = df.select(F.col(source_col).alias("source"), F.explode(toks).alias("tok")).where(F.col("tok") != "")
    token_agg = t.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.approx_count_distinct("tok", rsd).alias("approx_distinct_tokens"),
    )
    # LEFT join from the doc counts: a source whose documents are all
    # empty/whitespace has no token rows but must still be reported
    # (n_docs, 0, 0) rather than vanish
    return (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(F.count("*").cast("long").alias("n_docs"))
        .join(token_agg, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("approx_distinct_tokens", F.lit(0)).cast("long").alias("approx_distinct_tokens"),
        )
    )


def gopher_quality_flags(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The Gopher (Rae et al. 2021, Appendix A) rule-based quality
    filters, as per-document boolean flags plus the combined keep
    decision — the standard first-pass heuristic gate before
    model-based scoring. All built-ins, narrow projection, scan-speed.

    Rules (published thresholds):
    - word count in [50, 100000]
    - mean word length in [3, 10]
    - symbol-to-word ratio (# or ...) <= 0.1
    - lines starting with a bullet < 90%
    - lines ending with an ellipsis < 30%
    - >= 80% of words contain at least one alphabetic character
    - >= 2 of the canonical stopwords (the, be/is, to, of, and, that,
      have, with) appear
    """
    t = F.col(text_col)
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1))
    mean_wlen = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ) / nw
    n_symbols = (
        F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
        + F.floor((F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / 3)
    )
    lines = F.split(t, r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_lines = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
    ellipsis_lines = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$")))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    # lowercase the already-split tokens instead of re-tokenizing
    # lower(text) — one regexp pass over the text, not two (lowering
    # never changes whitespace, so the token streams are identical)
    low_words = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(
        F.array_intersect(
            low_words,
            F.array(*[F.lit(w) for w in ("the", "be", "is", "to", "of", "and", "that", "have", "with")]),
        )
    )
    out = df.select(
        F.col(id_col),
        (n_words >= 50) & (n_words <= 100000),
        (mean_wlen >= 3) & (mean_wlen <= 10),
        (n_symbols / nw) <= 0.1,
        (bullet_lines / n_lines) < 0.9,
        (ellipsis_lines / n_lines) < 0.3,
        (alpha_words / nw) >= 0.8,
        stop_hits >= 2,
    ).toDF(
        id_col,
        "word_count_ok",
        "mean_word_len_ok",
        "symbol_ratio_ok",
        "bullet_ratio_ok",
        "ellipsis_ratio_ok",
        "alpha_ratio_ok",
        "stopword_ok",
    )
    keep = (
        F.col("word_count_ok")
        & F.col("mean_word_len_ok")
        & F.col("symbol_ratio_ok")
        & F.col("bullet_ratio_ok")
        & F.col("ellipsis_ratio_ok")
        & F.col("alpha_ratio_ok")
        & F.col("stopword_ok")
    )
    return out.withColumn("keep", keep)


def c4_quality_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2 — the published
    recipe behind the C4 corpus), as one narrow projection. Line rules
    REWRITE the text; page rules set the ``keep`` flag:

    - a line survives iff it ends in a terminal punctuation mark
      (``. ! ? "``), has >= ``min_words_per_line`` whitespace words,
      and does not mention "javascript" (the enable-JS boilerplate);
    - the page survives iff >= ``min_kept_lines`` lines survive, the
      text has no "lorem ipsum" (any case), and no curly brace (code).

    The paper counts *sentences* for the 3-line floor; like the common
    reimplementations we count surviving lines (the synthetic corpus
    is line-segmented). Returns (id, text [rewritten], n_lines,
    n_lines_kept, keep).

    100 TB: pure ``pyspark.sql.functions`` over split arrays — no
    explode, no shuffle, whole-stage codegen; runs at scan speed and
    composes as a pipeline gate. No reference counterpart
    (published-recipe operator)."""
    t = F.col(text_col)
    lines = F.split(t, r"\n")

    def _line_ok(l):
        s = F.trim(l)
        words = F.size(F.filter(F.split(s, r"\s+"), lambda w: w != ""))
        return (
            s.rlike(r'[.!?"]$')
            & (words >= min_words_per_line)
            & ~F.lower(s).contains("javascript")
        )

    kept = F.filter(lines, _line_ok)
    page_ok = (
        (F.size(kept) >= min_kept_lines)
        & ~F.lower(t).contains("lorem ipsum")
        & ~t.contains("{")
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias(text_col),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_lines_kept"),
        page_ok.alias("keep"),
    )
