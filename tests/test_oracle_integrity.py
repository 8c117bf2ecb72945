"""Evidence-machinery integrity tests (r15, VERDICT r14 #1/#3).

The round-14 double-red (``bm25_topk`` + ``bm25_incremental``) came
from an oracle whose idf map was generated at import time by sniffing
hardcoded ``/root/testdata`` paths, with a SILENT libm-``ln`` fallback
when the corpus wasn't recognized — the driver sandbox missed the map
and the r13 float-boundary hazard fired again. These tests pin the
fix at the root:

- the bm25 oracle SQL computes its exact integer idf and rationalized
  tf factor from the ``documents`` view ALONE (no filesystem paths,
  no ``ln(``/``log(`` anywhere in the string);
- the ACTUAL oracle SQL, run on a synthetic corpus, reproduces a
  pure-Python exact-arithmetic BM25 bit-for-bit;
- the HUGEINT atanh-series idf agrees with the 50-digit decimal
  ``exact_idf_micro`` across a random (N, df) sweep up to N = 1e9;
- ``oracle_sql()`` is a PURE function: calling it with the filesystem
  probes and duckdb connections stubbed to raise produces the exact
  same strings — no oracle can silently change semantics with the
  environment.
"""

from __future__ import annotations

import random
import re

import duckdb
import pytest


def _tok(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9\s]", " ", text.lower()).split() if t]


def _bm25_exact_python(docs: dict[int, str], k: int = 10):
    """Ground-truth BM25 in exact integer arithmetic (k1=6/5, b=3/4):
    contribution = (idf_micro·22·S·tf) // (10·S·tf + 3·S + 9·N·dl),
    idf_micro from the 50-digit decimal ``exact_idf_micro``."""
    from iceberg_python_spark.operators.retrieval import exact_idf_micro

    toks = {d: _tok(t) for d, t in docs.items()}
    tf: dict[tuple[int, str], int] = {}
    for d, ts in toks.items():
        for t in ts:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    dl = {d: len(ts) for d, ts in toks.items() if ts}
    n_docs, s_total = len(dl), sum(dl.values())
    df: dict[str, int] = {}
    for (d, t) in tf:
        df[t] = df.get(t, 0) + 1
    out = []
    for qd in (0, 7, 13, 21, 34):
        if qd not in toks or not toks[qd]:
            continue
        qterms = set(dict.fromkeys(toks[qd][:4]))
        scores: dict[int, int] = {}
        for d in dl:
            s = 0
            hit = False
            for t in qterms:
                if (d, t) not in tf:
                    continue
                hit = True
                idf = exact_idf_micro(n_docs, df[t])
                num = idf * 22 * s_total * tf[(d, t)]
                den = 10 * s_total * tf[(d, t)] + 3 * s_total + 9 * n_docs * dl[d]
                s += num // den
            if hit:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out += [(qd, d, s, r + 1) for r, (d, s) in enumerate(ranked)]
    return sorted(out)


def test_bm25_oracle_matches_exact_python():
    """The ACTUAL oracle_sql()['bm25_topk'] string, run on a synthetic
    documents view, reproduces exact-integer-arithmetic BM25."""
    import __spark_entry__ as entry

    rng = random.Random(151)
    vocab = [f"w{i}" for i in range(40)] + ["the", "data", "alpha"]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 60)))
        for d in list(range(40)) + [97, 215]
    }
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", list(docs.items()))
        got = sorted(map(tuple, con.execute(entry.oracle_sql()["bm25_topk"]).fetchall()))
    finally:
        con.close()
    want = _bm25_exact_python(docs)
    assert got == want


def test_bm25_oracle_idf_series_random_sweep():
    """The HUGEINT atanh-series idf (the construction _bm25_score_sql
    embeds) == the 50-digit decimal exact_idf_micro over a random
    (N, df) sweep up to N = 1e9 — the truncation error budget
    (< 2e-10 micro-units) never crosses a floor boundary."""
    from iceberg_python_spark.operators.retrieval import exact_idf_micro

    fp = "1000000000000000000::HUGEINT"
    sql = (
        "WITH RECURSIVE pairs(n_docs, df_t) AS (SELECT * FROM (VALUES {vals}) v(n, d)), "
        "base AS (SELECT n_docs, df_t, (2*(n_docs+1))::HUGEINT AS ia, (2*df_t+1)::HUGEINT AS ib FROM pairs), "
        "red(n_docs, df_t, ia, ib, e, p) AS (SELECT n_docs, df_t, ia, ib, 0, ib FROM base "
        "UNION ALL SELECT n_docs, df_t, ia, ib, e+1, p*2 FROM red WHERE p*2 <= ia), "
        "rmax AS (SELECT n_docs, df_t, ia, max(e) AS e, max(p) AS p FROM red GROUP BY 1,2,3), "
        f"zf AS (SELECT n_docs, df_t, e, ((ia-p)*{fp})//(ia+p) AS z FROM rmax), "
        f"z2 AS (SELECT n_docs, df_t, e, z, (z*z)//{fp} AS zz FROM zf), "
        "ser(n_docs, df_t, e, zz, k, t, acc) AS (SELECT n_docs, df_t, e, zz, 0, z, z FROM z2 "
        f"UNION ALL SELECT n_docs, df_t, e, zz, k+1, (t*zz)//{fp}, "
        f"acc + ((t*zz)//{fp})//(2*k+3) FROM ser WHERE k < 40 AND t > 0) "
        "SELECT n_docs, df_t, CAST((e::HUGEINT*693147180559945309::HUGEINT + 2*max_by(acc, k)) "
        "// 1000000000000::HUGEINT AS BIGINT) AS idf_micro "
        "FROM ser GROUP BY n_docs, df_t, e ORDER BY 1, 2"
    )
    rng = random.Random(42)
    pairs = set()
    for n in (1, 2, 3, 37, 600, 60000, 10**6, 10**9):
        for d in {1, 2, max(1, n // 7), max(1, n // 2), max(1, n - 1), n}:
            if 1 <= d <= n:
                pairs.add((n, d))
    while len(pairs) < 400:
        n = rng.randint(1, 10**9)
        pairs.add((n, rng.randint(1, n)))
    vals = ", ".join(f"({n},{d})" for n, d in sorted(pairs))
    con = duckdb.connect()
    try:
        rows = con.execute(sql.format(vals=vals)).fetchall()
    finally:
        con.close()
    assert len(rows) == len(pairs)
    for n, d, got in rows:
        assert got == exact_idf_micro(n, d), (n, d)


def test_oracle_sql_no_paths_and_bm25_libm_free():
    """No oracle references a filesystem path or reads parquet itself
    (everything derives from the pre-registered views), and the bm25
    oracles contain no transcendental call at all."""
    import __spark_entry__ as entry

    sqls = entry.oracle_sql()
    for name, sql in sqls.items():
        low = sql.lower()
        assert "/root/" not in low and "read_parquet" not in low, name
        assert "getenv" not in low, name
    for name in ("bm25_topk", "bm25_incremental"):
        low = sqls[name].lower()
        assert "ln(" not in low and "log(" not in low and "exp(" not in low, name
        assert "::double" not in low and " double" not in low, name


def test_oracle_sql_env_independent():
    """oracle_sql() is pure: with os.path probes, os.listdir, and
    duckdb.connect stubbed to RAISE, it still returns the exact same
    strings — no import-time sniffing, no caches, no silent fallback
    (the r14 failure shape can no longer exist)."""
    import os

    import __spark_entry__ as entry

    baseline = entry.oracle_sql()

    def _boom(*a, **k):
        raise AssertionError(f"oracle_sql probed the environment: {a!r}")

    saved = (os.path.exists, os.path.isfile, os.listdir, duckdb.connect)
    os.path.exists, os.path.isfile, os.listdir, duckdb.connect = (
        _boom,
        _boom,
        _boom,
        _boom,
    )
    try:
        again = entry.oracle_sql()
    finally:
        os.path.exists, os.path.isfile, os.listdir, duckdb.connect = saved
    assert again == baseline


def test_oracle_output_types_bind_and_render_identically():
    """Registry-wide oracle output-TYPE audit (the r15 graph_pagerank
    red): DuckDB ``sum()`` over BIGINT returns HUGEINT, which lands in
    pandas as float64 and renders ``155892.0`` where Spark's int64
    renders ``155892`` — rows+schema match, value hash dies. Bind
    EVERY oracle against the real view set and assert no output column
    is HUGEINT/UHUGEINT/DECIMAL (oracles must cast aggregate-derived
    integers back to BIGINT in their final select). Binding (not
    executing) also proves each oracle COMPILES against the bare views
    — the env-dependence class: functions missing in the installed
    DuckDB, implicit-cast errors, typo'd view columns."""
    import os

    import __spark_entry__ as entry

    from .conftest import SF_DIR

    if not os.path.isdir(SF_DIR):
        pytest.skip(f"testdata not present at {SF_DIR}")
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    forbidden = ("HUGEINT", "UHUGEINT", "DECIMAL")
    con = duckdb.connect()
    try:
        for t in tables:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
        bad: list[str] = []
        for name, sql in entry.oracle_sql().items():
            rel = con.sql(sql)  # binds (compiles) without executing
            for col, typ in zip(rel.columns, rel.types):
                t = str(typ).upper()
                if any(f in t for f in forbidden):
                    bad.append(f"{name}.{col}: {t}")
        assert not bad, (
            "oracle output columns that pandas renders differently from "
            "Spark (cast to BIGINT/DOUBLE in the final select): " + "; ".join(bad)
        )
    finally:
        con.close()


def test_queries_registry_is_pure():
    """Building the queries() registry (NOT running the queries) must
    not probe the environment either — the driver imports the entry in
    its own sandbox before any testdata exists."""
    import os

    import __spark_entry__ as entry

    def _boom(*a, **k):
        raise AssertionError(f"queries() probed the environment: {a!r}")

    saved = (os.path.exists, os.path.isfile, os.listdir)
    os.path.exists, os.path.isfile, os.listdir = _boom, _boom, _boom
    try:
        q = entry.queries()
    finally:
        os.path.exists, os.path.isfile, os.listdir = saved
    assert len(q) >= 100
