"""Focused tests for r17 optimization-round internals.

- The T-table AES core must agree with the readable FIPS-197 loop
  reference (which is itself pinned to the Appendix C known-answer
  vectors in test_pdfcrypt.py) for every key size, block, and both
  directions.
- local_rows_df must reproduce createDataFrame(rows, schema) exactly,
  including NULLs and empty inputs, while avoiding the Python-RDD
  parallelize path.
"""

import random

from iceberg_python_spark.operators import pdfcrypt as pc
from iceberg_python_spark.operators._local import local_rows_df


def test_aes_ttable_core_matches_loop_reference():
    rng = random.Random(1234)
    for _ in range(60):
        klen = rng.choice((16, 24, 32))
        key = bytes(rng.randrange(256) for _ in range(klen))
        blk = bytes(rng.randrange(256) for _ in range(16))
        w = pc._expand_key(key)
        nr = klen // 4 + 6
        ref_e = pc._aes_encrypt_block(blk, w, nr)
        rk, nr2 = pc._enc_schedule(key)
        assert nr2 == nr
        assert pc._encrypt_block_fast(blk, rk, nr) == ref_e
        ik, _ = pc._dec_schedule(key)
        # decrypt inverts encrypt, and matches the loop reference on
        # arbitrary (non-ciphertext) blocks too
        assert pc._decrypt_block_fast(ref_e, ik, nr) == blk
        assert pc._decrypt_block_fast(blk, ik, nr) == pc._aes_decrypt_block(blk, w, nr)


def test_aes_cbc_fast_roundtrip_long_payload():
    key = bytes(range(32))
    iv = bytes(range(16))
    msg = bytes((i * 7) & 0xFF for i in range(1000))
    ct = pc.aes_cbc_encrypt(key, msg, iv)
    assert pc.aes_cbc_decrypt(key, ct) == msg


def test_local_rows_df_matches_row_path(spark):
    rows = [("a", 1, None, True), ("b", None, 2.5, None), (None, 3, 0.0, False)]
    schema = "s string, i long, d double, b boolean"
    got = local_rows_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )
    empty = local_rows_df(spark, [], schema)
    assert empty.schema == want.schema and empty.count() == 0
    # the point of the helper: no Python evaluation at execution time
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Scan ExistingRDD" not in plan
