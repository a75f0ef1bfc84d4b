"""Round-7 additions: certification completeness, advisor hardenings
(guarded SemDeDup oracle, side-input scheme/size guard, deterministic
client dedup), and the new graded operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------------
# Advisor: side-input scheme restriction + size cap
# ------------------------------------------------------------------

def test_side_input_rejects_non_http_schemes(tmp_path):
    from python_mozetl_spark.sources import side_input_from_json

    p = tmp_path / "x.json"
    p.write_text('{"a": 1}')
    with pytest.raises(ValueError, match="scheme"):
        side_input_from_json(f"file://{p}")
    with pytest.raises(ValueError, match="scheme"):
        side_input_from_json("ftp://example.test/x.json")
    # plain local paths still work
    assert side_input_from_json(str(p)) == {"a": 1}


# ------------------------------------------------------------------
# Advisor: SemDeDup ORACLE zero-norm guard (the Spark side was already
# pinned; this proves the DuckDB twin now agrees on a zero vector)
# ------------------------------------------------------------------

def test_semdedup_oracle_zero_vector_parity(spark, tmp_path):
    import duckdb

    from python_mozetl_spark.ext.similarity import semantic_dedup
    from python_mozetl_spark.plans.queries import _lloyd_oracle, _semdedup_tail

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),     # exact duplicate of 1 → dropped
        (3, [0.0, 0.0]),     # zero vector: cosine must be 0.0, KEPT
        (4, [0.0, 1.0]),
        (5, [0.0, 0.0]),     # second zero vector — zero×zero pair too
        (6, [0.6, 0.8]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.parquet(path)

    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df, "vec_id", "embedding", k=2, iters=1, threshold=0.9
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    oracle = con.execute(
        _lloyd_oracle(k=2, iters=1, tail=_semdedup_tail(0.9))
    ).fetchall()
    want = {vec_id: kept for vec_id, _cluster, kept in oracle}
    assert got == want
    assert got[3] and got[5]  # zero vectors survive on BOTH engines
    assert not got[2]
