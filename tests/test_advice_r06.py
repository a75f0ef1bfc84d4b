"""Round-6 advisor fixes, each pinned by the exact failure it closed.

1. encode.py: loo/frequency encoding dropped NULL-category rows
   (inner join on cat_col) — now null-safe, row-count preserving.
2. sketches.py cm_estimate: inner join vanished unseen keys and a
   partial counter miss inflated the min — now left join + coalesce 0.
3. metrics.py psi_drift: NULL value rows were silently binned into
   bin 0 via greatest(0, floor(NULL)) — now excluded.
4. multimodal.py decode_audio: channels=0 fmt chunk raised
   ZeroDivisionError, escaping audio_features' PERMISSIVE handling —
   now ValueError.
5. writers.py compact_parquet: dst_dir == src_dir overwrote the
   source mid-read — now refused.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F


def test_loo_encode_preserves_null_category_rows(spark):
    from python_mozetl_spark.operators.encode import loo_target_encode

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 5.0), (None, 7.0)],
        "cat string, y double",
    )
    out = loo_target_encode(df, "cat", "y")
    assert out.count() == 4  # no rows dropped
    rows = {(r["cat"], r["y"]): r["loo_enc"] for r in out.collect()}
    # NULL is its own category: leave-one-out of {5,7}
    assert rows[(None, 5.0)] == 7.0
    assert rows[(None, 7.0)] == 5.0
    assert rows[("a", 1.0)] == 3.0


def test_frequency_encode_preserves_null_category_rows(spark):
    from python_mozetl_spark.operators.encode import frequency_encode

    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "cat string"
    )
    out = frequency_encode(df, "cat")
    assert out.count() == 4
    by_cat = {r["cat"]: r["cat_count"] for r in out.collect()}
    assert by_cat[None] == 1 and by_cat["a"] == 2


def test_cm_estimate_unseen_key_is_zero_not_missing(spark):
    from python_mozetl_spark.ext.sketches import cm_estimate, cm_sketch

    corpus = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, "k string")
    sk = cm_sketch(corpus, "k", width=512, depth=4)
    # a wide sketch is sparse: most (d, bucket) rows are absent
    items = spark.createDataFrame([("x",), ("never-seen",)], "k string")
    est = {r["k"]: r["cm_est"] for r in
           cm_estimate(sk, items, "k", width=512, depth=4).collect()}
    assert set(est) == {"x", "never-seen"}  # unseen key NOT dropped
    assert est["never-seen"] == 0  # implicit-zero counters win the min
    assert est["x"] >= 5


def test_psi_drift_excludes_null_values(spark):
    from python_mozetl_spark.operators.metrics import psi_drift

    base = [(False, 5.0)] * 10 + [(True, 5.0)] * 10
    with_nulls = base + [(False, None)] * 50
    a = psi_drift(
        spark.createDataFrame(base, "cur boolean, v double"),
        "cur", "v", lo=0.0, hi=10.0, n_bins=5,
    ).collect()
    b = psi_drift(
        spark.createDataFrame(with_nulls, "cur boolean, v double"),
        "cur", "v", lo=0.0, hi=10.0, n_bins=5,
    ).collect()
    # NULLs must not create or inflate bin 0
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_decode_audio_zero_channels_is_valueerror():
    from python_mozetl_spark.ext.multimodal import decode_audio

    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)  # channels=0
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        decode_audio(blob)


def test_audio_features_survives_zero_channel_wav(spark):
    from python_mozetl_spark.ext.multimodal import audio_features, encode_wav

    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    bad = b"RIFF" + struct.pack("<I", len(body)) + body
    good = encode_wav(8000, [1, -2, 3])
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    assert rows[1]["n_samples"] == 3
    assert rows[2]["sample_rate"] is None  # null row, not a task failure


def test_compact_parquet_refuses_in_place(spark, tmp_path):
    from python_mozetl_spark.sinks.writers import compact_parquet

    src = str(tmp_path / "t")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="fresh directory"):
        compact_parquet(spark, src, src + "/")
