import math

import pytest
from pyspark.sql import functions as F

from python_mozetl_spark.jobs.similarity_model import run_similarity_model
from python_mozetl_spark.operators.privacy import dp_noisy_counts, laplace_noise


def test_dp_noisy_counts_dense_grid_and_determinism(spark):
    df = spark.createDataFrame(
        [("de", "a1"), ("de", "a1"), ("en", "a2")], ["locale", "addon"]
    )
    out1 = dp_noisy_counts(df, ["locale", "addon"], epsilon=1.0, seed=7)
    out2 = dp_noisy_counts(df, ["locale", "addon"], epsilon=1.0, seed=7)
    rows1 = {(r["locale"], r["addon"]): r for r in out1.collect()}
    rows2 = {(r["locale"], r["addon"]): r for r in out2.collect()}
    # dense grid: 2 locales × 2 addons, absent combos zero-filled
    assert set(rows1) == {("de", "a1"), ("de", "a2"), ("en", "a1"), ("en", "a2")}
    assert rows1[("en", "a1")]["n"] == 0
    # keyed noise ⇒ bitwise reproducible across runs
    assert all(rows1[k]["n_noisy"] == rows2[k]["n_noisy"] for k in rows1)
    # noise actually applied
    assert all(rows1[k]["n_noisy"] != rows1[k]["n"] for k in rows1)
    # different seed ⇒ different noise
    out3 = dp_noisy_counts(df, ["locale", "addon"], epsilon=1.0, seed=8)
    rows3 = {(r["locale"], r["addon"]): r for r in out3.collect()}
    assert any(rows3[k]["n_noisy"] != rows1[k]["n_noisy"] for k in rows1)


def test_laplace_noise_scale(spark):
    # empirical |noise| mean ≈ b = sensitivity/epsilon for Laplace
    df = spark.range(0, 4000).select(F.col("id").cast("string").alias("k"))
    eps = 0.5
    out = df.select(
        F.abs(laplace_noise([F.col("k")], epsilon=eps, seed=1)).alias("a")
    ).agg(F.avg("a")).first()[0]
    b = 1.0 / eps
    assert abs(out - b) / b < 0.15  # ±15% at n=4000


@pytest.mark.parametrize("k", [4])
def test_similarity_model_reproducible(spark, k):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a1, d1 = run_similarity_model(emb, k=k, donors_per_cluster=10, seed=42)
    a2, d2 = run_similarity_model(emb, k=k, donors_per_cluster=10, seed=42)
    h1 = sorted((r["vec_id"], r["prediction"]) for r in a1.collect())
    h2 = sorted((r["vec_id"], r["prediction"]) for r in a2.collect())
    assert h1 == h2  # seeded pipeline ⇒ identical assignment
    assert a1.select("prediction").distinct().count() == k
    per_cluster = d1.groupBy("prediction").count().collect()
    assert all(r["count"] <= 30 for r in per_cluster)  # sampled, not full
    assert d1.count() < a1.count()


def test_k_fold_split_partitions(spark):
    from python_mozetl_spark.jobs.ensemble import k_fold_split

    df = spark.range(1000)
    folds = k_fold_split(df, k_folds=4, seed=7)
    sizes = [f.count() for f in folds]
    assert sum(sizes) == 1000  # exact partition, no overlap/loss
    assert all(150 < s < 350 for s in sizes)
    # seeded: same split on re-run
    again = [f.count() for f in k_fold_split(df, k_folds=4, seed=7)]
    assert sizes == again


def test_ensemble_weights_favor_informative_feature(spark):
    import random

    from python_mozetl_spark.jobs.ensemble import run_ensemble
    from pyspark.sql import functions as F

    rng = random.Random(3)
    rows = []
    for _ in range(400):
        informative = rng.uniform(-1, 1)
        noise = rng.uniform(-1, 1)
        label = 1 if informative + rng.gauss(0, 0.1) > 0 else 0
        rows.append((informative, noise, label))
    df = spark.createDataFrame(rows, "f_good double, f_noise double, label int")
    weights = run_ensemble(
        df,
        scorers={"s_good": F.col("f_good"), "s_noise": F.col("f_noise")},
        reg_param=0.01,
        elastic_net_param=0.0,
    )
    assert set(weights) == {"s_good", "s_noise"}
    assert weights["s_good"] > 1.0
    assert abs(weights["s_noise"]) < 0.5 * weights["s_good"]


def test_pair_similarity_pins_reference_distances(spark):
    """Mirrors reference tests/test_taar_similarity.py:222-274: identical
    users -> 0; all-categorical-different, continuous-identical -> 0.001;
    categorical-identical -> 0 regardless of continuous; completely
    different -> >= 1; None fields must not break the score."""
    import math

    from python_mozetl_spark.jobs.similarity_model import pair_similarity

    CAT = ["city", "os", "locale"]
    CONT = ["hours", "bookmarks", "tabs", "uris", "tlds"]
    cols = ["uid", *CAT, *CONT]
    users = spark.createDataFrame(
        [
            (1, "Boston", "Windows", "en-US", 10.0, 1.0, 2.0, 3.0, 4.0),
            (2, "notsoB", "swodniW", "SU-ne", 10.0, 1.0, 2.0, 3.0, 4.0),
            (3, "Boston", "Windows", "en-US", 0.0, 0.0, 0.0, 0.0, 0.0),
            (4, "notsoB", "swodniW", "SU-ne", 0.0, 0.0, 0.0, 0.0, 0.0),
            (5, None, "swodniW", "SU-ne", 10.0, 1.0, None, 3.0, 4.0),
        ],
        cols,
    )
    pairs = (
        users.alias("a")
        .crossJoin(users.alias("b"))
        .select(
            F.col("a.uid").alias("ua"),
            F.col("b.uid").alias("ub"),
            pair_similarity(CAT, CONT).alias("score"),
        )
    )
    s = {(r["ua"], r["ub"]): r["score"] for r in pairs.collect()}
    assert math.isclose(s[(1, 1)], 0.0)
    assert math.isclose(s[(1, 2)], 0.001)  # j_c=0, j_d=1 -> 0.001
    assert math.isclose(s[(1, 3)], 0.0)  # same categorical -> j_d=0
    assert s[(1, 4)] >= 1.0  # j_c=5, j_d=1 -> 5.001
    assert s[(1, 5)] is not None and s[(1, 5)] > 0


def test_lr_curves_density_properties(spark):
    """KDE twin of mllib KernelDensity: densities positive, numerator
    curve peaks nearer the (tight) intra score mass than the
    denominator curve on separated populations."""
    from python_mozetl_spark.jobs.similarity_model import lr_curves

    rows = [("intra", i, 100 + i, 0.05 + 0.001 * i) for i in range(20)]
    rows += [("inter", i, 200 + i, 2.0 + 0.01 * i) for i in range(20)]
    scores = spark.createDataFrame(rows, ["label", "id_a", "id_b", "score"])
    out = lr_curves(spark, scores, kernel_bandwidth=0.35, num_pdf_points=40)
    pdf = out.orderBy("x").toPandas()
    assert len(pdf) == 40
    assert (pdf["num_density"] >= 0).all() and (pdf["den_density"] >= 0).all()
    x_num_peak = pdf.loc[pdf["num_density"].idxmax(), "x"]
    x_den_peak = pdf.loc[pdf["den_density"].idxmax(), "x"]
    assert x_num_peak < 1.0 < x_den_peak
