"""Similarity search over embedding columns (``array<float>``).

Three strategies:

- :func:`brute_force_topk` — exact cosine top-k, query side broadcast.
  The baseline; correct at any scale where |queries| is broadcastable
  (cost = |corpus|×|queries| dot products, embarrassingly parallel,
  no shuffle except the final per-query top-k).
- :func:`bucketed_topk` — IVF-style: probe only the query's own
  bucket/cell (here any precomputed partition column — a KMeans
  assignment, an LSH bucket...).  Cuts the candidate space by the
  bucket count; the scale path.
- :func:`cosine_topk_pandas` — Arrow-batched Pandas UDF computing the
  dot products with NumPy matmul per batch; same result as
  brute_force_topk but BLAS-backed, for wide vectors / large query
  sets where JVM higher-order functions lose.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_mozetl_spark.functions.vectors import cosine_similarity, quantize_int8


def _topk(scored: DataFrame, k: int, query_id: str = "query_id",
          neighbor_id: str = "neighbor_id") -> DataFrame:
    """Deterministic per-query top-k on (rounded score desc, id)."""
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(neighbor_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    precision: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for each row of ``queries``.

    ``queries`` is broadcast (keep it ≤ ~100k rows); score rounded to
    ``precision`` for cross-engine determinism, ties broken by id.

    ``exclude_self`` (default) drops neighbors whose id EQUALS the
    query id — correct for self-search (queries drawn from the
    corpus).  Pass ``False`` when queries and corpus are DIFFERENT
    tables that merely share an id namespace, or an unrelated corpus
    vector that happens to carry the query's surrogate id silently
    vanishes from its top-k.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = F.broadcast(q).crossJoin(c)
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        scored
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), precision).alias(
                "score"
            ),
        )
    )
    return _topk(scored, k)


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    precision: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Cosine top-k over int8-quantized vectors (symmetric max-abs
    scalar quantization, :func:`~python_mozetl_spark.functions.vectors.
    quantize_int8`).

    The compression step an ANN index runs before sharding a 100 TB
    float32 corpus: 4× less shuffle/cache/broadcast volume for a
    bounded recall loss (pin recall vs :func:`brute_force_topk` in
    tests, not in prod).  Quantization AND scoring are whole-stage-
    codegen JVM expressions; dot products over int8 are exact integer
    sums, so the result is bit-reproducible and oracle-checkable.
    """
    q8 = quantize_int8(F.col(vec_col))
    return brute_force_topk(
        corpus.withColumn(vec_col, q8),
        queries.withColumn(vec_col, q8),
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        precision=precision,
        exclude_self=exclude_self,
    )


def bucketed_topk(
    df: DataFrame,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    precision: int = 4,
    max_cell_rows: int = 100_000,
    chunk_rows: int = 4096,
) -> DataFrame:
    """IVF-style ANN: neighbors searched only within the query's own
    bucket (probe=1).  The bucket column is any precomputed coarse
    quantization (a KMeans label, an LSH bucket...).

    One shuffle on the bucket key, then each cell is scored with
    chunked NumPy matmuls inside ``applyInPandas`` — the |cell|² pair
    space exists only in the BLAS kernel, never as Spark rows (the
    pair-join + per-pair higher-order-function formulation produced
    ~3M scored rows and ran 12 s at sf0.1; this runs in ~1 s).

    Scale guard rails: the kernel matmul is chunked (``chunk_rows``
    query rows at a time) so peak score-matrix memory is
    |cell|×chunk, never |cell|²; and a cell larger than
    ``max_cell_rows`` raises — the |cell|×dim frame itself is the
    irreducible cost of exact in-cell scoring, so an oversized cell
    means the coarse quantizer needs refining (more clusters / finer
    LSH), not a bigger buffer.

    Ranking happens INSIDE the kernel on scores rounded half-AWAY-FROM-
    ZERO (``sign·floor(|x|·10ᵖ + ½)/10ᵖ`` — the same tie direction as
    JVM ``F.round``/``ROUND_HALF_UP`` and DuckDB ``round``; plain
    ``np.round`` is half-even and would mis-rank exact ties), with
    ``neighbor_id`` as the tiebreaker.  The kernel therefore emits the
    FINAL ranked top-k rows — the whole operator is ONE exchange (the
    bucket shuffle); no second window shuffle, no superset rows riding
    back to the JVM.  Requires a numeric ``id_col``.
    """
    scale = 10.0 ** precision

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "score": [], "rank": []}
        ).astype(
            {
                "query_id": "int64",
                "neighbor_id": "int64",
                "score": "float64",
                "rank": "int64",
            }
        )
        if n < 2:
            return empty
        if n > max_cell_rows:
            raise ValueError(
                f"bucketed_topk cell {pdf[bucket_col].iloc[0]!r} has {n} rows "
                f"(max_cell_rows={max_cell_rows}): refine the coarse quantizer "
                "or raise max_cell_rows explicitly"
            )
        ids = pdf[id_col].to_numpy()
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(mat, axis=1)
        norm[norm == 0] = 1.0
        mat = mat / norm[:, None]
        kk = min(k, n - 1)
        # neighbor order for tie-breaking: ids ascending
        id_order = np.argsort(ids, kind="stable")
        outs = []
        for s in range(0, n, chunk_rows):
            e = min(s + chunk_rows, n)
            block = mat[s:e] @ mat.T  # (chunk, n) raw cosines
            block[np.arange(e - s), np.arange(s, e)] = -2.0  # mask self
            rounded = np.sign(block) * np.floor(np.abs(block) * scale + 0.5) / scale
            # sort columns by (score desc, neighbor_id asc): stable sort
            # over the id-ascending permutation preserves id order at ties
            by_id = rounded[:, id_order]
            cols = np.argsort(-by_id, axis=1, kind="stable")[:, :kk]
            rows = np.repeat(np.arange(e - s), kk)
            flat = cols.ravel()
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": ids[s + rows],
                        "neighbor_id": ids[id_order[flat]],
                        "score": by_id[rows, flat],
                        "rank": np.tile(np.arange(1, kk + 1), e - s),
                    }
                )
            )
        return pd.concat(outs) if outs else empty

    return df.groupBy(bucket_col).applyInPandas(
        per_bucket, "query_id long, neighbor_id long, score double, rank bigint"
    )


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    nprobe: int = 1,
    cell_col: str = "cell",
) -> DataFrame:
    """Assign each vector its ``nprobe`` nearest centroid cells (by
    cosine) — the IVF coarse quantizer.  Arrow-batched NumPy: one
    matmul per batch against the (small, closure-shipped) centroid
    matrix; output explodes to one row per (vector, probed cell).
    """
    cmat = np.asarray(centroids, dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1)
    cnorm[cnorm == 0] = 1.0
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {cell_col} int"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            vnorm = np.linalg.norm(mat, axis=1)
            vnorm[vnorm == 0] = 1.0
            sims = (mat @ cmat.T) / np.outer(vnorm, cnorm)
            # nprobe nearest cells per row
            order = np.argsort(-sims, axis=1)[:, :nprobe]
            n = len(pdf)
            rep = pdf.iloc[np.repeat(np.arange(n), nprobe)].reset_index(drop=True)
            rep[cell_col] = order.ravel().astype("int32")
            yield rep

    return df.mapInPandas(assign, out_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    precision: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF ANN with multi-probe: corpus vectors live in their single
    nearest cell; each query probes its ``nprobe`` nearest cells and
    scores only those cells' members.

    The scale path proper: candidate volume ≈ |corpus| × nprobe /
    n_cells per query batch, the join shuffles on the cell id, and the
    centroid matrix is closure-broadcast.  nprobe = n_cells degrades
    gracefully to exact brute force (tested equivalence).
    """
    c_cells = ivf_assign(corpus, centroids, vec_col, nprobe=1).select(
        F.col("cell"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
    )
    q_cells = ivf_assign(queries, centroids, vec_col, nprobe=nprobe).select(
        F.col("cell"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
    )
    # no pair dedup needed: corpus vectors are assigned nprobe=1, so a
    # neighbor lives in exactly ONE cell and each (query, neighbor)
    # pair arises from at most one cell-join row — a dropDuplicates
    # here was a provable no-op costing a full extra shuffle of the
    # scored-pair frame (the operator's largest intermediate)
    scored = q_cells.join(c_cells, "cell")
    if exclude_self:  # valid for self-search only — see brute_force_topk
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        scored
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), precision).alias(
                "score"
            ),
        )
    )
    return _topk(scored, k)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    precision: int = 4,
    strategy: str = "auto",
    matmul_max_rows: int = 200_000,
    matmul_max_bytes: int = 512 << 20,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b,
    rounded cosine ≥ ``threshold``).

    - ``matmul`` (default when the corpus fits the driver/broadcast
      budget): normalize once, ship the corpus matrix to executors via
      ``sparkContext.broadcast`` (one transfer per executor, not one
      per task-closure serialization), score each Arrow batch against
      it with ONE BLAS matmul and emit only the surviving pairs.  The
      O(n²) pair space exists only inside the NumPy kernel — never as
      Spark rows (the per-pair higher-order-function join ran 98 s at
      sf0.1; this runs in ~1 s).  Requires a numeric ``id_col`` (the
      ``id_a < id_b`` mask is taken in NumPy).
    - ``join``: the pure-DataFrame pair scan — correct at any scale,
      quadratic rows; the fallback when the corpus is too large to
      broadcast and exactness is still required.
    - ``auto`` decides from Catalyst's PLANNING-TIME size estimate of
      the (id, vector) projection (parquet-footer derived, zero jobs —
      a 100 TB corpus fails the budget before anything is scanned),
      then hard-checks actual rows and matrix bytes ``n × dim × 8``
      after the collect — a byte gate, not just a row gate, so wide
      embeddings can't sneak a multi-GB matrix onto the driver (the
      hard check bails to the ``join`` path).
    - For truly large corpora use :func:`srp_near_dup_pairs`, the
      LSH-bucketed scale path (pytest-verified equal on this data).

    Rounding: the kernel masks on ``raw ≥ threshold − 1.5·10⁻ᵖ`` (a
    safe superset: HALF_UP rounding moves a value by at most half a
    grid step) and emits RAW cosines; the exact filter is applied
    JVM-side on ``F.round``-ed values so ties round HALF_UP exactly
    like the join path and the DuckDB oracle (``np.round`` is
    half-even).
    """
    from python_mozetl_spark.session import plan_size_bytes

    spark = df.sparkSession
    probing = False
    if strategy == "auto":
        est = plan_size_bytes(df.select(id_col, vec_col))
        strategy = "matmul" if est <= matmul_max_bytes else "join"
        probing = True
    if strategy == "matmul":
        src = df.select(id_col, vec_col)
        if probing:
            # Catalyst's estimate is compressed-size based; cap the
            # probing collect at matmul_max_rows+1 so a mis-estimate
            # can't materialize the full corpus on the driver before
            # the hard check bails (one extra row fails the row gate).
            src = src.limit(matmul_max_rows + 1)
        pdf = src.toPandas()
        if len(pdf) > matmul_max_rows or (
            len(pdf) and len(pdf) * len(pdf[vec_col].iloc[0]) * 8 > matmul_max_bytes
        ):
            strategy = "join"  # hard post-collect check beat the estimate
    if strategy == "matmul" and len(pdf) == 0:
        # np.vstack([]) raises; an empty corpus has no pairs — return
        # the empty frame the join/bitmap paths produce for it
        return spark.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )
    if strategy == "matmul":
        ids = pdf[id_col].to_numpy()
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(mat, axis=1)
        norm[norm == 0] = 1.0
        mat = mat / norm[:, None]
        bc = spark.sparkContext.broadcast((ids, mat))
        lo = threshold - 1.5 * 10.0 ** (-precision)

        def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cids, cmat = bc.value
            for b in batches:
                bids = b[id_col].to_numpy()
                if not np.isin(bids, cids).all():
                    # the matmul strategy scans df twice (driver collect
                    # + distributed pass): a row the collect never saw
                    # means a nondeterministic input, and its pairs
                    # would silently go missing — same contract as the
                    # n-gram bitmap path
                    raise ValueError(
                        "row id absent from the collected corpus matrix: "
                        "the matmul strategy requires a deterministic "
                        "DataFrame (no unseeded sample()/rand()); use "
                        "strategy='join' for such inputs"
                    )
                bm = np.vstack(b[vec_col].to_numpy()).astype(np.float64)
                bnorm = np.linalg.norm(bm, axis=1)
                bnorm[bnorm == 0] = 1.0
                sims = (bm / bnorm[:, None]) @ cmat.T  # raw cosines
                mask = (sims >= lo) & (cids[None, :] > bids[:, None])
                ai, bj = np.nonzero(mask)
                yield pd.DataFrame(
                    {
                        "id_a": bids[ai],
                        "id_b": cids[bj],
                        "cosine": sims[ai, bj],
                    }
                )

        return (
            df.select(id_col, vec_col)
            .mapInPandas(score, "id_a long, id_b long, cosine double")
            .select("id_a", "id_b", F.round("cosine", precision).alias("cosine"))
            .where(F.col("cosine") >= threshold)
        )
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("__va"), F.col("__vb")), precision).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )


def srp_near_dup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 96,
    bands: int = 24,
    precision: int = 4,
    seed: int = 42,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding near-dup pairs via signed-random-projection LSH.

    ``planes`` seeded hyperplanes give a ``planes``-bit sign sketch;
    band self-join on ``bands`` bit-slices generates candidates, exact
    cosine verifies.  For cos θ ≥ t the per-plane split probability is
    arccos(t)/π, so the miss probability at t=0.95 with 24 bands of 4
    bits is (1-(1-0.102)⁴)²⁴ ≈ 4e-9 — the result matches the
    brute-force scan in practice.  Shuffle volume is docs×bands tiny
    (id, bucket) rows plus the candidate pairs, never the O(n²) space.
    """
    rng = np.random.default_rng(seed)
    hyperplanes = rng.standard_normal((planes, dim))
    rows_per_band = planes // bands

    vecs = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.vstack(pdf["__v"].to_numpy()).astype(np.float64)
            bits = (mat @ hyperplanes.T) >= 0  # (n, planes)
            out = {"__id": pdf["__id"].to_numpy()}
            for b in range(bands):
                chunk = bits[:, b * rows_per_band : (b + 1) * rows_per_band]
                key = chunk @ (1 << np.arange(rows_per_band))
                out[f"band_{b}"] = key + (b << rows_per_band)
            yield pd.DataFrame(out)

    schema = "__id long, " + ", ".join(f"band_{b} long" for b in range(bands))
    sk = vecs.mapInPandas(sketch, schema)
    banded = sk.select(
        "__id",
        F.explode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias(
            "bucket"
        ),
    )
    # bounded bucket fanout instead of a self-join so the sketch
    # mapInPandas runs once (self-join sides are not exchange-reused)
    # and a degenerate bucket cannot collect every id into one task
    from python_mozetl_spark.ext.dedup import bounded_bucket_pairs

    cand = (
        bounded_bucket_pairs(
            banded.select("bucket", F.struct(F.col("__id")).alias("__p")),
            "bucket",
            "__p",
            "__id",
            max_bucket,
            # stage=True (round 13): the count-window chain is planned
            # per pair consumer and would re-run the mapInPandas
            # sketch subtree below its exchange each time; this path
            # computes sketches inline (one-shot), same trade as
            # minhash's one-shot branch
            stage=True,
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = cand.join(
        vecs.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va")), "id_a"
    ).join(
        vecs.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb")), "id_b"
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("__va"), F.col("__vb")), precision).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    precision: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Arrow-batched NumPy path: ``queries_pdf`` is a small pandas frame
    (id, vector) shipped in the closure; each Arrow batch of the corpus
    is scored with one matmul.  Returns (query_id, neighbor_id, score)
    un-ranked; feed through the same top-k window as the exact path.
    """
    qids = queries_pdf[id_col].to_numpy()
    qmat = np.vstack(queries_pdf[vec_col].to_numpy()).astype(np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cmat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            cnorm = np.linalg.norm(cmat, axis=1)
            cnorm[cnorm == 0] = 1.0
            sims = (qmat @ cmat.T) / np.outer(qnorm, cnorm)
            nq, nc = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, nc),
                    "neighbor_id": np.tile(pdf[id_col].to_numpy(), nq),
                    "score": sims.ravel(),  # raw; rounded JVM-side below
                }
            )

    out = corpus.select(id_col, vec_col).mapInPandas(
        score_batches, "query_id long, neighbor_id long, score double"
    )
    # HALF_UP like every other path (np.round is half-even)
    out = out.select(
        "query_id", "neighbor_id", F.round("score", precision).alias("score")
    )
    if exclude_self:  # valid for self-search only — see brute_force_topk
        out = out.where(F.col("query_id") != F.col("neighbor_id"))
    return out


def lloyd_clusters(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Deterministic fixed-iteration Lloyd's k-means — the clustering
    primitive with a CROSS-ENGINE-REPRODUCIBLE spec (pyspark.ml KMeans
    k-means|| init is seeded-random and engine-private, so its
    assignments can never be oracle-checked; this one can).

    The spec, identical in any engine: initial centroids are the ``k``
    lowest-id vectors; each iteration assigns every vector to the
    centroid minimizing the squared euclidean distance ROUNDED to
    ``round_dp`` (centroid index breaks exact ties), then recomputes
    centroids as the per-dimension mean, also rounded to ``round_dp``.
    Rounding at both decision points is what pins the float behavior:
    distances and centroids agree across engines to ~1e-12, so the
    6dp-rounded values — the only numbers compared or iterated on —
    are identical.

    Scale shape: the corpus crosses one hash exchange per iteration
    (the (cluster, dim) mean agg after a posexplode of the vector);
    assignment itself is a broadcast cross join against the k-row
    centroid table with a row_number over (distance, cid) — no corpus
    self-join anywhere.  Driver state is k×dim rounded floats per
    iteration (centroid-sized, like ivf_topk's coarse quantizer).

    Returns (id, cluster, d2): the final assignment under the
    last-updated centroids.
    """
    spark = df.sparkSession
    # the prepared frame has iters+2 consumers (init collect, one
    # assignment per iteration, the final assignment) — stage it so
    # the source scans once instead of once per consumer (SCALE.md
    # §6b; at cluster scale persist a vectors table instead)
    e = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    ).localCheckpoint(eager=False)

    def assign(cents: list[tuple[int, list[float]]]) -> DataFrame:
        cdf = spark.createDataFrame(cents, ["__cid", "__cv"]).select(
            "__cid", F.col("__cv").cast("array<double>").alias("__cv")
        )
        d2 = F.round(
            F.aggregate(
                F.zip_with("__v", "__cv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            round_dp,
        )
        scored = e.crossJoin(F.broadcast(cdf)).withColumn("__d2", d2)
        w = Window.partitionBy(id_col).orderBy("__d2", "__cid")
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(id_col, "__cid", "__d2", "__v")
        )

    cents = [
        (i, [float(x) for x in r["__v"]])
        for i, r in enumerate(e.orderBy(id_col).limit(k).collect())
    ]
    for _ in range(iters):
        a = assign(cents)
        means = (
            a.select("__cid", F.posexplode("__v").alias("__i", "__x"))
            .groupBy("__cid", "__i")
            .agg(F.round(F.avg("__x"), round_dp).alias("__m"))
            .collect()
        )
        upd: dict[int, dict[int, float]] = {}
        for r in means:
            upd.setdefault(r["__cid"], {})[r["__i"]] = r["__m"]
        # a centroid that lost every member keeps its previous position
        cents = [
            (cid, [upd[cid][i] for i in sorted(upd[cid])] if cid in upd else v)
            for cid, v in cents
        ]
    final = assign(cents)
    return final.select(
        F.col(id_col),
        F.col("__cid").cast("long").alias("cluster"),
        F.col("__d2").alias("d2"),
    )


def kcenter_coreset(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 6,
    round_dp: int = 6,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 2-approximation
    — the farthest-point diversity sampler used for training-data
    selection): seed with the lowest-id vector, then repeatedly pick
    the point FARTHEST from the selected set.

    Deterministic cross-engine spec, same discipline as
    :func:`lloyd_clusters`: every compared quantity is the squared
    euclidean distance ROUNDED to ``round_dp``; the farthest-point
    argmax breaks ties by lowest id; the final assignment breaks
    distance ties by center SELECTION ORDER.  min-over-centers of
    rounded distances is order-free, so the incremental
    ``least(prev, new)`` form (the SQL oracle) equals the recompute-all
    form (this implementation).

    Scale shape: k scans, each a broadcast cross join against the
    ≤k-row center table + a 1-row argmax collect (bounded by
    construction); no corpus self-join, driver state is k×dim floats.

    Returns (id, center_id, d2): every point's nearest selected
    center — the coreset assignment whose max d2 is the coverage
    radius.
    """
    spark = df.sparkSession
    e = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    ).localCheckpoint()  # k scans re-read the prepared frame, not the source

    def scored_frame(cents: list[tuple[int, int, list[float]]]) -> DataFrame:
        cdf = spark.createDataFrame(
            cents, ["__ord", "__cid", "__cv"]
        ).select(
            "__ord", "__cid", F.col("__cv").cast("array<double>").alias("__cv")
        )
        d2 = F.round(
            F.aggregate(
                F.zip_with("__v", "__cv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            round_dp,
        )
        return e.crossJoin(F.broadcast(cdf)).withColumn("__d2", d2)

    def d2_to(center: list[float]):
        cv = F.lit(center).cast("array<double>")
        return F.round(
            F.aggregate(
                F.zip_with("__v", cv, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            round_dp,
        )

    first = e.orderBy(id_col).limit(1).collect()[0]
    cents = [(1, first[id_col], [float(x) for x in first["__v"]])]
    # incremental least(prev, new) — the oracle's own formulation; each
    # iteration is a narrow projection + a TakeOrdered top-1 (no
    # crossJoin/groupBy shuffle per step)
    cur = e.withColumn("__dmin", d2_to(cents[0][2]))
    for i in range(1, k):
        far = cur.orderBy(F.desc("__dmin"), id_col).limit(1).collect()[0]
        cents.append(
            (len(cents) + 1, far[id_col], [float(x) for x in far["__v"]])
        )
        cur = cur.withColumn(
            "__dmin", F.least("__dmin", d2_to(cents[-1][2]))
        )
        if i % 3 == 0:
            cur = cur.localCheckpoint()  # bound the fold-over-fold lineage
    w = Window.partitionBy(id_col).orderBy("__d2", "__ord")
    return (
        scored_frame(cents)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("__cid").cast("long").alias("center_id"),
            F.col("__d2").alias("d2"),
        )
    )


def mmr_select(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    lam: float = 0.5,
    round_dp: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein,
    SIGIR'98): greedily pick k vectors maximizing
    ``lambda * relevance - (1 - lambda) * max-similarity-to-selected``
    — the relevance-AND-diversity subset sampler (RAG context
    packing, eval-set curation) where :func:`kcenter_coreset` is
    diversity-only.  Relevance = cosine to the corpus centroid (the
    deterministic stand-in for an external query vector).

    Deterministic cross-engine spec, same discipline as
    ``kcenter_coreset``: every compared quantity (relevance, pairwise
    similarity, the MMR score) is cosine ROUNDED to ``round_dp``;
    argmax ties break by lowest id; max-over-selected uses the
    incremental ``greatest(prev, new)`` form, which over rounded
    sims equals the recompute-all form.  Zero-norm vectors score
    cosine 0.0 (guarded), so they can be selected but never dominate.

    Scale shape: k scans of the staged (id, vector, relevance)
    frame, each a narrow projection + TakeOrdered top-1 (1-row
    argmax collect, bounded by construction); the centroid is a
    d-row collect (bounded by the DIMENSION, not the data); no
    corpus self-join anywhere — the candidate x selected similarity
    exists only as a per-row expression against <= k broadcast
    literals.

    Returns the k selected rows ``(rank, id, relevance, score)`` in
    selection order.
    """
    spark = df.sparkSession
    e = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    ).localCheckpoint()  # k argmax scans re-read the prepared frame
    cen = [
        r["m"]
        for r in (
            e.select(F.posexplode("__v").alias("i", "x"))
            .groupBy("i")
            .agg(F.avg("x").alias("m"))
            .orderBy("i")
            .collect()  # d rows — bounded by the embedding dimension
        )
    ]

    def cos_to(vec: list[float]):
        return F.round(
            cosine_similarity(F.col("__v"), F.lit(vec).cast("array<double>")),
            round_dp,
        )

    cur = e.withColumn("__rel", cos_to(cen)).withColumn(
        "__msim", F.lit(0.0)
    )
    score = F.round(
        F.lit(lam) * F.col("__rel") - F.lit(1.0 - lam) * F.col("__msim"),
        round_dp,
    )
    out = []
    for rank in range(1, k + 1):
        top = (
            cur.withColumn("__score", score)
            .orderBy(F.desc("__score"), id_col)
            .limit(1)
            .collect()
        )
        if not top:
            break
        t_ = top[0]
        out.append((rank, t_[id_col], t_["__rel"], t_["__score"]))
        cur = cur.where(F.col(id_col) != t_[id_col]).withColumn(
            "__msim",
            F.greatest("__msim", cos_to([float(x) for x in t_["__v"]])),
        )
        if rank % 3 == 0:
            cur = cur.localCheckpoint()  # bound fold-over-fold lineage
    # derive the id type from the input — a string/int32 id column
    # must round-trip, not coerce to bigint
    id_type = df.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        out, f"rank int, {id_col} {id_type}, relevance double, score double"
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = 4,
    iters: int = 2,
    threshold: float = 0.4,
    round_dp: int = 4,
    max_cluster: int = 10_000,
    target_cluster_size: int = 1_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedded corpus — cluster the embeddings, form
    candidate pairs ONLY within a cluster, and drop every vector that
    has an epsilon-similar (rounded cosine >= ``threshold``) LOWER-ID
    neighbor in its cluster, keeping one representative per duplicate
    neighborhood.  The modern training-data curation step between
    lexical dedup (MinHash) and quality filtering: it removes
    paraphrase- and template-level redundancy no n-gram method sees.

    Deterministic end-to-end, so the full per-vector decision is
    oracle-checkable: clustering is :func:`lloyd_clusters` (fixed
    init, rounded distances — assignments hash-match an unrolled-SQL
    mirror), the pair stage is cluster-bucketed through
    ``bounded_bucket_pairs`` (clusters are FEW and LARGE — the
    record-linkage regime — so bucket arrays and chunk-grid cells are
    spread round-robin; degenerate clusters chunk at ``max_cluster``),
    and cosine is an exact-double JVM fold rounded to ``round_dp``
    before the threshold compare (same discipline as
    ``embedding_near_dup_pairs``).

    At 100 TB scale ``k`` grows with the corpus (SemDeDup uses ~100k
    clusters for web-scale data) so |cluster| — and with it the
    within-cluster pair fanout — stays bounded; the clustering cost
    itself is one mean-agg exchange per iteration.  That scaling is
    ENFORCED, not just documented: ``k=None`` sizes the clustering as
    ``k = ceil(n / target_cluster_size)`` from a one-row count, so a
    growing corpus gets proportionally more clusters and the expected
    per-cluster pair fanout stays ~``target_cluster_size²/2`` per
    cluster regardless of corpus size (pinned by
    tests/test_r07.py::test_semantic_dedup_auto_k_bounds_fanout).

    Returns (id, cluster, kept): every input vector exactly once.
    """
    import math

    from python_mozetl_spark.ext.dedup import bounded_bucket_pairs

    if k is None:
        # one bounded 1-row aggregate — the same class of driver
        # action as the Lloyd centroid collects
        n = df.count()
        k = max(1, math.ceil(n / target_cluster_size))
    assign = lloyd_clusters(df, id_col, vec_col, k=k, iters=iters)
    vecs = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    ).localCheckpoint(eager=False)  # joined under the pair stage AND
    # re-read through assign's final pass — one source scan (§6b)
    banded = assign.join(vecs, id_col).select(
        F.col("cluster").alias("__bucket"),
        F.struct(F.col(id_col), F.col("__v")).alias("__p"),
    )
    shuffle_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    pairs = bounded_bucket_pairs(
        banded,
        "__bucket",
        "__p",
        key_field=id_col,
        max_bucket=max_cluster,
        spread_pairs=shuffle_parts,
    )
    va, vb = F.col("a.__v"), F.col("b.__v")
    # the guarded helper: 0.0 on a zero-norm side instead of an ANSI
    # DIVIDE_BY_ZERO abort (an all-zero embedding is a routine encoder/
    # truncation artifact, and it cannot be an epsilon-duplicate)
    from python_mozetl_spark.functions.vectors import cosine_similarity

    cos = F.round(cosine_similarity(va, vb), round_dp)
    dup_ids = (
        pairs.withColumn("__cos", cos)
        .where(F.col("__cos") >= threshold)
        # a.id < b.id by construction: b is the duplicate, a survives
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        assign.join(dup_ids, id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("kept"),
        )
    )


def cross_split_contamination(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reference: str = "train",
    splits: list[tuple[str, float]] | None = None,
    salt: str = "split",
    threshold: float = 0.4,
    precision: int = 4,
    rate_precision: int = 6,
) -> DataFrame:
    """Embedding-space eval-set contamination report: for every
    non-reference split, the share of its vectors that have at least
    one REFERENCE-split neighbor with rounded cosine >= ``threshold``
    — the semantic companion to the token-overlap decontaminator
    (``ext/quality.py:contamination_report``), catching paraphrased /
    re-encoded leakage that n-gram matching misses.

    Scale shape: pair enumeration delegates to
    :func:`embedding_near_dup_pairs` (BLAS matmul under the broadcast
    budget, pair join above it); each endpoint's split is recovered
    from the md5 ``split_expr`` — a pure function of the id — so NO
    join against a split table exists anywhere.  The report is two
    tiny hash aggs (distinct contaminated ids, per-split totals)
    joined broadcast.
    """
    from python_mozetl_spark.ext.mixing import split_expr

    pairs = embedding_near_dup_pairs(df, id_col, vec_col, threshold, precision)
    sa = split_expr(F.col("id_a"), splits, salt)
    sb = split_expr(F.col("id_b"), splits, salt)
    contaminated = (
        pairs.select(
            F.when((sa == reference) & (sb != reference), F.col("id_b"))
            .when((sb == reference) & (sa != reference), F.col("id_a"))
            .alias("__vid")
        )
        .where(F.col("__vid").isNotNull())
        .distinct()
        .groupBy(split_expr(F.col("__vid"), splits, salt).alias("split"))
        .agg(F.count(F.lit(1)).alias("contaminated"))
    )
    totals = (
        df.select(split_expr(F.col(id_col), splits, salt).alias("split"))
        .where(F.col("split") != reference)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
    return totals.join(F.broadcast(contaminated), "split", "left").select(
        "split",
        F.col("n_vectors").cast("bigint").alias("n_vectors"),
        F.coalesce("contaminated", F.lit(0)).cast("bigint").alias("contaminated"),
        F.round(
            F.coalesce("contaminated", F.lit(0)) / F.col("n_vectors"),
            rate_precision,
        ).alias("rate"),
    )


def zscore_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 20,
    precision: int = 6,
) -> DataFrame:
    """Top-k embedding outliers by diagonal-Mahalanobis (z-score L2)
    distance: standardize every dimension against the corpus
    (population mean/variance), score each vector by
    ``sqrt(sum_i (x_i - mu_i)^2 / var_i)`` (zero-variance dims
    contribute 0), and keep the k highest scores (rounded-score DESC,
    id tiebreak).  The outlier sweep a training-data pipeline runs
    before ingesting a new embedding batch.

    Scale shape: per-dimension moments come from one posexplode +
    d-group hash agg (map-side partials make the explode cheap); the
    d-row stats frame is collapsed to ONE row of index-aligned arrays
    and broadcast, so scoring is a within-row ``zip_with``/
    ``aggregate`` codegen expression over a second corpus scan — no
    per-vector shuffle.  Top-k is a global TakeOrderedAndProject;
    only the k survivors see the bounded re-rank window.
    """
    vec_d = F.col(vec_col).cast("array<double>")
    x = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.posexplode(vec_d).alias("i", "v"))
    )
    stats = x.groupBy("i").agg(
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    # d rows -> one row of index-aligned (means, vars) arrays; the
    # single-partition agg is bounded by the dimension, not the data.
    arrs = stats.groupBy().agg(
        F.expr(
            "transform(sort_array(collect_list(named_struct"
            "('i', i, 'm', s / n))), p -> p.m)"
        ).alias("__mu"),
        F.expr(
            "transform(sort_array(collect_list(named_struct"
            "('i', i, 'va', s2 / n - (s / n) * (s / n)))), p -> p.va)"
        ).alias("__var"),
    )
    scored = (
        df.where(F.col(vec_col).isNotNull())
        .crossJoin(F.broadcast(arrs))
        .select(
            F.col(id_col),
            (
                F.round(
                    F.sqrt(
                        F.aggregate(
                            F.zip_with(
                                F.zip_with(
                                    vec_d, F.col("__mu"), lambda v, m: v - m
                                ),
                                F.col("__var"),
                                lambda dvv, va: F.when(
                                    va > 0, dvv * dvv / va
                                ).otherwise(F.lit(0.0)),
                            ),
                            F.lit(0.0),
                            lambda acc, q: acc + q,
                        )
                    ),
                    precision,
                )
                + F.lit(0.0)
            ).alias("score"),
        )
    )
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


def gram_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    precision: int = 6,
) -> DataFrame:
    """Distributed covariance matrix of a vector column — the d x d
    building block of embedding whitening / PCA / Mahalanobis scoring
    at corpus scale.  Returns the upper triangle as ``(i, j, cov)``
    rows (0-based, ``i <= j``), with
    ``cov = E[x_i x_j] - E[x_i] E[x_j]`` (population form, biased-n
    denominator), rounded to ``precision`` decimals.

    Scale shape: each Arrow batch reduces to ONE partial-moment row
    (count, sum vector, flattened ``X.T @ X`` outer-product sum), so
    the only data that ever shuffles is numPartitions x (d^2 + d + 1)
    scalars regardless of corpus size.  The partials frame is
    localCheckpoint'd (three moment aggregates consume it — without
    staging, each would re-run the corpus scan; SCALE.md §6b); the
    moment assembly is posexplode + hash agg, and the covariance
    arithmetic is a codegen'd expression over broadcast-joined
    d-row / 1-row sides.  No driver collect anywhere — the matrix
    STAYS a DataFrame (d(d+1)/2 rows) for downstream joins.
    """

    def partial_moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [float(len(X))],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [(X.T @ X).ravel().tolist()],
                }
            )

    parts = (
        df.where(F.col(vec_col).isNotNull())
        .select(vec_col)
        .mapInPandas(partial_moments, "n double, s array<double>, ss array<double>")
        .localCheckpoint(eager=False)
    )
    total = parts.agg(F.sum("n").alias("n"))  # 1 row
    svec = (
        parts.select(F.posexplode("s").alias("i", "sv"))
        .groupBy("i")
        .agg(F.sum("sv").alias("s"))
    )  # d rows
    ssmat = (
        parts.select(F.size("s").alias("d"), F.posexplode("ss").alias("ij", "ssv"))
        .select(
            F.expr("ij DIV d").cast("int").alias("i"),
            F.expr("ij % d").cast("int").alias("j"),
            "ssv",
        )
        .where(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(F.sum("ssv").alias("ss"))
    )  # d(d+1)/2 rows
    a, b = svec.alias("a"), svec.alias("b")
    return (
        ssmat.crossJoin(F.broadcast(total))
        .join(F.broadcast(a), ssmat["i"] == F.col("a.i"))
        .join(F.broadcast(b), ssmat["j"] == F.col("b.i"))
        .select(
            ssmat["i"],
            ssmat["j"],
            # + 0.0 normalizes IEEE -0.0 to +0.0 (cross-engine parity)
            (
                F.round(
                    F.col("ss") / F.col("n")
                    - (F.col("a.s") / F.col("n")) * (F.col("b.s") / F.col("n")),
                    precision,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )
