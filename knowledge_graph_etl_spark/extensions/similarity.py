"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set, score every corpus row with a JVM-side ``aggregate``/``zip_with``
  dot product, per-query top-k via window ranking. At 100 TB the corpus
  side stays partition-parallel with NO shuffle until the final per-query
  k-row reduction (rank prune happens map-side via AQE).
* ``lsh_topk`` — random-hyperplane (signed projection) LSH: corpus and
  queries hash to sign-pattern buckets; only same-bucket pairs are scored.
  The scale path when the query set itself is large.
* ``ivf_topk`` — IVF-style coarse quantization: k-means-free variant using
  deterministic seed centroids (sampled rows), assign every vector to its
  nearest centroid (broadcast centroids), probe ``nprobe`` nearest lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k per query. The query side is
    broadcast — the corpus is never shuffled for the join."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold) — EXACT, via block-partitioned matrix products.

    Vectors are grouped into ``block_size``-row blocks; every block pair
    (ba ≤ bb) is scored with ONE vectorized numpy GEMM inside an
    Arrow-batched ``mapInPandas`` (~dim·bs² FLOPs per task — dense linear
    algebra is the one place numpy beats JVM expressions by orders of
    magnitude). Scale: work = (N/bs)²/2 independent tasks; each task's
    input is two ~bs·dim float blocks, so the shuffle carries each block
    N/bs times — bound it by raising ``block_size`` as N grows. For
    approximate-but-linear candidate generation use the
    :func:`lsh_topk`-style signed-projection buckets instead."""
    import numpy as np
    import pandas as pd

    blk = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    blk = blk.withColumn(
        "bk", F.floor(F.col("id").cast("long") / F.lit(block_size)).cast("int")
    )
    packed = blk.groupBy("bk").agg(
        F.collect_list("id").alias("ids"),
        F.collect_list("vec").alias("vecs"),
    )
    a = packed.select(
        F.col("bk").alias("bka"), F.col("ids").alias("ids_a"), F.col("vecs").alias("vecs_a")
    )
    b = packed.select(
        F.col("bk").alias("bkb"), F.col("ids").alias("ids_b"), F.col("vecs").alias("vecs_b")
    )
    block_pairs = a.join(b, F.col("bka") <= F.col("bkb"))
    thr = float(threshold)

    def score(batches):
        for pdf in batches:
            out_a, out_b, out_s = [], [], []
            for _, row in pdf.iterrows():
                ids_a = np.asarray(row["ids_a"])
                ids_b = np.asarray(row["ids_b"])
                ma = np.asarray([np.asarray(v, dtype=np.float64) for v in row["vecs_a"]])
                mb = np.asarray([np.asarray(v, dtype=np.float64) for v in row["vecs_b"]])
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                sims = (ma @ mb.T) / np.outer(na, nb)
                sims = np.round(sims, 6)
                ia, ib = np.where(sims >= thr)
                keep = ids_a[ia] < ids_b[ib]
                out_a.extend(ids_a[ia][keep])
                out_b.extend(ids_b[ib][keep])
                out_s.extend(sims[ia, ib][keep])
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "cosine_sim": out_s}
            )

    return block_pairs.mapInPandas(
        score, schema="id_a long, id_b long, cosine_sim double"
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from a hash mix —
    no numpy on executors, computed once on the driver."""
    import math

    vals = []
    x = seed * 2654435761 % (2**32)
    for i in range(dim):
        x = (x * 6364136223846793005 + 1442695040888963407) % (2**64)
        vals.append(((x >> 16) % 20001 - 10000) / 10000.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def signed_projection_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bits of dot products with fixed hyperplanes."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(v) for v in plane])
        bit = F.when(_dot(vec, arr) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + bit * F.lit(2**i)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    num_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket with
    the query in any of ``num_tables`` tables. Recall grows with tables;
    cost is bucket-local. The bucket join shuffles on (table, bucket) —
    uniform by construction."""
    tables = [
        [_hyperplane(dim, t * 1000 + i) for i in range(num_planes)]
        for t in range(num_tables)
    ]

    def bucketize(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        return df.select(
            F.col(idc).alias(out_id),
            F.col(vec_col).alias(f"{out_id}_vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            signed_projection_bucket(F.col(vec_col), tables[t]).alias(
                                "bucket"
                            ),
                        )
                        for t in range(num_tables)
                    ]
                )
            ).alias("tb"),
        ).select(out_id, f"{out_id}_vec", "tb.tbl", "tb.bucket")

    cb = bucketize(corpus, id_col, "neighbor_id")
    qb = bucketize(queries, query_id_col, "query_id")
    cand = cb.join(
        F.broadcast(qb), on=["tbl", "bucket"], how="inner"
    ).dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("query_id_vec"), F.col("neighbor_id_vec")), 6).alias(
            "cosine_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-flat: centroids = deterministic sample of corpus vectors;
    every corpus vector is assigned to its nearest centroid (one broadcast
    pass); each query probes its ``nprobe`` nearest lists. Scale: the
    corpus scan is one map; the probe join hits ~nprobe/nlist of the data."""
    cents = [
        (i, r[0])
        for i, r in enumerate(
            corpus.select(vec_col).orderBy(F.col(id_col)).limit(nlist).collect()
        )
    ]

    def nearest_lists(vec: Column, n: int) -> Column:
        scored = F.array(
            *[
                F.struct(
                    (-cosine(vec, F.array(*[F.lit(float(x)) for x in cvec]))).alias(
                        "negsim"
                    ),
                    F.lit(ci).alias("list_id"),
                )
                for ci, cvec in cents
            ]
        )
        return F.slice(F.sort_array(scored), 1, n)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        nearest_lists(F.col(vec_col), 1)[0]["list_id"].alias("list_id"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(
            F.transform(
                nearest_lists(F.col(vec_col), nprobe), lambda s: s["list_id"]
            )
        ).alias("list_id"),
    )
    scored = c.join(F.broadcast(q), "list_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
