"""Similarity search over embedding columns.

- Brute-force cosine top-k: query set broadcast against the corpus; dot
  products as JVM-side array folds (zip_with + aggregate). This is the
  exact baseline — O(|Q| x N), fine when |Q| is small or as the
  per-bucket step below.
- IVF-style bucketed ANN: assign vectors to coarse buckets (hash of the
  dominant dimensions — a stand-in for trained centroids, which would be
  a k-means fit); queries probe only their bucket(s). Sub-linear scan at
  scale, approximate recall.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order — oracle-parity)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm_sq(a: Column) -> Column:
    return F.aggregate(F.transform(a, lambda x: x * x),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     round_to: int = 6) -> DataFrame:
    """Exact cosine top-k: (qid, nid, rank, sim). Queries are broadcast;
    ranking is deterministic (rounded sim desc, then neighbor id)."""
    c = corpus.select(F.col(id_col).alias("nid"),
                      as_double(F.col(vec_col)).alias("nv"))
    q = queries.select(F.col(id_col).alias("qid"),
                       as_double(F.col(vec_col)).alias("qv"))
    pairs = (c.crossJoin(broadcast(q))
              .where(F.col("nid") != F.col("qid"))
              .select("qid", "nid",
                      F.round(cosine(F.col("qv"), F.col("nv")), round_to)
                      .alias("sim")))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (pairs.withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= k)
                 .select("qid", "nid", "rank", "sim"))


_SIGN_BITS = 6


def _signs(vec_col: str) -> Column:
    v = as_double(F.col(vec_col))
    return F.transform(F.slice(v, 1, _SIGN_BITS),
                       lambda x: F.when(x > 0, 1).otherwise(0))


def _bucket_of(signs: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(F.concat_ws(",", signs.cast("array<string>"))),
                  F.lit(n_buckets))


def ivf_assign(df: DataFrame, n_buckets: int = 64,
               vec_col: str = "embedding") -> DataFrame:
    """Coarse bucket assignment: hash of the signs of the first 6
    components (cheap LSH-style random-hyperplane stand-in; a production
    fit would use k-means centroids trained on a sample)."""
    return df.withColumn("bucket", _bucket_of(_signs(vec_col), n_buckets))


def ivf_probe_buckets(vec_col: str, n_buckets: int,
                      n_probes: int) -> Column:
    """Multi-probe LSH bucket list for a query vector: its own bucket
    plus the buckets of one-bit-flipped sign patterns (the standard
    multi-probe trick — neighbors that straddle one hyperplane land one
    flip away). Returns the first n_probes distinct buckets."""
    signs = _signs(vec_col)
    idx = F.sequence(F.lit(0), F.lit(_SIGN_BITS - 1))

    def _flip_at(i: int):
        return lambda x, j: F.when(j == i, 1 - x).otherwise(x)

    variants = [signs]
    for i in range(_SIGN_BITS):
        variants.append(F.zip_with(signs, idx, _flip_at(i)))
    buckets = F.array_distinct(
        F.array(*[_bucket_of(v, n_buckets) for v in variants]))
    return F.slice(buckets, 1, n_probes)


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int,
             n_buckets: int = 64, id_col: str = "vec_id",
             vec_col: str = "embedding", n_probes: int = 4) -> DataFrame:
    """Bucketed ANN: per-bucket brute force — each query meets corpus
    vectors in its n_probes multi-probe buckets (equi-join on bucket,
    not a cross join; probe fraction ≈ n_probes/n_buckets of the
    corpus per query)."""
    c = ivf_assign(corpus, n_buckets, vec_col).select(
        F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv"), "bucket")
    q = (queries.select(F.col(id_col).alias("qid"),
                        as_double(F.col(vec_col)).alias("qv"),
                        F.explode(ivf_probe_buckets(vec_col, n_buckets,
                                                    n_probes)).alias("bucket")))
    pairs = (c.join(broadcast(q), "bucket")
              .where(F.col("nid") != F.col("qid"))
              .select("qid", "nid",
                      F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("sim"))
              .dropDuplicates(["qid", "nid"]))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (pairs.withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= k)
                 .select("qid", "nid", "rank", "sim"))
