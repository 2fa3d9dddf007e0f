"""Similarity search over embedding columns (``array<float>``).

- ``knn_brute``: exact cosine top-k — one map stage + global top-k
  (Spark's TakeOrderedAndProject: per-partition heaps, no full sort).
- ``knn_lsh``: random-hyperplane-bucketed ANN — prune to the probe's
  bucket (and optional multi-probe neighbors), then exact cosine. At
  100 TB the bucket column would be a partition/bucketing key so the scan
  prunes to a handful of files.
- ``knn_ivf``: IVF-style coarse quantization: k-means-ish centroid
  assignment (deterministic seeded sample as centroids), search only the
  ``n_probe`` nearest cells.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .dedup import _dot, _norm, cosine, hyperplane_bucket


def _probe_lit(vec):
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_to(vec_col, probe_vec):
    """Cosine similarity of each row's vector against a python list."""
    p = _probe_lit(probe_vec)
    return _dot(vec_col, p) / (_norm(vec_col) * _norm(p))


def knn_brute(df, probe_vec, k=10, vec_col="embedding", id_col="vec_id"):
    """Exact top-k by cosine: map + TakeOrderedAndProject (no shuffle of
    the vectors; only k rows per partition reach the driver-side merge)."""
    sim = cosine_to(F.col(vec_col), probe_vec)
    return (
        df.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_lsh(df, probe_vec, k=10, vec_col="embedding", id_col="vec_id",
            dim=64, n_planes=8, seed=42, multiprobe=1):
    """ANN: restrict to rows whose hyperplane bucket is within
    ``multiprobe`` bit-flips of the probe's bucket, then exact cosine."""
    bucket = hyperplane_bucket(F.col(vec_col), dim, n_planes, seed)
    probe_df_bucket = hyperplane_bucket(_probe_lit(probe_vec), dim,
                                        n_planes, seed)
    tagged = df.select(
        F.col(id_col), F.col(vec_col), bucket.alias("__bucket"),
        probe_df_bucket.alias("__pbucket"),
    )
    dist = F.bit_count(
        F.col("__bucket").bitwiseXOR(F.col("__pbucket"))
    )
    cand = tagged.filter(dist <= multiprobe)
    sim = cosine_to(F.col(vec_col), probe_vec)
    return (
        cand.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_ivf(df, probe_vec, k=10, vec_col="embedding", id_col="vec_id",
            n_cells=16, n_probe=4, seed=42):
    """IVF-flat ANN: centroids = deterministic sample of the corpus
    (cheap stand-in for k-means; swap in MLlib KMeans for production),
    rows assigned to nearest centroid (map-side crossjoin against a
    broadcast centroid table), probe searches only ``n_probe`` cells."""
    centroids = (
        df.select(F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv"))
        .orderBy(F.xxhash64(F.col("__cid"), F.lit(seed)))
        .limit(n_cells)
    )
    cent = F.broadcast(centroids)
    assigned = (
        df.join(cent)
        .withColumn("__sim_c", cosine(F.col(vec_col), F.col("__cv")))
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("__sim_c").desc(), F.col("__cid").asc()
                )
            ),
        )
        .filter(F.col("__rk") == 1)
        .select(id_col, vec_col, F.col("__cid").alias("__cell"))
    )
    probe_cells = (
        centroids.withColumn(
            "__psim", cosine_to(F.col("__cv"), probe_vec)
        )
        .orderBy(F.col("__psim").desc(), F.col("__cid").asc())
        .limit(n_probe)
        .select(F.col("__cid").alias("__cell"))
    )
    cand = assigned.join(F.broadcast(probe_cells), on="__cell")
    sim = cosine_to(F.col(vec_col), probe_vec)
    return (
        cand.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
