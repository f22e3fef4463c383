"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  One pass, map-side only + a top-k reduction (TakeOrdered), no shuffle
  of the full table.
- ``signlsh_topk``: the scale path — random-hyperplane (sign) LSH with
  *deterministic, data-independent* hyperplanes derived from md5, so the
  bucketing is reproducible in any engine.  The query probes only its
  own bucket (optionally neighboring buckets by Hamming distance ≤ 1),
  turning a full scan into a partition-pruned candidate set; at 100 TB
  the bucket id becomes a partition/cluster key.

All arithmetic is done in float64 via built-in higher-order functions
(zip_with/aggregate) — JVM-side, no Python UDFs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dot", "norm", "cosine", "cosine_topk", "hyperplanes",
           "signlsh_bucket", "signlsh_topk", "query_bucket",
           "write_bucketed", "signlsh_topk_bucketed",
           "ivf_centroids", "ivf_cell", "ivf_topk",
           "embedding_neardup_pairs"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero vector has norm 0 — cosine is then NULL in both
    # ANSI modes (bare `/` raises DIVIDE_BY_ZERO under the Spark 4 ANSI
    # default; the DuckDB oracle yields NULL).
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def _qlit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def _require_dim(dim: int | None, vec_col: str) -> int:
    """Spark's ArrayType carries no element count, and sniffing it with a
    ``.first()`` would trigger a Spark job at plan-BUILD time (a hidden
    driver round-trip on a 100-TB table).  Make the caller state it."""
    if dim is None:
        raise ValueError(
            f"dim= is required: the length of {vec_col!r} cannot be read "
            "from the schema (ArrayType has no element count) and will "
            "not be sniffed with a driver-side action at plan-build time"
        )
    return int(dim)


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id"
                ) -> DataFrame:
    """Exact brute-force cosine top-k (ties broken by id)."""
    from .util import fan_out

    q = _qlit(query_vec)
    scored = fan_out(df).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def hyperplanes(dim: int, n_planes: int, seed: str = "signlsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]: component (p, i)
    comes from md5(f"{seed}:{p}:{i}") — reproducible in any engine and in
    plain Python (used to embed the same constants in oracle SQL)."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()
            v = (int(h[:8], 16) % 2001 - 1000) / 1000.0
            row.append(v)
        planes.append(row)
    return planes


def signlsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id = bits of sign(plane · vec)."""
    out = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        d = dot(vec, _qlit(plane))
        out = out + F.when(d > 0, F.lit(2 ** p)).otherwise(F.lit(0))
    return out


def query_bucket(query_vec: list[float], n_planes: int = 4,
                 dim: int | None = None) -> int:
    """The LSH bucket a query vector falls into (plain-Python twin of
    :func:`signlsh_bucket` — same md5-derived hyperplanes)."""
    dim = dim or len(query_vec)
    planes = hyperplanes(dim, n_planes)
    qbits = 0
    for p, plane in enumerate(planes):
        if sum(a * float(b) for a, b in zip(plane, query_vec)) > 0:
            qbits += 2 ** p
    return qbits


def write_bucketed(df: DataFrame, path: str, vec_col: str = "embedding",
                   id_col: str = "vec_id", n_planes: int = 4,
                   dim: int | None = None) -> None:
    """The 100-TB write path: materialize the LSH bucket id as a parquet
    PARTITION column, so a query probes only its bucket's files (real
    partition pruning at the scan, ~1/2^n_planes of the data) instead of
    computing buckets over a full scan per query."""
    planes = hyperplanes(_require_dim(dim, vec_col), n_planes)
    (
        df.withColumn("bucket", signlsh_bucket(F.col(vec_col), planes))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def signlsh_topk_bucketed(spark, path: str, query_vec: list[float],
                          k: int = 10, vec_col: str = "embedding",
                          id_col: str = "vec_id", n_planes: int = 4,
                          probe_adjacent: bool = False) -> DataFrame:
    """Top-k over a :func:`write_bucketed` table.  The bucket filter is a
    partition-column predicate — Catalyst prunes non-matching partitions
    before any file is opened.  ``probe_adjacent`` also scans buckets at
    Hamming distance 1 (better recall, n_planes+1 partitions scanned)."""
    qbits = query_bucket(query_vec, n_planes)
    buckets = [qbits]
    if probe_adjacent:
        buckets += [qbits ^ (1 << p) for p in range(n_planes)]
    df = spark.read.parquet(path)
    q = _qlit(query_vec)
    return (
        df.filter(F.col("bucket").isin(buckets))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id", n_planes: int = 4,
                            dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs WITHOUT the O(n²) cross
    join: vectors are sign-LSH bucketed (near-identical vectors land in
    the same bucket with high probability), candidates are the
    within-bucket pairs via a self-equi-join on the bucket id, and exact
    cosine verifies each candidate.  Returns (id_a, id_b, cos_sim) with
    id_a < id_b and cos_sim >= threshold.

    At 100 TB: the join shuffles on the bucket id (2^n_planes uniform-ish
    cells — raise n_planes to shrink cells), and only candidate pairs pay
    the exact-cosine cost."""
    planes = hyperplanes(_require_dim(dim, vec_col), n_planes)
    # norms are computed ONCE per row before the join — computing
    # cosine() per pair would re-traverse both arrays for the norms,
    # tripling the per-candidate cost
    from .util import fan_out

    bucketed = fan_out(df).select(
        F.col(id_col), F.col(vec_col),
        signlsh_bucket(F.col(vec_col), planes).alias("__bucket"),
        norm(F.col(vec_col)).alias("__norm"),
    )
    a = bucketed.select(
        F.col("__bucket"), F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"), F.col("__norm").alias("na"),
    )
    b = bucketed.select(
        F.col("__bucket"), F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"), F.col("__norm").alias("nb"),
    )
    return (
        a.join(b, on="__bucket", how="inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(
                F.try_divide(
                    dot(F.col("va"), F.col("vb")),
                    F.col("na") * F.col("nb"),
                ), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_centroids(dim: int, n_cells: int, seed: str = "ivf"
                  ) -> list[list[float]]:
    """Deterministic, data-independent coarse quantizer: unit-normalized
    md5-derived centroid directions (same recipe as :func:`hyperplanes`,
    then L2-normalized).  A trained k-means quantizer clusters tighter,
    but a fixed quantizer is reproducible in ANY engine — the property
    the correctness oracle needs — and the probing math is identical."""
    raw = hyperplanes(dim, n_cells, seed)
    out = []
    for row in raw:
        n = sum(v * v for v in row) ** 0.5 or 1.0
        out.append([v / n for v in row])
    return out


def ivf_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Cell id = argmax over centroids of (centroid · vec), ties to the
    lower cell id — the inverted-file assignment."""
    best_id = F.lit(0)
    best_d = dot(vec, _qlit(centroids[0]))
    for c, cen in enumerate(centroids[1:], start=1):
        d = dot(vec, _qlit(cen))
        is_better = d > best_d
        best_id = F.when(is_better, F.lit(c)).otherwise(best_id)
        best_d = F.when(is_better, d).otherwise(best_d)
    return best_id


def ivf_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             n_cells: int = 8, nprobe: int = 2,
             dim: int | None = None) -> DataFrame:
    """IVF-style approximate top-k: score only vectors whose cell is one
    of the query's ``nprobe`` closest cells — scans ~nprobe/n_cells of
    the data.  At scale, materialize the cell id as a partition key
    (same pattern as :func:`write_bucketed`) for real pruning."""
    dim = dim or len(query_vec)
    centroids = ivf_centroids(dim, n_cells)
    scores = [
        (sum(a * float(b) for a, b in zip(cen, query_vec)), c)
        for c, cen in enumerate(centroids)
    ]
    # ties to the lower cell id, like ivf_cell
    probe = [c for _, c in sorted(scores, key=lambda t: (-t[0], t[1]))][:nprobe]
    q = _qlit(query_vec)
    from .util import fan_out

    celled = fan_out(df).withColumn(
        "__cell", ivf_cell(F.col(vec_col), centroids)
    )
    return (
        celled.filter(F.col("__cell").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def signlsh_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 n_planes: int = 4, dim: int | None = None) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.
    With B buckets this scans ~1/B of the data; at scale, use
    :func:`write_bucketed` + :func:`signlsh_topk_bucketed` for real
    partition pruning."""
    dim = dim or len(query_vec)
    planes = hyperplanes(dim, n_planes)
    qbits = query_bucket(query_vec, n_planes, dim)
    q = _qlit(query_vec)
    from .util import fan_out

    bucketed = fan_out(df).withColumn(
        "__bucket", signlsh_bucket(F.col(vec_col), planes)
    )
    return (
        bucketed.filter(F.col("__bucket") == F.lit(qbits))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
