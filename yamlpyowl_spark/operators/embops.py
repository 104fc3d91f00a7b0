"""Embedding operators: brute-force cosine top-k (baseline), random-
hyperplane LSH bucketing, and IVF-style centroid assignment (the scale
path). All arithmetic is JVM-side double math over the float vectors
via higher-order functions — identical evaluation order to the DuckDB
oracle replication (sequential left fold), so scaled-integer outputs
match bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

EMB_DIM = 64
N_PLANES = 8


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0 as double), (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(
        F.expr(
            f"aggregate({a}, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))"
        )
    )


def deterministic_planes(n_planes: int = N_PLANES, dim: int = EMB_DIM):
    """Pseudo-random hyperplanes derived from md5 — reproducible in any
    engine without a RNG: component c of plane p is
    (md5_byte(p,c) / 255) * 2 - 1."""
    planes = []
    for p in range(n_planes):
        comps = []
        for c in range(dim):
            h = hashlib.md5(f"plane:{p}:{c}".encode()).hexdigest()
            comps.append((int(h[:2], 16) / 255.0) * 2.0 - 1.0)
        planes.append(comps)
    return planes


def cosine_topk(emb: DataFrame, n_queries: int = 8, k: int = 3) -> DataFrame:
    """Brute-force cosine top-k: queries = vec_id < n_queries against
    the full table. The query side is tiny → broadcast it; the scan
    side streams once. Output (query_id, neighbor_id, rank,
    cos_x1e6).

    Norms are projected ONCE per row on each side before the join
    (r7): inlining ``_norm`` into the post-join expression re-runs the
    64-element fold per PAIR — n_queries× per neighbor row — for the
    same double (the fold is deterministic, so hoisting it cannot
    change a bit of ``cos_x1e6``)."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm("embedding").alias("q_nrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        _norm("embedding").alias("c_nrm"),
    )
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_x1e6",
            F.round(_dot("q_emb", "c_emb") / (F.col("q_nrm") * F.col("c_nrm")) * 1e6).cast(
                "bigint"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_x1e6").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_x1e6")
    )


def _bucket_sig(n_planes: int = N_PLANES):
    """Sign-of-dot-product bucket expression over ``embedding``."""
    planes = deterministic_planes(n_planes)
    sig = None
    for p, comps in enumerate(planes):
        arr = "array(" + ", ".join(f"cast({v!r} as double)" for v in comps) + ")"
        dot = F.expr(
            f"aggregate(zip_with(embedding, {arr}, (x, y) -> cast(x as double) * y), "
            f"cast(0 as double), (acc, v) -> acc + v)"
        )
        bit = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("bigint")


def lsh_buckets(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Sign-of-dot-product signature per vector → bucket id. At scale,
    ANN = equi-join on the bucket instead of a cross join."""
    return emb.select("vec_id", "label", _bucket_sig(n_planes).alias("bucket"))


def near_dup_pairs(emb: DataFrame, min_cos_x1e6: int = 250_000) -> DataFrame:
    """Embedding-cosine near-duplicate candidates: the scale path —
    LSH-bucket equi-join (never an all-pairs product) then exact cosine
    on candidates only. Returns (vec_a, vec_b, cos_x1e6).

    r7 restructure (guide §2.3/§2.4): the bucket signature, embedding
    and the vector's norm are projected in ONE scan — the previous
    shape re-joined ``lsh_buckets`` output to ``emb`` on vec_id (a full
    extra shuffle join just to re-attach a column the same scan already
    had), and re-ran the 64-element norm fold per candidate PAIR
    instead of per vector (the fold is deterministic, so hoisting
    cannot change ``cos_x1e6``). The final ``distinct()`` is dropped:
    each vector has exactly ONE bucket row, so a pair can match at most
    once — the pairs are unique by construction (the oracle SQL has no
    DISTINCT either)."""
    # materialize once — the self-join would otherwise evaluate the
    # bucket signatures twice (no exchange reuse via broadcast)
    b = emb.select(
        "vec_id",
        _bucket_sig().alias("bucket"),
        "embedding",
        _norm("embedding").alias("nrm"),
    ).localCheckpoint()
    pairs = (
        b.alias("x")
        .join(b.alias("y"), "bucket")
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            F.col("x.embedding").alias("ea"),
            F.col("y.embedding").alias("eb"),
            F.col("x.nrm").alias("na"),
            F.col("y.nrm").alias("nb"),
        )
    )
    cos = F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")) * 1e6).cast("bigint")
    return (
        pairs.withColumn("cos_x1e6", cos)
        .filter(F.col("cos_x1e6") >= min_cos_x1e6)
        .select("vec_a", "vec_b", "cos_x1e6")
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: each query searches only the
    ``n_probe`` nearest centroid lists instead of the full table — the
    scale path for ANN (cost ≈ n_probe/n_centroids of a full scan per
    query, with the candidate fetch an equi-join on centroid_id, never
    a cross join against the big side). Approximate by design: a true
    neighbor assigned to an unprobed list is missed — that's the
    recall/cost dial every IVF index exposes.

    Output (query_id, neighbor_id, rank, cos_x1e6)."""
    assign = centroid_assign(emb, n_centroids).select("vec_id", "centroid_id")
    cents = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cent")
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm("embedding").alias("q_nrm"),
    )
    qd2 = F.expr(
        "aggregate(zip_with(q_emb, cent, (x, y) -> "
        "(cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
        "cast(0 as double), (acc, v) -> acc + v)"
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qd2_x1e6").asc(), F.col("centroid_id").asc()
    )
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .withColumn("qd2_x1e6", F.round(qd2 * 1e6).cast("bigint"))
        .withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= n_probe)
        .select("query_id", "q_emb", "q_nrm", "centroid_id")
    )
    # candidate-side norm hoisted to one fold per VECTOR (r7): the
    # deterministic 64-element fold yields the same double whether run
    # per vector or per (query, candidate) pair — only the eval count
    # changes (n_probe-bounded candidates × queries → one per vector)
    cand = (
        probes.join(assign, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(
            emb.select(
                "vec_id",
                F.col("embedding").alias("c_emb"),
                _norm("embedding").alias("c_nrm"),
            ),
            "vec_id",
        )
    )
    cos = F.round(_dot("q_emb", "c_emb") / (F.col("q_nrm") * F.col("c_nrm")) * 1e6).cast(
        "bigint"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_x1e6").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("cos_x1e6", cos)
        .withColumnRenamed("vec_id", "neighbor_id")
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_x1e6")
    )


def centroid_assign(emb: DataFrame, n_centroids: int = 8) -> DataFrame:
    """IVF-style one-pass assignment to fixed seed centroids (the
    first n vectors by vec_id) — broadcast the centroids, one scan,
    no shuffle on the big side. Output (vec_id, centroid_id,
    dist2_x1e6)."""
    cents = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cent")
    )
    d2 = F.expr(
        "aggregate(zip_with(embedding, cent, (x, y) -> "
        "(cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
        "cast(0 as double), (acc, v) -> acc + v)"
    )
    # argmin via min(struct(dist, id)): lexicographic struct-min gives
    # the deterministic (dist asc, centroid_id asc) winner with map-side
    # partial aggregation — no per-vec_id window sort (r2 verdict #8)
    best = F.min(F.struct(F.col("dist2_x1e6"), F.col("centroid_id"))).alias("best")
    return (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("dist2_x1e6", F.round(d2 * 1e6).cast("bigint"))
        .groupBy("vec_id")
        .agg(best)
        .select(
            "vec_id",
            F.col("best.centroid_id").alias("centroid_id"),
            F.col("best.dist2_x1e6").alias("dist2_x1e6"),
        )
    )
