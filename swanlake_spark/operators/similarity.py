"""Similarity search over embedding columns (``array<float>``).

Two paths, per the standard ANN playbook:

- ``cosine_topk``       — brute-force exact top-k. All math is built-in
  (``zip_with`` + ``aggregate`` in double precision, JVM-side), one
  narrow pass + a TakeOrderedAndProject; the 100 TB baseline.
- ``cosine_topk_lsh``   — random-hyperplane LSH prefilter: sign-bit
  signatures bucket the vectors; only same/near buckets are re-ranked
  exactly. Hyperplanes are seeded deterministically (numpy seed=42) and
  shipped as literal arrays (broadcast by Catalyst).
- ``cosine_near_pairs`` — all-pairs near-duplicate detection by bucket
  equi-join + exact verification (embedding near-dup dedup).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from swanlake_spark.operators._arraylit import darray


def _as_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a, b) -> Column:
    """Double-precision dot product of two array columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (id, sim) ordered by
    (sim DESC, id). Catalyst executes this as a single scan +
    TakeOrderedAndProject — no shuffle of the full table, only the
    per-partition top-k rows move."""
    import math

    q = darray(query_vec)
    # The query norm is a constant: computing it driver-side (same
    # left-to-right double summation as the JVM aggregate → identical
    # bits) saves one interpreted higher-order aggregate per ROW.
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    scored = df.select(
        F.col(id_col),
        F.round(
            dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * F.lit(qn)), 4
        ).alias("sim"),
    )
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((planes, dim))


def lsh_bucket(vec_col, planes: np.ndarray) -> Column:
    """Random-hyperplane signature: one bit per plane (sign of dot).

    Built as ONE nested higher-order expression — fold over the 2-D
    plane literal, inner left-fold dot per plane — instead of one
    aggregate+zip_with pair per plane: a 12-plane signature is ~5 py4j
    higher-order constructions instead of ~25 (~0.5 s of driver time
    per plan build at 12x64). Bit-identical to the unrolled form: the
    per-plane dot is the same left-to-right double fold, the bucket is
    the same exact-integer sum of ``1 << i`` terms in plane order."""
    v = _as_double(vec_col)
    planes2d = darray(planes)
    powers = F.expr(
        "array(%s)" % ",".join(str(1 << i) + "L" for i in range(len(planes)))
    )
    zero = F.lit(0).cast("long")
    return F.aggregate(
        F.zip_with(
            planes2d,
            powers,
            lambda p, w: F.when(
                F.aggregate(
                    F.zip_with(v, p, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                > 0,
                w,
            ).otherwise(zero),
        ),
        zero,
        lambda a, x: a + x,
    )


def cosine_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: prefilter to vectors whose LSH bucket is within
    Hamming distance 1 of the query's bucket, then exact re-rank. At
    scale the bucket column is precomputed and partitioned on, making
    the probe a partition-pruned scan."""
    dim = dim or len(query_vec)
    hp = _hyperplanes(dim, planes)
    qsig = 0
    for i, plane in enumerate(hp):
        if float(np.dot(plane, np.asarray(query_vec, dtype=float))) > 0:
            qsig |= 1 << i
    bucketed = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), hp))
    cand = bucketed.filter(
        F.bit_count(F.col("_bucket").bitwiseXOR(F.lit(qsig))) <= 1
    )
    q = darray(query_vec)
    scored = cand.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 4).alias("sim")
    )
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


# -- IVF (inverted-file) ANN — the partitioned scale path --------------------


def ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 1,
) -> list[list[float]]:
    """Deterministic IVF codebook: seed with the vectors of the
    ``n_centroids`` lowest ids, then ``refine_iters`` distributed Lloyd
    steps (assign → per-cluster mean). The mean is computed as
    posexplode → groupBy(cid, pos) avg — a shuffle of
    O(rows × dim) scalars with full map-side combine; only
    n_centroids × dim aggregates come back to the driver."""
    seed_rows = (
        df.select(id_col, _as_double(vec_col).alias("v"))
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    cents = [list(r.v) for r in seed_rows]
    for _ in range(refine_iters):
        assigned = ivf_assign(df, cents, id_col, vec_col)
        means = (
            assigned.select(F.col("_cid"), F.posexplode(_as_double(vec_col)))
            .groupBy("_cid", "pos")
            .agg(F.avg("col").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            # 9-decimal rounding removes the last-bit jitter from the
            # arrival order of partial-aggregate merges (float addition
            # is not associative), making the codebook — and everything
            # scored against it — bit-stable across runs.
            by_cid.setdefault(r._cid, {})[r.pos] = round(r.m, 9)
        cents = [
            [by_cid[c][p] for p in sorted(by_cid[c])] if c in by_cid else cents[c]
            for c in range(len(cents))
        ]
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``_cid`` — the index of the nearest (cosine) centroid.
    Centroids ship as one literal array-of-arrays (broadcast with the
    plan); assignment is a single narrow pass, no shuffle. At scale the
    assigned table is written partitioned by ``_cid`` so probes prune
    partitions."""
    import math

    cents = darray(centroids)
    # centroid norms are driver-side constants (same left-to-right
    # double summation as the JVM fold → identical bits — the
    # cosine_topk precedent); norm(v) is LET-BOUND via the
    # single-element transform idiom so it folds once per row, not
    # once per centroid (Catalyst does no CSE through lambda bodies —
    # the old form re-ran the interpreted norm fold n_centroids times
    # per row, 3x the arithmetic of the assignment itself).
    cnorms = darray(
        [math.sqrt(sum(float(x) * float(x) for x in c)) for c in centroids]
    )
    v = _as_double(vec_col)
    sims = F.element_at(
        F.transform(
            F.array(norm(v)),
            lambda nv: F.zip_with(
                cents, cnorms, lambda c, nc: dot(v, c) / (nv * nc)
            ),
        ),
        F.lit(1),
    )
    cid = F.array_position(sims, F.array_max(sims)) - 1
    return df.withColumn("_cid", cid.cast("int"))


def cosine_topk_ivf(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: score the query against the codebook
    driver-side, probe only the ``n_probe`` nearest inverted lists, and
    exact-re-rank inside them. With the assigned table partitioned by
    ``_cid``, the probe reads n_probe/n_centroids of the data —
    the standard ANN scale path next to the LSH variant."""
    cents = centroids or ivf_centroids(df, n_centroids, id_col, vec_col)
    qv = np.asarray(query_vec, dtype=float)
    qn = float(np.linalg.norm(qv)) or 1.0
    sims = [
        float(np.dot(qv, np.asarray(c)) / (qn * (np.linalg.norm(c) or 1.0)))
        for c in cents
    ]
    probe = sorted(range(len(cents)), key=lambda i: -sims[i])[:n_probe]
    # A pre-assigned (indexed) input skips re-assignment — and when it
    # is an ivf_write_index layout, the _cid filter is a PARTITION
    # filter: the probe physically reads n_probe/n_centroids of the
    # files (plan-asserted in tests).
    assigned = df if "_cid" in df.columns else ivf_assign(df, cents, id_col, vec_col)
    cand = assigned.filter(F.col("_cid").isin(probe))
    q = darray(query_vec)
    scored = cand.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 4).alias("sim")
    )
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def ivf_write_index(
    df: DataFrame,
    path: str,
    centroids: list[list[float]] | None = None,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Materialize the IVF index layout: the assigned table written
    PARTITIONED BY the centroid id, so every probe's ``_cid`` filter is
    partition pruning — a top-k against the index reads
    n_probe/n_centroids of the files, never the full embedding corpus.
    Returns the codebook to pass back into :func:`cosine_topk_ivf`
    (the index and its codebook travel together)."""
    cents = centroids or ivf_centroids(df, n_centroids, id_col, vec_col)
    assigned = ivf_assign(df, cents, id_col, vec_col)
    assigned.write.partitionBy("_cid").mode("overwrite").parquet(path)
    return cents


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 12,
    dim: int = 64,
) -> DataFrame:
    """(a, b, sim) pairs with cosine ≥ threshold, found via exact-bucket
    equi-join (high-cosine pairs collide with high probability) and
    verified exactly. Equi-join on the bucket key → shuffle-hash join,
    no cross product."""
    from swanlake_spark.operators.dedup import _bucket_pairs, _spread

    hp = _hyperplanes(dim, planes)
    # Norm precomputed once per vector (before pair generation) rather
    # than re-derived per candidate pair — 1 interpreted aggregate per
    # pair instead of 3, identical bits (sqrt∘dot computed once).
    bucketed = _spread(df).select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_n"),
        lsh_bucket(F.col(vec_col), hp).alias("_bucket"),
    )
    # Single-scan pair generation (the skew-safe minhash bucket plan):
    # one groupBy(bucket) collects members, pairs explode row-locally.
    # The former self-join on the bucket key scanned the input twice and
    # computed norms + plane signs twice per vector.
    pairs = _bucket_pairs(
        bucketed, ["_vid", "_v", "_n"], max_bucket=4096, keys=("_bucket",)
    )
    return (
        pairs.select(
            F.col("x._vid").alias("a"),
            F.col("y._vid").alias("b"),
            F.round(
                dot(F.col("x._v"), F.col("y._v"))
                / (F.col("x._n") * F.col("y._n")),
                4,
            ).alias("sim"),
        )
        .filter(F.col("a") < F.col("b"))
        .filter(F.col("sim") >= threshold)
        .distinct()
    )


# -- product quantization (compressed ANN) -----------------------------------


def _subvectors(vec_col, m: int, sub_dim: int) -> Column:
    """array<array<double>> of the m contiguous subvectors."""
    v = _as_double(vec_col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.slice(v, s * sub_dim + 1, sub_dim),
    )


def _l2sq(a, b) -> Column:
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    refine_iters: int = 1,
) -> list[list[list[float]]]:
    """Deterministic product-quantization codebooks: ``m`` subspaces of
    ``dim/m`` dims, ``k`` centroids each. Seeded from the ``k``
    lowest-id vectors' subvectors (the IVF convention — reproducible on
    any engine/layout), then ``refine_iters`` distributed Lloyd steps:
    one narrow assignment pass + one groupBy(sub, code, pos) avg whose
    shuffle is O(rows × dim) scalars with full map-side combine; only
    m × k × sub_dim aggregates return to the driver.

    Returns ``codebooks[sub][code] -> centroid`` (python lists — ships
    as plan literals like the IVF codebook)."""
    if dim % m:
        from swanlake_spark.errors import InvalidArgument

        raise InvalidArgument(f"dim ({dim}) must be divisible by m ({m})")
    sub_dim = dim // m
    seed_rows = (
        df.select(id_col, _as_double(vec_col).alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    books = [
        [list(r.v[s * sub_dim : (s + 1) * sub_dim]) for r in seed_rows]
        for s in range(m)
    ]
    for _ in range(refine_iters):
        coded = pq_encode(df, books, id_col=id_col, vec_col=vec_col)
        subs = _subvectors(vec_col, m, sub_dim)
        means = (
            coded.select(
                F.posexplode(
                    F.zip_with(
                        subs,
                        F.col("pq_code"),
                        lambda sv, c: F.struct(
                            c.alias("code"), sv.alias("sv")
                        ),
                    )
                ).alias("sub", "z")
            )
            .select("sub", "z.code", F.posexplode("z.sv").alias("pos", "x"))
            .groupBy("sub", "code", "pos")
            .agg(F.avg("x").alias("mean"))
            .collect()
        )
        agg: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            # same 9-decimal stabilization as ivf_centroids: partial
            # aggregates merge in arrival order, so unrounded means can
            # differ in the last bit between runs
            agg.setdefault((r.sub, r.code), {})[r.pos] = round(r.mean, 9)
        for s in range(m):
            for c in range(k):
                got = agg.get((s, c))
                if got:
                    books[s][c] = [got[p] for p in sorted(got)]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``pq_code`` — array<int> of length m, each element the
    nearest (L2) centroid index in that subspace. Codebooks ship as one
    plan literal; encoding is a narrow per-row pass, no shuffle. The
    code is the compressed representation (m small ints per vector —
    64 floats → 8 bytes at the defaults)."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    books = darray(codebooks)
    subs = _subvectors(vec_col, m, sub_dim)
    # the per-subspace distance list is LET-BOUND (single-element
    # transform idiom) so each (subvector, centroid) L2 computes once —
    # referencing the transform twice (argmin position + min) doubled
    # every distance fold (Catalyst does no CSE through lambda bodies)
    code = F.zip_with(
        subs,
        books,
        lambda sv, book: F.element_at(
            F.transform(
                F.array(F.transform(book, lambda cent: _l2sq(sv, cent))),
                lambda ds: (
                    F.array_position(ds, F.array_min(ds)) - 1
                ).cast("int"),
            ),
            F.lit(1),
        ),
    )
    return df.withColumn("pq_code", code)


def pq_topk(
    df_coded: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate L2 top-k by asymmetric distance (ADC): the
    query-to-centroid distance table (m × k floats) is computed
    driver-side and ships as a plan literal; each row's score is m
    table lookups summed — no vector math touches the compressed rows.
    Scan + TakeOrderedAndProject; at 100 TB the scanned bytes are the
    codes (m ints/row), not the embeddings."""
    import numpy as np

    q = np.asarray(query_vec, dtype=float)
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    dtable = [
        [
            float(((q[s * sub_dim : (s + 1) * sub_dim] - np.asarray(c)) ** 2).sum())
            for c in codebooks[s]
        ]
        for s in range(m)
    ]
    dlit = darray(dtable)
    score = F.aggregate(
        F.zip_with(
            dlit,
            F.col("pq_code"),
            lambda row, c: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        df_coded.select(F.col(id_col), F.round(score, 4).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(k)
    )
