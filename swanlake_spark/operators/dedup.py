"""Deduplication operators for training-data pipelines.

Four families, all expressed with built-in DataFrame functions (JVM-side
execution; shuffles only where semantically required):

- exact:        hash-groupBy on normalized content. One shuffle on the
                content hash; at 100 TB use ``spark.sql.shuffle.partitions``
                sized so each partition's hash-group state fits in memory.
- MinHash+LSH:  shingle → per-seed min-hash signature → banded LSH →
                candidate pairs via an equi-join on (band, band_hash) →
                exact-jaccard verification of candidates only. Joins are
                equi-joins on band hashes (no O(n²) cross product);
                skewed bands (very common shingles) are capped.
- SimHash:      32-bit sign-aggregated token-hash fingerprint; banded
                candidate generation + Hamming-distance verification
                (``bit_count(a XOR b)``).
- n-gram Jaccard: candidate pairs via a shared word-n-gram (inverted
                index join), verified with exact token-set Jaccard.

Embedding-cosine near-dup lives in ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from swanlake_spark.operators.text import tokens

def _spread(df: DataFrame, force: bool = False) -> DataFrame:
    """Repartition up to the cluster's parallelism when the source reads
    fewer input files than there are cores (e.g. one small Parquet
    file): shingling + explode is CPU-bound and would otherwise run on a
    single core. No-op on wide inputs (a 100-TB scan already has more
    files than cores).

    Probing ``df.rdd.getNumPartitions()`` would force RDD lineage
    materialization on every call; ``inputFiles()`` is a driver-side
    metadata lookup. ``force=True`` repartitions unconditionally (for
    non-file sources that still need spreading)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if force:
        return df.repartition(target)
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if 0 < n_files < target:
        return df.repartition(target)
    return df


# -- exact -------------------------------------------------------------------


def content_key(text_col: str | Column = "text") -> Column:
    """Normalized content hash used for exact dedup."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative of each exact-content group.
    Single shuffle on the 128-bit content hash; no skew (hashes are
    uniform)."""
    key = content_key(text_col)
    keep = (
        df.select(F.col(id_col), key.alias("ck"))
        .groupBy("ck")
        .agg(F.min(id_col).alias(id_col))
        .drop("ck")
    )
    return df.join(keep, id_col, "left_semi")


# -- shingling ---------------------------------------------------------------


def shingles(text_col: str | Column = "text", n: int = 5) -> Column:
    """Distinct word n-gram shingles of a document.

    The token array is LET-BOUND via a single-element transform before
    the per-shingle slice: referencing the tokenize chain directly
    inside the lambda would re-evaluate it for every shingle (Catalyst
    does no CSE through lambda bodies) — quadratic in document length,
    measured ~170x slower on a 20k-token document in the analogous
    span-dedup window pass."""
    t = tokens(text_col)

    def _per_doc(arr):
        return F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(arr) - (n - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(arr, i, n)),
        )

    return F.array_distinct(F.flatten(F.transform(F.array(t), _per_doc)))


# -- MinHash + LSH -----------------------------------------------------------


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 5,
) -> DataFrame:
    """(id, sig: array<bigint>) — per-seed min of xxhash64(shingle, seed).

    One explode + one groupBy(id): the shuffle is on the doc id, with
    num_hashes partial-aggregated mins (map-side combine), so the
    shuffle volume is O(docs × num_hashes), independent of text size.
    """
    ex = _spread(df).select(
        F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("g")
    )
    # r12: each agg as ONE F.expr instead of F.min(F.xxhash64(col,
    # lit)) — the py4j-built form cost ~4 driver round trips per seed
    # per plan build (~0.5 s of the entry's wall time at 32 hashes);
    # the SQL text parses JVM-side to the identical expression (same
    # int-literal seed, same xxhash64).
    aggs = [
        F.expr(f"min(xxhash64(g, {seed})) AS h{seed}")
        for seed in range(num_hashes)
    ]
    sig = ex.groupBy(id_col).agg(*aggs)
    arr = "array(" + ",".join(f"h{s}" for s in range(num_hashes)) + ")"
    return sig.select(F.col(id_col), F.expr(arr).alias("sig"))


def minhash_signature_rowlocal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 5,
) -> DataFrame:
    """(id, sig) computed ROW-LOCALLY — ``sig[s] = array_min(transform(
    shingles, g → xxhash64(g, s)))`` — no explode, no groupBy, no
    shuffle. Identical values to :func:`minhash_signature`; this form has
    no aggregation state, so it is usable inside Structured Streaming
    (per-row narrow transform) and anywhere a shuffle-free signature is
    worth the interpreted higher-order-function cost."""
    sh = df.select(
        F.col(id_col), shingles(text_col, shingle_n).alias("_sh")
    )
    # one F.expr for the whole signature array (r12: the per-seed
    # F.array_min(F.transform(...)) chain cost ~8 driver round trips
    # per seed per plan build); values identical — same per-seed
    # transform + array_min, int-literal seeds.
    sig = "array(" + ",".join(
        f"array_min(transform(_sh, g -> xxhash64(g, {seed})))"
        for seed in range(num_hashes)
    ) + ")"
    return sh.select(F.col(id_col), F.expr(sig).alias("sig"))


def band_hashes(sig_df: DataFrame, id_col: str, bands: int) -> DataFrame:
    """(id, band, bh): one LSH band hash per row per band — the
    row-local banding step shared by the batch candidate join and the
    streaming near-dup filter."""
    rows = F.size(F.col("sig")) / bands
    # xxhash64 hashes the array slice directly (Spark hashes complex
    # types natively) — equal slices hash equal, which is all banding
    # needs; no per-element string rendering.
    return sig_df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(
                        F.col("sig"),
                        (b * rows + 1).cast("int"),
                        rows.cast("int"),
                    ),
                    b,
                ),
            )
        ).alias("band", "bh"),
    )


def _bucket_pairs(
    banded: DataFrame,
    payload: list[str],
    max_bucket: int,
    keys: tuple[str, ...] = ("band", "bh"),
) -> DataFrame:
    """All unordered pairs within each (band, bh) bucket, skew-safe.

    Single scan, single shuffle: one ``groupBy(band, bh)`` collects each
    bucket's members, then buckets outside [2, max_bucket] are dropped —
    singletons (the vast majority) generate nothing, pathological
    buckets (k²/2 pairs) are capped. Pair generation is a row-local
    explode, no further shuffle and no self-join.

    Rejected alternatives, for the record: a window count + self-join
    sorts every bucket and shuffles both join sides; a count-first
    pre-filter plus join re-scans the whole upstream pipeline (Catalyst
    can't reuse the exchange across the two aggregation shapes).
    Residual scale risk: a bucket is materialized as one list before the
    size filter, so an adversarial mega-bucket (>~10⁷ members on one
    key) would pressure one executor; callers with such data should
    pre-salt the band hash.
    """
    member = F.struct(*[F.col(c) for c in payload])
    buckets = (
        banded.groupBy(*keys)
        .agg(F.array_sort(F.collect_list(member)).alias("ms"))
        .filter((F.size("ms") >= 2) & (F.size("ms") <= max_bucket))
    )
    n = F.size("ms")
    pairs = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + 2, n),
                lambda y: F.struct(x.alias("x"), y.alias("y")),
            ),
        )
    )
    return buckets.select(F.explode(pairs).alias("p")).select("p.x", "p.y")


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    max_bucket: int = 64,
) -> DataFrame:
    """(a, b) candidate pairs whose signatures collide in ≥1 LSH band.

    Banding is row-local (:func:`band_hashes`); pair generation is the
    skew-safe bucket plan in :func:`_bucket_pairs` — no O(n²) cross
    product, no unbounded bucket state.
    """
    banded = band_hashes(sig_df, id_col, bands)
    pairs = _bucket_pairs(banded, [id_col], max_bucket)
    return (
        pairs.select(F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (a, b, jaccard) with exact-verified shingle
    Jaccard ≥ threshold, discovered via MinHash LSH. Deterministic:
    xxhash64 seeds are fixed.

    Plan shape: signatures use the explode+groupBy form
    (:func:`minhash_signature` — codegen'd xxhash64 + partial-agg min;
    the row-local variant pays ``num_hashes`` interpreted passes over
    every shingle array and measures several times slower), and
    verification computes the corpus shingle sets ONCE — candidate
    pairs explode into two (a, b, doc) legs, one broadcast join
    attaches each leg's shingles, and a groupBy(a, b) reassembles the
    pair. The naive two-join verify scans and re-shingles the corpus
    twice; this shape shingles it once, and the only extra shuffle
    moves two shingle arrays per CANDIDATE (LSH output, tiny), not per
    document."""
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingle_n)
    # the candidate set is bounded (LSH output); pin it executor-local
    # so the two consumers below (legs broadcast + candidate-doc
    # prune) run the signature/banding DAG once, not twice
    cand = lsh_candidate_pairs(sig, id_col, bands).localCheckpoint(
        eager=False
    )
    legs = cand.select(
        "a",
        "b",
        F.explode(F.array(F.col("a"), F.col("b"))).alias("_d"),
    )
    # r12: shingle ONCE PER CANDIDATE DOC — the corpus prunes to docs
    # that appear in ≥1 candidate (broadcast semi-join), each such doc
    # shingles exactly once, and the leg join then fans out the
    # COMPUTED arrays (a row-copy, not a re-shingle). The two shapes
    # this replaces both fail a regime: the pre-r12 corpus-wide
    # (id, shingles) projection re-shingled every document (even with
    # zero candidates); the first r12 cut (shingle after the leg join)
    # re-shingled once PER LEG, which on a clone-heavy corpus — the
    # sf1 ladder's 10× replicated docs, ~90 legs/doc — measured
    # 64.6 s vs the corpus-wide shape's 16.9 s. This shape is ≤ both
    # everywhere: verify shingle work = candidate DOCS, shuffle = two
    # arrays per pair (unchanged). Same shingle math, identical
    # values (bit-exact oracle rows re-checked).
    # _spread: the per-doc shingle pass is CPU-bound and a single-file
    # source would run it on one core (the _windows precedent)
    src = _spread(df).select(F.col(id_col), F.col(text_col))
    cand_docs = legs.select(F.col("_d").alias(id_col)).distinct()
    sh_tbl = src.join(F.broadcast(cand_docs), id_col, "leftsemi").select(
        F.col(id_col).alias("_sid"),
        shingles(text_col, shingle_n).alias("sh"),
    )
    per_pair = (
        sh_tbl.join(F.broadcast(legs), F.col("_d") == F.col("_sid"))
        .groupBy("a", "b")
        .agg(
            F.first(F.when(F.col("_d") == F.col("a"), F.col("sh")), True).alias(
                "sha"
            ),
            F.first(F.when(F.col("_d") == F.col("b"), F.col("sh")), True).alias(
                "shb"
            ),
        )
    )
    verified = (
        per_pair.withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sha", "shb"))
                / F.size(F.array_union("sha", "shb")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return verified


# -- SimHash -----------------------------------------------------------------


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash: bigint) — sign-aggregated token-hash fingerprint.

    Explode tokens once; ``bits`` conditional sums with map-side combine.
    """
    ex = _spread(df).select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    h = F.xxhash64("tok")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = ex.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp + F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    band_bits: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash) ≤ max_hamming.
    Candidates via exact match on one of bits/band_bits bands (pigeonhole:
    any pair within Hamming k < bands must agree on ≥1 band)."""
    sh = simhash(df, id_col, text_col, bits)
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    banded = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * band_bits).bitwiseAND(
                        F.lit(mask)
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band", "bh"),
    )
    pairs = _bucket_pairs(banded, [id_col, "simhash"], max_bucket=1 << 16)
    return (
        pairs.select(
            F.col(f"x.{id_col}").alias("a"),
            F.col(f"y.{id_col}").alias("b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# -- n-gram Jaccard ----------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """(a, b, jaccard) pairs of documents sharing ≥1 word n-gram, with
    exact *token-set* Jaccard ≥ threshold.

    The shared-shingle equi-join is the inverted-index candidate
    generator: cost O(Σ bucket²) on shingle buckets, not O(n²) on docs.
    """
    sh = _spread(df).select(
        F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("g")
    )
    cand = (
        sh.alias("x")
        .join(sh.alias("y"), "g")
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
        .distinct()
    )
    # r12: tokenize ONCE PER CANDIDATE DOC (the minhash verify shape —
    # see minhash_dedup_pairs for the regime analysis): corpus pruned
    # to candidate docs by a broadcast semi-join, each doc tokenizes
    # once, the leg join fans out the computed arrays. The candidate
    # set is pinned so the inverted-index join runs once for both
    # consumers. Same token math, identical values.
    cand = cand.localCheckpoint(eager=False)
    legs = cand.select(
        "a",
        "b",
        F.explode(F.array(F.col("a"), F.col("b"))).alias("_d"),
    )
    src = _spread(df).select(F.col(id_col), F.col(text_col))
    cand_docs = legs.select(F.col("_d").alias(id_col)).distinct()
    tok_tbl = src.join(F.broadcast(cand_docs), id_col, "leftsemi").select(
        F.col(id_col).alias("_sid"),
        F.array_distinct(tokens(text_col)).alias("t"),
    )
    per_pair = (
        tok_tbl.join(F.broadcast(legs), F.col("_d") == F.col("_sid"))
        .groupBy("a", "b")
        .agg(
            F.first(F.when(F.col("_d") == F.col("a"), F.col("t")), True).alias(
                "ta"
            ),
            F.first(F.when(F.col("_d") == F.col("b"), F.col("t")), True).alias(
                "tb"
            ),
        )
    )
    return (
        per_pair.withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("ta", "tb"))
                / F.size(F.array_union("ta", "tb")),
                4,
            ),
        )
        .filter(F.col("jaccard") > threshold)
        .select("a", "b", "jaccard")
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 30,
) -> DataFrame:
    """Connected components over an undirected edge list: (node, comp)
    where ``comp`` is the minimum node id reachable from ``node``.

    This is the missing last step of every near-dup pipeline: pair
    operators (`minhash_dedup_pairs`, `ngram_jaccard_pairs`,
    `simhash_near_pairs`, `cosine_near_pairs`) emit *edges*; choosing
    one canonical document per duplicate *cluster* needs the transitive
    closure, not the pairs (A~B, B~C must collapse A,B,C together even
    when A~C was never emitted).

    Algorithm: iterated min-label propagation with pointer jumping.
    Each round does (1) a hop — ``comp(n) ← min(comp(n), min over
    neighbors m of comp(m))`` — one equi-join (edges ⋈ labels on the
    neighbor key) plus one groupBy(node) min, and (2) a jump —
    ``comp(n) ← min(comp(n), comp(comp(n)))`` — one self-equi-join on
    the label table. All shuffles are on node ids, no cross products,
    label state is exactly one row per node. The hop alone needs
    diameter rounds (a 100-node chain would blow the iteration cap);
    the jump compresses label paths geometrically, giving
    O(log diameter) convergence — 2–3 rounds on near-clique dedup
    graphs (where the jump is nearly free) and ~8 rounds on a
    100-chain. ``localCheckpoint`` truncates the per-round lineage so
    the plan doesn't grow exponentially (on a cluster, set a
    checkpoint dir and use reliable checkpoints if executor loss must
    be survivable).

    ``nodes`` (optional single-column DataFrame) adds isolated nodes —
    rows that appear in no edge come back as their own singleton
    component.
    """
    e = edges.select(
        F.col(a_col).cast("long").alias("src"),
        F.col(b_col).cast("long").alias("dst"),
    )
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)  # reused every round: cut re-derivation
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iterations):
        prop = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("comp").alias("ncomp"))
        )
        hopped = (
            labels.join(prop, labels["node"] == prop["src"], "left")
            .select(
                "node",
                F.col("comp").alias("_prev"),
                F.least(F.col("comp"), F.coalesce("ncomp", F.col("comp"))).alias(
                    "comp"
                ),
            )
            # Pinned: the jump join reads hopped on BOTH sides; without
            # this the edges-join + groupBy-min hop would execute twice
            # per round.
            .localCheckpoint(eager=True)
        )
        # Pointer jump: adopt the label OF the current label. comp
        # values are node ids of this component, so the left join always
        # finds the parent row; labels only ever decrease.
        parent = hopped.select(
            F.col("node").alias("_pn"), F.col("comp").alias("_pc")
        )
        stepped = (
            hopped.join(parent, hopped["comp"] == parent["_pn"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("_pc", F.col("comp"))).alias(
                    "comp"
                ),
                "_prev",
            )
            .select(
                "node",
                "comp",
                (F.col("comp") < F.col("_prev")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter(F.col("_changed")).limit(1).count()
        labels = stepped.drop("_changed")
        if changed == 0:
            break
    if nodes is not None:
        n_col = nodes.columns[0]
        universe = nodes.select(F.col(n_col).cast("long").alias("node")).distinct()
        singles = universe.join(labels, "node", "left_anti").select(
            "node", F.col("node").alias("comp")
        )
        labels = labels.union(singles)
    return labels


def dedup_groups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Annotate every row with its duplicate-cluster id and canonical
    flag: ``comp`` = min id in the row's near-dup connected component
    (itself when the row has no duplicates), ``is_canonical`` = this row
    is the cluster representative. ``df.filter("is_canonical")`` is the
    cluster-level dedup keep-set."""
    cc = connected_components(pairs, nodes=df.select(id_col), a_col=a_col, b_col=b_col)
    cc = cc.select(F.col("node").alias(id_col), "comp")
    return (
        df.join(cc, id_col, "left")
        .withColumn("comp", F.coalesce("comp", F.col(id_col).cast("long")))
        .withColumn("is_canonical", F.col("comp") == F.col(id_col))
    )


def embedding_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    planes: int = 12,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate removal, keep-lowest-id
    representative: a row is dropped iff some lower-id row's embedding
    has cosine ≥ threshold with it.

    Scale path (default): LSH-bucketed candidate pairs via
    ``similarity.cosine_near_pairs`` — hyperplane-sign bucket equi-join,
    exact cosine verify, no cross product; at 100 TB the only shuffle is
    on the bucket key. ``exact=True`` computes all pairs (bounded inputs
    only — the oracle-verification path)."""
    from swanlake_spark.operators import similarity

    if exact:
        a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
        b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
        pairs = (
            a.crossJoin(b)
            .filter(F.col("a") < F.col("b"))
            .withColumn(
                "sim", F.round(similarity.cosine(F.col("va"), F.col("vb")), 4)
            )
            .filter(F.col("sim") >= threshold)
            .select("b")
        )
    else:
        pairs = similarity.cosine_near_pairs(
            df, threshold, id_col, vec_col, planes, dim
        ).select("b")
    dups = pairs.distinct()
    return df.join(dups, df[id_col] == dups["b"], "left_anti")


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    method): k-means-cluster the embedding space, then compare pairs
    ONLY within a cluster and drop every row whose cosine to a
    lower-id cluster-mate is ≥ ``threshold``. Keep-lowest-id, the same
    representative convention as :func:`embedding_dedup`.

    Scale shape: the deterministic codebook
    (:func:`similarity.ivf_centroids` — lowest-id seeding + stabilized
    Lloyd means) ships as a plan literal; assignment is one narrow
    projection; the only join is the within-cluster self-join on
    ``_cid`` — the cluster granularity bounds the quadratic term
    exactly as the published method intends (cluster count scales with
    corpus size; pair work is Σ cluster² instead of n²). The cosine is
    exact — clustering only limits WHICH pairs are compared, never the
    score, so the drop decision for compared pairs matches the exact
    method bit-for-bit."""
    from swanlake_spark.operators import similarity

    cents = centroids or similarity.ivf_centroids(
        df, n_clusters, id_col, vec_col
    )
    assigned = similarity.ivf_assign(df, cents, id_col, vec_col)
    a = assigned.select(
        F.col("_cid"), F.col(id_col).alias("a"), F.col(vec_col).alias("va")
    )
    b = assigned.select(
        F.col("_cid"), F.col(id_col).alias("b"), F.col(vec_col).alias("vb")
    )
    dups = (
        a.join(b, "_cid")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "sim", F.round(similarity.cosine(F.col("va"), F.col("vb")), 4)
        )
        .filter(F.col("sim") >= threshold)
        .select("b")
        .distinct()
    )
    return df.join(dups, df[id_col] == dups["b"], "left_anti")
