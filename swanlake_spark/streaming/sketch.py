"""Streaming heavy hitters: a count-min sketch maintained across
micro-batches.

The batch operator (``operators/sketch.py``) can exact-verify because
it can rescan its input; a stream cannot, so the streaming twin keeps
the classic bounded-state contract instead:

- **State** = the d×w cell table plus the current candidate set —
  independent of how many distinct values the stream has carried.
- **Guarantee** = no false negatives for truly heavy values. A value's
  true count only grows when it APPEARS, so at the batch of its T-th
  appearance it is in that batch's distinct set and its running
  estimate is ≥ its true count = T — it enters the candidate set right
  there. Candidates are re-estimated every batch and pruned when their
  estimate falls below T (possible only for collision-inflated false
  positives; a true heavy value's estimate never drops below its true
  count). Reported counts are count-min UPPER BOUNDS, not exact.
- **Replay** (foreachBatch is at-least-once on crash) is an EXACT
  no-op: each publish is keyed by batch id, and a sink whose version
  for this batch id already landed skips the fold entirely
  (``_already_folded`` — the high-water-mark contract). A crash
  between a stream's two publishes (heavy hitters: cells then
  candidates) re-folds only the missing half.

State publishes are crash-safe via versioned subdirectories: each
batch writes ``v<batch_id>`` (Spark's ``_SUCCESS`` marks completion),
readers take the highest complete version, older versions are swept
after the new one lands — a torn write is simply ignored (it has no
``_SUCCESS``, so the replay re-folds from the previous version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _complete_versions(spark: SparkSession, root: str) -> list[tuple[int, str]]:
    from swanlake_spark.operators.dml import _local_os_path

    import os

    osp = _local_os_path(root)
    out = []
    if osp is not None:
        if not os.path.isdir(osp):
            return []
        for name in os.listdir(osp):
            if name.startswith("v") and os.path.exists(
                f"{osp}/{name}/_SUCCESS"
            ):
                try:
                    out.append((int(name[1:]), f"{root}/{name}"))
                except ValueError:
                    continue
        return sorted(out)
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(root)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        ok = fs.exists(jvm.org.apache.hadoop.fs.Path(f"{root}/{name}/_SUCCESS"))
        if name.startswith("v") and ok:
            try:
                out.append((int(name[1:]), f"{root}/{name}"))
            except ValueError:
                continue
    return sorted(out)


def _read_latest(spark: SparkSession, root: str) -> DataFrame | None:
    vs = _complete_versions(spark, root)
    return spark.read.parquet(vs[-1][1]) if vs else None


def _bind_checkpoint(spark: SparkSession, root: str, checkpoint_dir: str):
    """Bind the state root to its owning checkpoint: a ``_ckpt`` marker
    records the checkpoint path on first use, and any later batch from
    a DIFFERENT checkpoint raises — catching the reset case the
    batch-id high-water mark alone cannot see (a state root holding
    exactly v0 looks like a replay of a fresh checkpoint's batch 0,
    and its mass would be silently dropped)."""
    from swanlake_spark.operators.dml import _local_os_path

    import os

    osp = _local_os_path(root)
    if osp is not None:
        marker = f"{osp}/_ckpt"
        if os.path.exists(marker):
            with open(marker) as f:
                bound = f.read().strip()
            if bound != checkpoint_dir:
                raise ValueError(
                    f"streaming state at {root} is bound to checkpoint "
                    f"{bound!r} but this query runs from "
                    f"{checkpoint_dir!r}: restarting with a fresh "
                    f"checkpoint against existing state would silently "
                    f"drop batches. Use a fresh state_dir (or delete "
                    f"the stale state)."
                )
            return
        os.makedirs(osp, exist_ok=True)
        with open(marker, "w") as f:
            f.write(checkpoint_dir)
        return
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{root}/_ckpt")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p):
        stream = fs.open(p)
        try:
            bound = bytes(
                jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            ).decode().strip()
        finally:
            stream.close()
        if bound != checkpoint_dir:
            raise ValueError(
                f"streaming state at {root} is bound to checkpoint "
                f"{bound!r} but this query runs from {checkpoint_dir!r}"
            )
        return
    ostream = fs.create(p, True)
    try:
        ostream.write(bytearray(checkpoint_dir.encode()))
    finally:
        ostream.close()


def _already_folded(spark: SparkSession, root: str, batch_id: int) -> bool:
    """True if a COMPLETE version for exactly ``batch_id`` exists —
    i.e. this batch's fold already published. foreachBatch is
    at-least-once: a crash between the state publish and the
    checkpoint commit replays the batch with the SAME batch_id and
    data, so the version number doubles as a high-water mark that
    turns replays into exact no-ops (for every stream here, not just
    the naturally-idempotent KMV union). A torn publish has no
    ``_SUCCESS`` and is invisible to this check, so the replay
    re-folds from the previous version.

    A batch id BELOW the latest complete version is NOT a replay —
    checkpoints only ever replay the last uncommitted batch — it means
    the stream was restarted with a FRESH checkpoint against an
    existing state root (batch ids restarted at 0). Treating that as
    folded would silently discard every new batch until the counter
    catches up, so it raises instead: point the new checkpoint's
    stream at a fresh state_dir (or remove the stale one)."""
    vs = _complete_versions(spark, root)
    if not vs:
        return False
    latest = vs[-1][0]
    if latest > batch_id:
        raise ValueError(
            f"streaming state at {root} is at batch v{latest} but this "
            f"query's batch id is {batch_id}: the checkpoint was reset "
            f"against an existing state root. Use a fresh state_dir "
            f"(or delete the stale state) — folding would silently "
            f"drop batches."
        )
    return latest == batch_id


def _publish(spark: SparkSession, root: str, df: DataFrame, batch_id: int):
    df.coalesce(1).write.mode("overwrite").parquet(f"{root}/v{batch_id}")
    # sweep strictly-older complete versions (the new one is live)
    from swanlake_spark.operators.dml import _local_os_path, _rm_path

    import os
    import shutil

    for n, path in _complete_versions(spark, root):
        if n < batch_id:
            osp = _local_os_path(path)
            if osp is not None:
                shutil.rmtree(osp, ignore_errors=True)
            else:
                _rm_path(spark, path)


def heavy_hitters_stream(
    rows: DataFrame,
    col: str,
    threshold: int,
    state_dir: str,
    checkpoint_dir: str,
    d: int = 4,
    w: int = 4096,
    trigger_available_now: bool = True,
):
    """Maintain streaming heavy-hitter candidates for ``rows[col]``.

    After each batch, ``<state_dir>/candidates/v<latest>`` holds
    ``(value, est)`` — a SUPERSET of the values whose true stream count
    is ≥ threshold, with ``est`` the count-min upper bound (read it
    with ``read_candidates``). Returns the StreamingQuery."""
    from swanlake_spark.operators import sketch

    cells_root = f"{state_dir}/cells"
    cand_root = f"{state_dir}/candidates"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _bind_checkpoint(spark, state_dir, checkpoint_dir)
        if _already_folded(spark, cand_root, batch_id):
            return  # replayed batch: both publishes landed
        item = F.col(col).cast("string")
        pair = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        sketch._bucket(item, i, w).alias("b"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("p")
        # cells step guarded separately: a crash BETWEEN the two
        # publishes replays with cells already folded — re-fold only
        # the missing half (candidates), never double-count the cells
        if not _already_folded(spark, cells_root, batch_id):
            bcells = (
                batch_df.where(item.isNotNull())
                .select(pair)
                .groupBy("p.i", "p.b")
                .agg(F.count("*").alias("cnt"))
            )
            old = _read_latest(spark, cells_root)
            cells = (
                bcells
                if old is None
                else old.unionByName(bcells)
                .groupBy("i", "b")
                .agg(F.sum("cnt").alias("cnt"))
            )
            # counters are linear, so the previous cells parquet and the
            # batch cells fold in ONE aggregation (the groupBy above IS
            # the merge) and publish directly — no driver
            # materialization anywhere in the sink, so w can scale past
            # driver-comfortable sizes. The candidate re-estimate
            # densifies the PUBLISHED parquet (bounded ≤ d×w cells), not
            # the union lineage, so the merge computation runs once.
            _publish(spark, cells_root, cells, batch_id)
        latest_cells = _complete_versions(spark, cells_root)[-1][1]
        cells_pub = spark.read.parquet(latest_cells).select(
            F.col("i").cast("int"),
            F.col("b").cast("int"),
            F.col("cnt").cast("long"),
        )
        cms_row = sketch.densify(cells_pub, w)
        prev = _read_latest(spark, cand_root)
        cand_vals = batch_df.where(item.isNotNull()).select(
            item.alias("value")
        ).distinct()
        if prev is not None:
            cand_vals = cand_vals.unionByName(
                prev.select("value")
            ).distinct()
        cands = (
            cand_vals.crossJoin(F.broadcast(cms_row))
            .select(
                "value",
                sketch.cm_estimate("cms", "value", d, w).alias("est"),
            )
            .where(F.col("est") >= threshold)
        )
        _publish(spark, cand_root, cands, batch_id)

    writer = rows.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_candidates(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current candidate set ``(value, est)`` — empty frame if the
    stream has not completed a batch yet."""
    df = _read_latest(spark, f"{state_dir}/candidates")
    if df is None:
        return spark.createDataFrame([], schema="value string, est long")
    return df


def kmv_distinct_stream(
    rows: DataFrame,
    col: str,
    state_dir: str,
    checkpoint_dir: str,
    k: int = 1024,
    by: list[str] | None = None,
    trigger_available_now: bool = True,
):
    """Streaming distinct counting: a per-group KMV theta sketch
    (operators/sketch.py KMV section) maintained across micro-batches.

    State = one k-doubles array per group, independent of how many
    distinct values the stream has carried. The cross-batch fold is a
    SET union of hash minima (``kmv_union`` generalized over the
    previous state row and the batch sketch), which is not just linear
    but IDEMPOTENT — a crash-replayed batch (foreachBatch is
    at-least-once) re-unions the same hashes and changes nothing, so
    estimates survive replays EXACTLY, a strictly stronger contract
    than the count-min cells above (which only bound the error under
    replay). Publishes ride the same versioned-subdirectory protocol.

    Read the live estimate with ``read_kmv``."""
    from swanlake_spark.operators import sketch

    by = list(by or [])
    root = f"{state_dir}/kmv"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _bind_checkpoint(spark, state_dir, checkpoint_dir)
        if _already_folded(spark, root, batch_id):
            return  # replay: fold already published (belt over the
            # union's natural idempotence — saves the re-scan too)
        bsk = sketch.kmv_sketch(batch_df, col, k=k, by=by)
        old = _read_latest(spark, root)
        if old is None:
            merged = bsk
        else:
            # per group: ≤ 2 arrays of ≤ k hashes — flatten, dedup,
            # keep the k smallest (the n-way kmv_union)
            merged = (
                old.unionByName(bsk)
                .groupBy(*by)
                .agg(
                    F.slice(
                        F.array_sort(
                            F.array_distinct(F.flatten(F.collect_list("kmv")))
                        ),
                        1,
                        k,
                    ).alias("kmv")
                )
            )
        _publish(spark, root, merged, batch_id)

    writer = rows.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_kmv(
    spark: SparkSession, state_dir: str, k: int = 1024
) -> DataFrame:
    """Current per-group sketch state plus ``distinct_est`` — empty
    (group-less) frame if the stream has not completed a batch yet."""
    from swanlake_spark.operators import sketch

    df = _read_latest(spark, f"{state_dir}/kmv")
    if df is None:
        return spark.createDataFrame(
            [], schema="kmv array<double>, distinct_est double"
        )
    return df.withColumn(
        "distinct_est", sketch.kmv_distinct(F.col("kmv"), k)
    )


def histogram_stream(
    rows: DataFrame,
    col: str,
    lo: float,
    hi: float,
    state_dir: str,
    checkpoint_dir: str,
    bins: int = 1024,
    by: list[str] | None = None,
    trigger_available_now: bool = True,
):
    """Streaming quantiles: a fixed-bin histogram sketch
    (operators/sketch.py histogram section) maintained across
    micro-batches. The range must be supplied up front (bins are the
    mergeable identity — a stream can't retroactively re-bin), and the
    cross-batch fold is ONE elementwise add per group, the same
    linearity contract as the count-min cells. Replays are EXACT
    no-ops: the versioned publish's batch id is a high-water mark
    (``_already_folded``), so an at-least-once foreachBatch redelivery
    never re-adds a batch's mass — the streamed sketch stays bit-exact
    vs the batch sketch of the concatenated input, the same contract
    as ``kmv_distinct_stream``.

    Read the live sketch + quantiles with ``read_histogram``."""
    from swanlake_spark.operators import sketch

    by = list(by or [])
    root = f"{state_dir}/hist"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _bind_checkpoint(spark, state_dir, checkpoint_dir)
        if _already_folded(spark, root, batch_id):
            return  # replay: this batch's mass already folded
        bsk = sketch.histogram_sketch(
            batch_df, col, bins=bins, lo=lo, hi=hi, by=by
        )
        old = _read_latest(spark, root)
        if old is None:
            merged = bsk
        else:
            merged = (
                old.unionByName(bsk)
                .groupBy(*by)
                .agg(
                    F.aggregate(
                        F.collect_list("counts"),
                        F.transform(
                            F.sequence(F.lit(0), F.lit(bins - 1)),
                            lambda _i: F.lit(0).cast("long"),
                        ),
                        lambda acc, x: F.zip_with(
                            acc, x, lambda a, b: a + b
                        ),
                    ).alias("counts"),
                    F.first("lo").alias("lo"),
                    F.first("hi").alias("hi"),
                )
            )
        _publish(spark, root, merged, batch_id)

    writer = rows.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_histogram(
    spark: SparkSession, state_dir: str, quantiles: list[float] | None = None
) -> DataFrame:
    """Current per-group histogram state, plus a ``q_<pct>`` estimate
    column per requested quantile — empty frame before the first
    completed batch."""
    from swanlake_spark.operators import sketch

    df = _read_latest(spark, f"{state_dir}/hist")
    if df is None:
        return spark.createDataFrame(
            [], schema="counts array<bigint>, lo double, hi double"
        )
    for q in quantiles or []:
        df = df.withColumn(
            f"q_{int(round(q * 100))}",
            sketch.hist_quantile("counts", "lo", "hi", q),
        )
    return df
