"""Deterministic shuffled-shard export — the hand-off from corpus
curation to a training dataloader.

Training runs want the corpus (1) split into a fixed number of
similar-sized shards a loader can assign to workers, (2) in a
pseudo-random order that is NOT the ingest/curation order (curated
corpora arrive clustered by source/date — sequential consumption
would feed the model megabatches of one domain), and (3) exactly
reproducible: re-exporting after a retry, a repartition, or on a
different cluster must produce byte-identical shard membership and
order, or training runs stop being comparable.

``df.orderBy(rand())`` fails all three (nondeterministic, and a rand
sort is a full global sort). Everything here derives shard and order
from ``xxhash64`` of row content + seed, like operators/sampling.py:

* shard = hash(seed, key) mod n_shards — balanced by hash uniformity,
  stable under any physical layout;
* within-shard order = an INDEPENDENT hash (different salt), so order
  within a shard is decorrelated from the shard decision itself;
* a different seed is a fresh permutation — per-epoch reshuffles are
  re-exports (or just re-sorts) with seed+epoch, no state carried.

Scale shape: ONE hash-partitioned shuffle into exactly ``n_shards``
tasks + a sort WITHIN each task (Spark's external sort spills — a
shard never needs to fit in memory); no global sort, no driver
involvement. Each shard directory is written by exactly one task, so
the export is one file per shard (the dataloader contract).

(The reference has no export surface; north-star extension material
like the rest of the curation family.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"
_ORDER_COL = "_shuffle_order"


def _shard(key_cols: tuple[str, ...], n_shards: int, seed: int) -> Column:
    h = F.xxhash64(F.lit(seed), *[F.col(c) for c in key_cols])
    return F.pmod(h, F.lit(n_shards))


def _order(key_cols: tuple[str, ...], seed: int) -> Column:
    # different salt position → independent of the shard hash
    h = F.xxhash64(F.lit(seed), F.lit("order"), *[F.col(c) for c in key_cols])
    return h


def assign_shuffled_shards(
    df: DataFrame,
    n_shards: int,
    key_cols: tuple[str, ...],
    seed: int = 42,
) -> DataFrame:
    """Tag each row with its deterministic ``shard`` (uniform in
    ``[0, n_shards)``) and hidden order key — a pure function of
    (content, seed): identical under repartitioning, retries, and
    re-runs. No shuffle is introduced; this is a projection."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    clash = {SHARD_COL, _ORDER_COL} & set(df.columns)
    if clash:
        # _ORDER_COL too: withColumn would silently overwrite a user
        # column of that name and shuffled() then drops it — the
        # column would vanish from the exported shards
        raise ValueError(f"input already has column(s) {sorted(clash)}")
    return df.withColumn(
        SHARD_COL, _shard(key_cols, n_shards, seed)
    ).withColumn(_ORDER_COL, _order(key_cols, seed))


def shuffled(
    df: DataFrame,
    n_shards: int,
    key_cols: tuple[str, ...],
    seed: int = 42,
) -> DataFrame:
    """The in-plan form: rows clustered by shard, pseudo-randomly
    ordered within each — what a ``foreachPartition`` consumer or a
    downstream per-shard writer iterates. One shuffle (hash on the
    shard id into exactly ``n_shards`` partitions), one external
    within-partition sort; order ties broken by the key columns so
    the permutation is total even under (astronomically unlikely)
    hash collisions."""
    tagged = assign_shuffled_shards(df, n_shards, key_cols, seed)
    # RANGE partition on the shard id, not hash: pmod(hash(shard), n)
    # collides distinct shard values into the same task (~1/e of the
    # tasks sit empty while stragglers carry 2-3 shards); range
    # boundaries over n distinct values in n partitions give a ~1:1
    # shard-to-task layout (boundary sampling may merge one adjacent
    # pair — never worse). Equal values always co-locate either way,
    # so the one-file-per-shard contract never depended on this.
    return (
        tagged.repartitionByRange(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, _ORDER_COL, *key_cols)
        .drop(_ORDER_COL)
    )


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_cols: tuple[str, ...],
    seed: int = 42,
    manifest: bool = False,
) -> None:
    """Export as ``path/shard=K/`` parquet, ONE file per shard, rows
    in the deterministic shuffled order (parquet preserves row order
    for the sequential readers dataloaders use; a Spark re-read of one
    file may split it — consumers wanting order from Spark re-sort on
    the shard's key hash). All rows of a shard land in a single
    repartition task, so each directory gets exactly one file without
    a per-shard job or a driver loop. ``manifest=True`` also writes
    ``_export_manifest.json`` (see module notes) — per-shard row
    counts from footers, schema, and the exact export parameters."""
    shuffled(df, n_shards, key_cols, seed).write.mode(
        "overwrite"
    ).partitionBy(SHARD_COL).parquet(path)
    if manifest:
        _write_manifest(
            path,
            "shuffled",
            {
                "n_shards": n_shards,
                "key_cols": list(key_cols),
                "seed": seed,
            },
            df.schema,
        )


# ---------------------------------------------------------------------------
# Curriculum (score-ordered) export — round-8 verdict #7: training-
# order experiments want the GLOBAL corpus order to follow a score
# (easy→hard), sharded so that shard k's scores all precede shard
# k+1's. A global sort would do it; at 100 TB it is the one thing we
# refuse to do. Instead: quantile cuts from a fixed-width score
# histogram decide shard membership (a pure function of the DATA, not
# of layout or sampling — reproducible across clusters, unlike
# repartitionByRange's sampled boundaries), then the same
# one-shuffle + within-task-sort shape as the shuffled export.
#
# Boundary ties: a histogram bin straddling a cut splits by an
# independent content hash in the exact proportion the cut demands —
# equal (quantized) scores carry no order information, so the split
# preserves monotonicity while keeping shards balanced even for
# degenerate corpora (ALL scores equal ⇒ still n balanced shards).
# Shard-size error is bounded by bin mass at the cut; ``resolution``
# is the knob.
#
# Scale shape: two column-pruned scans of the score column (min/max +
# histogram — both exact integer/extremum aggregations, deterministic
# under any layout), a driver walk over ≤ resolution histogram rows,
# then ONE range shuffle into n_shards tasks with external
# within-task sort. Shard assignment evaluates a ≤ (n_shards−1)-element
# literal boundary array per row (codegen, no UDF).
# ---------------------------------------------------------------------------

_UNIT_RING = 1 << 40  # weighted_sample's collision-safe unit ring


def _curriculum_cuts(
    df: DataFrame,
    score,
    n_shards: int,
    resolution: int,
) -> tuple[list[tuple[int, float]], "Column", int]:
    """→ (boundaries [(bin, frac)], bin expression, n_rows). One
    min/max/null-audit aggregation + one ≤ ``resolution``-row
    histogram; the cut walk runs on the driver over the histogram."""
    stats = df.select(
        F.min(score).alias("lo"),
        F.max(score).alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (score.isNull() | F.isnan(score.cast("double"))).cast("long")
        ).alias("bad"),
    ).collect()[0]
    if stats["bad"]:
        raise ValueError(
            f"{stats['bad']} rows have null/NaN {score} — a curriculum "
            "needs a total score; filter or impute upstream"
        )
    n = stats["n"]
    lo, hi = stats["lo"], stats["hi"]
    if n == 0:
        return [], F.lit(0).cast("long"), 0
    lo_d, hi_d = float(lo), float(hi)
    if hi_d > lo_d:
        bin_expr = F.least(
            F.floor(
                (score.cast("double") - F.lit(lo_d))
                / F.lit(hi_d - lo_d)
                * F.lit(resolution)
            ).cast("long"),
            F.lit(resolution - 1),
        )
    else:
        bin_expr = F.lit(0).cast("long")  # constant score: one bin
    hist = {
        r["b"]: r["c"]
        for r in df.select(bin_expr.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    # target rank t_k = k·n/n_shards (k = 1..n_shards−1); boundary k
    # lands in the bin where the cumulative count crosses t_k, at the
    # fraction of that bin's mass the crossing demands. One driver
    # walk, two pointers, ≤ resolution bins.
    bins_sorted = sorted(hist)
    bounds: list[tuple[int, float]] = []
    cum = 0
    bi = 0
    for k in range(1, n_shards):
        t_k = k * n / n_shards
        while bi < len(bins_sorted) and cum + hist[bins_sorted[bi]] < t_k:
            cum += hist[bins_sorted[bi]]
            bi += 1
        if bi >= len(bins_sorted):
            b = bins_sorted[-1]
            bounds.append((b, 1.0))
            continue
        b = bins_sorted[bi]
        frac = (t_k - cum) / hist[b]
        bounds.append((b, frac))
    return bounds, bin_expr, n


def assign_curriculum_shards(
    df: DataFrame,
    n_shards: int,
    score_col: str,
    key_cols: tuple[str, ...],
    ascending: bool = True,
    resolution: int = 100_000,
    seed: int = 42,
) -> DataFrame:
    """Tag each row with its curriculum ``shard``: shard 0 holds the
    lowest scores (``ascending``; highest when False), shard k's
    scores all ≤ shard k+1's — the global training order without a
    global sort. Membership is a pure function of (data, seed):
    quantile cuts from an exact fixed-width histogram, boundary-bin
    ties split by an independent content hash in the cut's exact
    proportion (see module notes). Raises on null/NaN scores."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if resolution < 1:
        raise ValueError(f"resolution must be >= 1, got {resolution}")
    if SHARD_COL in df.columns:
        raise ValueError(f"input already has column(s) ['{SHARD_COL}']")
    score = F.col(score_col)
    if not ascending:
        # negate up front: every rule below is ascending on s'
        score = -score.cast("double")
    bounds, bin_expr, n = _curriculum_cuts(df, score, n_shards, resolution)
    if n == 0 or n_shards == 1 or not bounds:
        return df.withColumn(SHARD_COL, F.lit(0).cast("int"))
    # unit hash u ∈ [0, 1): the tie-splitter for boundary bins — an
    # independent salt, on the 2^40 ring (2^20 collides at ~1k rows)
    u = (
        F.pmod(
            F.xxhash64(
                F.lit(seed), F.lit("curriculum"),
                *[F.col(c) for c in key_cols],
            ),
            F.lit(_UNIT_RING),
        ).cast("double")
        / F.lit(float(_UNIT_RING))
    )
    # shard = #boundaries the row sits ABOVE: above boundary (b_k, f_k)
    # iff bin > b_k, or bin == b_k and u ≥ f_k. Evaluated as a literal
    # boundary-array filter — codegen, O(n_shards) per row, no UDF.
    barr = F.array(*[F.lit(int(b)) for b, _ in bounds])
    farr = F.array(*[F.lit(float(f)) for _, f in bounds])
    above = F.zip_with(
        barr,
        farr,
        lambda b, f: (
            (bin_expr > b) | ((bin_expr == b) & (u >= f))
        ).cast("int"),
    )
    shard = F.aggregate(
        above, F.lit(0), lambda acc, x: acc + x
    ).cast("int")
    return df.withColumn(SHARD_COL, shard)


def curriculum(
    df: DataFrame,
    n_shards: int,
    score_col: str,
    key_cols: tuple[str, ...],
    ascending: bool = True,
    resolution: int = 100_000,
    seed: int = 42,
) -> DataFrame:
    """The in-plan form: rows clustered by curriculum shard and
    score-sorted within each — consumed front to back this IS the
    global score order (ties broken by key hash, then keys, so the
    permutation is total and reproducible). One range shuffle into
    ``n_shards`` tasks + one external within-task sort."""
    tagged = assign_curriculum_shards(
        df, n_shards, score_col, key_cols, ascending, resolution, seed
    )
    direction = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    tie = F.xxhash64(
        F.lit(seed), F.lit("curriculum"), *[F.col(c) for c in key_cols]
    )
    return tagged.repartitionByRange(
        n_shards, F.col(SHARD_COL)
    ).sortWithinPartitions(F.col(SHARD_COL).asc(), direction, tie, *key_cols)


def write_curriculum_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    score_col: str,
    key_cols: tuple[str, ...],
    ascending: bool = True,
    resolution: int = 100_000,
    seed: int = 42,
    manifest: bool = False,
) -> None:
    """Export as ``path/shard=K/`` parquet, one file per shard, rows
    score-ordered within each file and monotone ACROSS shard indices —
    a dataloader reading shard 0, 1, … sequentially consumes the
    corpus in curriculum order (same on-disk contract as
    write_shuffled_shards). ``manifest=True`` writes the same
    ``_export_manifest.json`` sidecar, with the curriculum parameters
    recorded."""
    curriculum(
        df, n_shards, score_col, key_cols, ascending, resolution, seed
    ).write.mode("overwrite").partitionBy(SHARD_COL).parquet(path)
    if manifest:
        _write_manifest(
            path,
            "curriculum",
            {
                "n_shards": n_shards,
                "score_col": score_col,
                "key_cols": list(key_cols),
                "ascending": ascending,
                "resolution": resolution,
                "seed": seed,
            },
            df.schema,
        )


# ---------------------------------------------------------------------------
# Export manifest — the dataloader hand-off contract, written down.
# A training job consuming `path/shard=K/` needs to know, without
# scanning data: how many shards, how many rows each, which files, in
# what schema, and exactly which (seed, keys, score…) produced the
# layout — both to size workers and to PROVE two runs consumed the
# same corpus. Row counts come from parquet FOOTERS (metadata reads,
# zero data scan, exact — the analyze_stats discipline); the document
# is atomic-renamed and underscore-prefixed so Spark/Hadoop readers
# ignore it during partition discovery.
# ---------------------------------------------------------------------------

MANIFEST_NAME = "_export_manifest.json"
_MANIFEST_VERSION = 1


def _manifest_payload(path: str, kind: str, params: dict, schema) -> dict:
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    if "://" in path:
        fsys, root = pafs.FileSystem.from_uri(path)
    else:
        import os

        fsys, root = pafs.LocalFileSystem(), os.path.abspath(path)
    sel = pafs.FileSelector(root, recursive=True)
    by_shard: dict[int, list] = {}
    prefix = f"{SHARD_COL}="
    for info in fsys.get_file_info(sel):
        if info.type != pafs.FileType.File:
            continue
        rel = info.path[len(root):].lstrip("/")
        parts = rel.split("/")
        base = parts[-1]
        if base.startswith(("_", ".")) or not base.endswith(".parquet"):
            continue
        if len(parts) != 2 or not parts[0].startswith(prefix):
            continue
        sid = int(parts[0][len(prefix):])
        n = pq.ParquetFile(
            fsys.open_input_file(info.path)
        ).metadata.num_rows
        by_shard.setdefault(sid, []).append((base, n))
    shards = [
        {
            "shard": sid,
            "n_rows": sum(n for _, n in sorted(files)),
            "files": [f for f, _ in sorted(files)],
        }
        for sid, files in sorted(by_shard.items())
    ]
    cols = [
        {"name": f.name, "type": f.dataType.simpleString()}
        for f in schema.fields
        if f.name not in (SHARD_COL, _ORDER_COL)
    ]
    return {
        "format": "etl-data-lake-export",
        "version": _MANIFEST_VERSION,
        "kind": kind,
        "params": params,
        "columns": cols,
        "n_shards_written": len(shards),
        "total_rows": sum(s["n_rows"] for s in shards),
        "shards": shards,
    }


def _write_manifest(path: str, kind: str, params: dict, schema) -> None:
    import json
    import os

    payload = _manifest_payload(path, kind, params, schema)
    doc = json.dumps(payload, sort_keys=True, separators=(",", ":"))
    if "://" in path:
        # object store: no rename primitive — single-shot put (the
        # store's own put atomicity applies)
        from pyarrow import fs as pafs

        fsys, root = pafs.FileSystem.from_uri(path)
        with fsys.open_output_stream(f"{root}/{MANIFEST_NAME}") as f:
            f.write(doc.encode("utf-8"))
        return
    target = os.path.join(path, MANIFEST_NAME)
    tmp = f"{target}.tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(doc)
    os.replace(tmp, target)


def read_export_manifest(path: str) -> dict:
    """Load and validate an export's manifest. Mirrors the writer's
    filesystem dispatch: an ``s3://``-style export reads back through
    the same pyarrow FileSystem the writer used (round-10 advice item
    — the reader was local-only, so the library couldn't read its own
    object-store manifests)."""
    import json
    import os

    if "://" in path:
        from pyarrow import fs as pafs

        fsys, root = pafs.FileSystem.from_uri(path)
        with fsys.open_input_stream(f"{root}/{MANIFEST_NAME}") as f:
            doc = json.loads(f.read().decode("utf-8"))
    else:
        with open(
            os.path.join(path, MANIFEST_NAME), encoding="utf-8"
        ) as f:
            doc = json.load(f)
    if doc.get("format") != "etl-data-lake-export":
        raise ValueError(f"{path}: not an export manifest")
    if doc.get("version") != _MANIFEST_VERSION:
        raise ValueError(
            f"{path}: unsupported manifest version {doc.get('version')!r}"
        )
    return doc
