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
) -> None:
    """Export as ``path/shard=K/`` parquet, ONE file per shard, rows
    in the deterministic shuffled order (parquet preserves row order
    for the sequential readers dataloaders use; a Spark re-read of one
    file may split it — consumers wanting order from Spark re-sort on
    the shard's key hash). All rows of a shard land in a single
    repartition task, so each directory gets exactly one file without
    a per-shard job or a driver loop."""
    shuffled(df, n_shards, key_cols, seed).write.mode(
        "overwrite"
    ).partitionBy(SHARD_COL).parquet(path)
