"""Embedding-space drift (operators/embedding_drift.py, round 11):
self-drift ≡ 0, planted distribution shift detected (and monotone in
shift size), streaming fold ≡ from-scratch, exactly-once replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.operators.embedding_drift import (
    embedding_cell_histogram,
    embedding_drift,
    embedding_histogram_sink,
)
from etl_data_lake_spark.operators.profile import (
    drift_report_from_histograms,
    population_stability_index,
    read_histogram,
)
from etl_data_lake_spark.similarity.kmeans import kmeans_fit
from etl_data_lake_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def cells(emb):
    centroids, _ = kmeans_fit(emb, 8, "vec_id", "embedding")
    return centroids


def test_self_drift_is_exactly_zero(emb, cells):
    h = embedding_cell_histogram(emb, cells)
    report = drift_report_from_histograms(h, h)
    assert population_stability_index(report) == 0.0
    assert report.count() <= 8


def test_planted_shift_detected_and_monotone(spark, emb, cells):
    """Concentrating the candidate corpus on a subset of cells is the
    canonical 'crawl slid toward fewer topics' signal: PSI must clear
    the standard 0.25 alarm, and a harder concentration must score
    HIGHER than a milder one."""
    h_ref = embedding_cell_histogram(emb, cells)
    # candidate corpora: vectors whose nearest cell is in a shrinking set
    from etl_data_lake_spark.similarity.kmeans import assign_clusters

    a = assign_clusters(emb, cells, "vec_id", "embedding")
    with_cell = emb.join(a, "vec_id")
    mild = with_cell.where(F.col("cluster") < 6)   # drop 2 cells
    hard = with_cell.where(F.col("cluster") < 2)   # drop 6 cells
    psi_mild = population_stability_index(
        drift_report_from_histograms(
            h_ref, embedding_cell_histogram(mild, cells)
        )
    )
    psi_hard = population_stability_index(
        drift_report_from_histograms(
            h_ref, embedding_cell_histogram(hard, cells)
        )
    )
    assert psi_hard > psi_mild > 0.0
    assert psi_hard > 0.25


def test_one_shot_embedding_drift(emb):
    """The convenience form: reference vs itself ≡ 0; reference vs a
    biased half > 0."""
    centroids, report = embedding_drift(emb, emb, n_cells=6)
    assert population_stability_index(report) == 0.0
    assert len(centroids) == 6


def test_streaming_fold_equals_from_scratch(spark, emb, cells, tmp_path):
    """Folding micro-batches through the sink must equal the one-shot
    histogram of the whole corpus EXACTLY (count addition is exact),
    and replaying a batch id must no-op."""
    state = str(tmp_path / "emb_hist")
    sink = embedding_histogram_sink(spark, state, cells)
    b1 = emb.where(F.col("vec_id") % 2 == 0)
    b2 = emb.where(F.col("vec_id") % 2 == 1)
    sink(b1, 0)
    sink(b2, 1)
    folded = {
        r["bucket"]: r["n"] for r in read_histogram(spark, state).collect()
    }
    scratch = {
        r["bucket"]: r["n"]
        for r in embedding_cell_histogram(emb, cells).collect()
    }
    assert folded == scratch
    sink(b2, 1)  # replay: txn watermark no-ops
    again = {
        r["bucket"]: r["n"] for r in read_histogram(spark, state).collect()
    }
    assert again == scratch
    # the monitoring read: ≤ k-row join, PSI vs the reference is 0
    psi = population_stability_index(
        drift_report_from_histograms(
            embedding_cell_histogram(emb, cells),
            read_histogram(spark, state),
        )
    )
    assert psi == 0.0


def test_validation(spark, emb):
    with pytest.raises(ValueError, match="centroid"):
        embedding_cell_histogram(emb, [])
    with pytest.raises(ValueError, match="centroid"):
        embedding_histogram_sink(spark, "/tmp/x", [])


def test_real_stream_3_microbatches_folds_to_batch(
    spark, emb, cells, tmp_path
):
    """Round-12 pin (r11-verdict #8): the sink driven by an ACTUAL
    Structured Streaming query — a 3-file source at maxFilesPerTrigger
    = 1 ⇒ 3 micro-batches — must fold to the from-scratch histogram
    of the whole corpus, and a full source REPLAY through a fresh
    checkpoint (batch ids restart at 0) must no-op on the txn
    watermark: state and version unchanged."""
    from etl_data_lake_spark.sources.txn import TxnTable

    src = str(tmp_path / "src")
    emb.repartition(3).write.parquet(src)
    state = str(tmp_path / "emb_hist_stream")
    sink = embedding_histogram_sink(spark, state, cells)
    schema = emb.schema.simpleString()[7:-1].replace(":", " ")

    def run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(str(tmp_path / "ck1"))
    tbl = TxnTable(spark, state)
    v1 = tbl.latest_version()
    assert v1 >= 3  # one txn commit per micro-batch
    folded = {
        r["bucket"]: r["n"] for r in read_histogram(spark, state).collect()
    }
    scratch = {
        r["bucket"]: r["n"]
        for r in embedding_cell_histogram(emb, cells).collect()
    }
    assert folded == scratch
    # continuous monitoring readout: PSI vs the frozen reference ≡ 0
    assert population_stability_index(
        drift_report_from_histograms(
            embedding_cell_histogram(emb, cells),
            read_histogram(spark, state),
        )
    ) == 0.0
    run(str(tmp_path / "ck2"))  # wiped checkpoint: full source replay
    again = {
        r["bucket"]: r["n"] for r in read_histogram(spark, state).collect()
    }
    assert again == scratch
    assert tbl.latest_version() == v1  # replayed batch ids no-opped
