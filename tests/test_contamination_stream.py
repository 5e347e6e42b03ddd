"""Streaming decontamination gate (dedup/contamination.
contamination_stream_sink): batch≡stream equivalence however the
stream chops the corpus, exactly-once replay, the crash window
between the two appends, and checkpoint-wipe recovery — the round-9
expectations-sink pins applied to the round-10 gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_lake_spark.dedup.contamination import (
    contamination_stats,
    contamination_stream_sink,
)
from etl_data_lake_spark.sources.txn import TxnTable


def _docs(spark, mapping):
    return spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], "doc_id long, text string"
    )


def _uniq(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


BENCH_Q = "what is the capital of france paris obviously"  # 8 tokens


@pytest.fixture(scope="module")
def corpora(spark):
    """Docs 1/2/5 carry the planted benchmark leak (5 wholly), 3/4
    are clean (4 holds a 7-token prefix, below the w=8 floor) —
    test_contamination.py's fixture, streamed."""
    train = _docs(
        spark,
        {
            1: _uniq("a", 4) + " " + BENCH_Q + " " + _uniq("b", 5),
            2: _uniq("c", 3) + " " + BENCH_Q,
            3: _uniq("d", 15),
            4: _uniq("e", 4) + " " + " ".join(BENCH_Q.split()[:7]),
            5: BENCH_Q,
        },
    )
    reference = _docs(
        spark,
        {100: "intro words here " + BENCH_Q + " trailing rubric"},
    )
    return train, reference


def test_gate_routes_and_equals_batch_operator(spark, corpora, tmp_path):
    """Feeding the corpus through the gate in TWO micro-batches
    produces exactly the split the batch operator computes over the
    whole corpus at once (detection is per-document against a static
    reference — no cross-batch state to diverge)."""
    train, reference = corpora
    cp, qp = str(tmp_path / "clean"), str(tmp_path / "quar")
    fn = contamination_stream_sink(
        spark, reference, cp, qp, w=8, max_dup_ratio=0.0
    )
    fn(train.where("doc_id <= 2"), 0)
    fn(train.where("doc_id > 2"), 1)
    batch = contamination_stats(train, reference, w=8)
    want_bad = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans, r.dup_ratio)
        for r in batch.where("dup_ratio > 0").collect()
    }
    want_clean = {
        r.doc_id for r in batch.where("dup_ratio <= 0").collect()
    }
    clean = TxnTable(spark, cp).snapshot()
    quar = TxnTable(spark, qp).snapshot()
    assert {r.doc_id for r in clean.collect()} == want_clean == {3, 4}
    got_bad = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans, r.dup_ratio)
        for r in quar.collect()
    }
    assert got_bad == want_bad and set(got_bad) == {1, 2, 5}
    # quarantined rows keep the document columns for re-processing
    assert {"doc_id", "text"} <= set(quar.columns)


def test_threshold_spares_partial_contamination(spark, corpora, tmp_path):
    """max_dup_ratio > 0: docs under the share threshold pass (doc 1
    is 8/17 ≈ 0.47 contaminated, doc 5 is 1.0)."""
    train, reference = corpora
    cp, qp = str(tmp_path / "clean"), str(tmp_path / "quar")
    fn = contamination_stream_sink(
        spark, reference, cp, qp, w=8, max_dup_ratio=0.5
    )
    fn(train, 0)
    assert {
        r.doc_id for r in TxnTable(spark, qp).snapshot().collect()
    } == {2, 5}  # doc 2 is 8/11 ≈ 0.73
    assert {
        r.doc_id for r in TxnTable(spark, cp).snapshot().collect()
    } == {1, 3, 4}
    with pytest.raises(ValueError, match="max_dup_ratio"):
        contamination_stream_sink(spark, reference, cp, qp,
                                  max_dup_ratio=1.0)


def test_replay_and_crash_window_are_exactly_once(
    spark, corpora, tmp_path
):
    train, reference = corpora
    cp, qp = str(tmp_path / "clean"), str(tmp_path / "quar")
    fn = contamination_stream_sink(
        spark, reference, cp, qp, w=8, app_id="gate"
    )
    b0 = train.where("doc_id <= 3")
    fn(b0, 0)
    ct, qt = TxnTable(spark, cp), TxnTable(spark, qp)
    v_c, v_q = ct.latest_version(), qt.latest_version()
    fn(b0, 0)  # full replay: both tables unchanged
    assert (ct.latest_version(), qt.latest_version()) == (v_c, v_q)
    # crash window: batch 1's CLEAN append landed, quarantine did not
    b1 = train.where("doc_id > 3")
    ct.append(b1.where("doc_id = 4"), app_id="gate", txn_seq=1)
    fn(b1, 1)  # driver replays the whole batch
    assert sorted(
        r.doc_id for r in ct.snapshot().collect()
    ) == [3, 4]
    assert sorted(
        r.doc_id for r in qt.snapshot().collect()
    ) == [1, 2, 5]


def test_real_stream_and_checkpoint_wipe_recovery(
    spark, corpora, tmp_path
):
    """End to end through a real file stream (availableNow), then the
    checkpoint is WIPED and the stream re-runs from scratch: every
    batch replays, both tables come out unchanged."""
    train, reference = corpora
    src = str(tmp_path / "src")
    train.repartition(3).write.parquet(src)
    cp, qp = str(tmp_path / "clean"), str(tmp_path / "quar")
    fn = contamination_stream_sink(
        spark, reference, cp, qp, w=8, app_id="gate"
    )

    def run(ck):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(fn)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(str(tmp_path / "ck1"))
    ct, qt = TxnTable(spark, cp), TxnTable(spark, qp)
    clean1 = sorted(r.doc_id for r in ct.snapshot().collect())
    quar1 = sorted(r.doc_id for r in qt.snapshot().collect())
    assert clean1 == [3, 4] and quar1 == [1, 2, 5]
    v_c, v_q = ct.latest_version(), qt.latest_version()
    run(str(tmp_path / "ck2"))  # wiped checkpoint: full source replay
    assert sorted(r.doc_id for r in ct.snapshot().collect()) == clean1
    assert sorted(r.doc_id for r in qt.snapshot().collect()) == quar1
    assert (ct.latest_version(), qt.latest_version()) == (v_c, v_q)
