"""Stream ≡ batch for the songplays fact + incremental exactly-once."""

from __future__ import annotations

import pytest

from tests.fixtures_sparkify import write_sparkify_fixture


@pytest.fixture(scope="module")
def sparkify(spark, tmp_path_factory):
    from etl_data_lake_spark.pipeline import run_pipeline

    raw = tmp_path_factory.mktemp("stream_raw")
    song_path, log_path = write_sparkify_fixture(raw)
    batch = run_pipeline(spark, song_path, log_path)
    return batch, song_path, log_path


def _fact_key_set(df):
    # everything except the surrogate key (strategies differ by design)
    return {
        tuple(r)
        for r in df.select(
            "start_time", "user_id", "level", "song_id", "artist_id",
            "session_id", "location", "user_agent", "year", "month",
        ).collect()
    }


def test_streamed_fact_equals_batch(spark, sparkify, tmp_path):
    from etl_data_lake_spark.pipeline.streaming_ingest import (
        read_log_stream,
        run_backfill,
        songplays_stream,
    )

    batch, _song_path, log_path = sparkify
    out = str(tmp_path / "songplays_stream")
    stream = songplays_stream(
        read_log_stream(spark, log_path), batch.songs, batch.artists
    )
    run_backfill(stream, out)
    got = spark.read.parquet(out)
    assert _fact_key_set(got) == _fact_key_set(batch.songplays)
    # surrogate keys still unique under the streamable strategy
    assert got.select("songplay_id").distinct().count() == got.count()


def test_incremental_run_processes_only_new_files(spark, sparkify, tmp_path):
    import json
    import shutil
    from pathlib import Path

    from etl_data_lake_spark.pipeline.streaming_ingest import (
        read_log_stream,
        run_backfill,
        songplays_stream,
    )

    batch, _song_path, log_path = sparkify
    # stage a copy of the log dir we can append to
    staged = tmp_path / "log_data"
    shutil.copytree(log_path, staged)
    out = str(tmp_path / "fact")
    ckpt = str(tmp_path / "ckpt")

    def backfill():
        stream = songplays_stream(
            read_log_stream(spark, str(staged)), batch.songs, batch.artists
        )
        run_backfill(stream, out, checkpoint_dir=ckpt)

    backfill()
    n1 = spark.read.parquet(out).count()

    # second run with NO new files: exactly-once means no new rows
    backfill()
    assert spark.read.parquet(out).count() == n1

    # append one new event file → only its rows arrive
    first_file = sorted(Path(staged).rglob("*.json"))[0]
    ev = json.loads(first_file.read_text().splitlines()[0])
    ev["ts"] += 86400000 * 90
    ev["sessionId"] = 777_777
    (Path(staged) / "2019" / "extra-events.json").parent.mkdir(
        parents=True, exist_ok=True
    )
    (Path(staged) / "2019" / "extra-events.json").write_text(json.dumps(ev))
    backfill()
    after = spark.read.parquet(out)
    assert after.count() == n1 + 1
    assert after.filter("session_id = 777777").count() == 1
