"""Avro support (sources/avro_codec + avro_source + readers.read_avro):
pure-Python container codec round-trips, block-level bad-record
policies with sync-marker recovery, the avrolake DataSource, and
cross-implementation interop against the JVM Avro library that ships
on Spark's classpath (avro-1.12.1.jar) — our writer's bytes must be
readable by the reference implementation and vice versa."""

from __future__ import annotations

import datetime
import os

import pytest

from etl_data_lake_spark.sources import avro_codec as A

_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "x", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "b", "type": "bytes"},
        {"name": "ok", "type": "boolean"},
    ],
}


def _recs(n):
    return [
        {
            "id": i,
            "s": None if i % 3 == 0 else f"row{i}",
            "x": i * 0.25,
            "tags": list(range(i % 4)),
            "m": {"a": i, "b": -i},
            "b": bytes([i % 256, 255]),
            "ok": i % 2 == 0,
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_codec_round_trip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    recs = _recs(1000)
    n = A.write_container(p, _SCHEMA, recs, codec=codec, max_block_records=128)
    schema, out, bad = A.read_container(p)
    assert (n, schema, bad) == (1000, _SCHEMA, [])
    assert out == recs


def _corrupt_third_block(path):
    """Smash the third data block's framing (after header sync + two
    block syncs); the varints become unreadable."""
    data = bytearray(open(path, "rb").read())
    idx = -1
    for _ in range(3):
        idx = data.find(b"S" * 16, idx + 1)
    data[idx + 16 : idx + 28] = b"\xff" * 12
    open(path, "wb").write(bytes(data))


def test_block_policies_and_sync_recovery(tmp_path):
    p = str(tmp_path / "t.avro")
    recs = _recs(1000)
    A.write_container(
        p, _SCHEMA, recs, codec="null", max_block_records=100,
        sync=b"S" * 16,
    )
    _corrupt_third_block(p)
    with pytest.raises(A.AvroBlockError):
        A.read_container(p, on_error="fail")
    _, out, bad = A.read_container(p, on_error="capture")
    ids = {r["id"] for r in out}
    # exactly block 3 (ids 200-299) lost; everything after recovered
    assert ids == {i for i in range(1000) if not 200 <= i < 300}
    assert len(bad) == 1
    _, out2, bad2 = A.read_container(p, on_error="drop")
    assert out2 == out and bad2 == []


def test_unsupported_schema_rejected(tmp_path):
    with pytest.raises(A.AvroCodecError, match="unsupported"):
        A.write_container(
            str(tmp_path / "x.avro"),
            {"type": "record", "name": "r",
             "fields": [{"name": "e", "type": {
                 "type": "enum", "name": "c", "symbols": ["A"]}}]},
            [],
        )
    with pytest.raises(A.AvroCodecError, match="union"):
        A.validate_schema(["int", "string"])  # non-nullable union


def test_spark_round_trip_all_types(spark, tmp_path):
    from etl_data_lake_spark.sources.readers import read_avro, write_avro

    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, "a", 1.5, True, bytearray(b"\x00\xff"), ["x", "y"],
             {"k": 2},
             datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
             datetime.date(2024, 2, 3), (7, "in")),
            (2, None, -0.5, False, bytearray(b""), [], {}, None, None,
             None),
        ],
        "id long, name string, score double, ok boolean, blob binary, "
        "tags array<string>, m map<string,long>, ts timestamp_ntz, "
        "d date, nested struct<x: long, s: string>",
    )
    write_avro(df, p)
    back = read_avro(spark, p, df.schema, on_error="fail")
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    # header-only schema inference matches
    inferred = read_avro(spark, p, None, on_error="fail")
    assert inferred.schema == df.schema
    assert inferred.count() == 2


def test_spark_capture_policy_and_split(spark, tmp_path):
    from etl_data_lake_spark.sources.readers import (
        read_avro,
        split_corrupt,
        write_avro,
    )

    p = str(tmp_path / "t")
    recs = _recs(500)
    os.makedirs(p)
    A.write_container(
        f"{p}/part-0.avro", _SCHEMA, recs, codec="null",
        max_block_records=50, sync=b"S" * 16,
    )
    _corrupt_third_block(f"{p}/part-0.avro")
    from etl_data_lake_spark.sources.avro_source import avro_to_spark_schema

    schema = avro_to_spark_schema(_SCHEMA)
    with pytest.raises(Exception):
        read_avro(spark, p, schema, on_error="fail").collect()
    df = read_avro(spark, p, schema, on_error="capture")
    clean, bad = split_corrupt(df)
    # 50-record blocks: exactly the smashed third block (ids 100-149) lost
    assert clean.count() == 450
    assert sorted(r["id"] for r in clean.collect()) == [
        i for i in range(500) if not 100 <= i < 150
    ]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "part-0.avro" in bad_rows[0]["_corrupt"]
    dropped = read_avro(spark, p, schema, on_error="drop")
    assert dropped.count() == 450


def test_overwrite_and_append_modes(spark, tmp_path):
    from etl_data_lake_spark.sources.readers import read_avro, write_avro

    p = str(tmp_path / "t")
    df1 = spark.range(10).selectExpr("id", "CAST(id AS STRING) AS s")
    df2 = spark.range(10, 15).selectExpr("id", "CAST(id AS STRING) AS s")
    write_avro(df1.coalesce(1), p)
    write_avro(df2.coalesce(1), p, mode="append")
    assert read_avro(spark, p, df1.schema, on_error="fail").count() == 15
    write_avro(df2.coalesce(1), p, mode="overwrite")
    got = read_avro(spark, p, df1.schema, on_error="fail")
    assert sorted(r["id"] for r in got.collect()) == [10, 11, 12, 13, 14]
    # overwrite removed the replaced part files on disk too
    assert all(
        f.startswith("part-") for f in os.listdir(p)
    ) and len(os.listdir(p)) == 1


def test_jvm_interop_our_writer_their_reader(spark, tmp_path):
    """The reference implementation (org.apache.avro on Spark's
    classpath) must read our container bytes verbatim."""
    p = str(tmp_path / "t.avro")
    recs = [
        {"id": 1, "s": "hi", "x": 1.5, "tags": [1, 2], "m": {"a": 1},
         "b": b"\x01", "ok": True},
        {"id": 2, "s": None, "x": -0.25, "tags": [], "m": {},
         "b": b"", "ok": False},
    ]
    A.write_container(p, _SCHEMA, recs, codec="deflate")
    jvm = spark._jvm
    fr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    import json

    assert json.loads(fr.getSchema().toString()) == _SCHEMA
    got = []
    while fr.hasNext():
        got.append(json.loads(str(fr.next())))
    fr.close()
    want = [
        {**r, "b": r["b"].decode("latin-1")} for r in recs
    ]  # GenericData renders bytes as an escaped string; compare sans b
    for g, w in zip(got, want):
        for k in ("id", "s", "x", "tags", "m", "ok"):
            assert g[k] == w[k], (k, g, w)
    assert len(got) == 2


def test_jvm_interop_their_writer_our_reader(spark, tmp_path):
    """And the reverse: bytes produced by the reference implementation
    decode identically through our codec."""
    p = str(tmp_path / "jvm.avro")
    jvm = spark._jvm
    import json

    schema_json = json.dumps(
        {"type": "record", "name": "r", "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "x", "type": "double"},
        ]}
    )
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    w.create(sch, jvm.java.io.File(p))
    for i, s in [(1, "a"), (2, None), (3, "c")]:
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("id", jvm.java.lang.Long(i))
        rec.put("s", s)
        rec.put("x", jvm.java.lang.Double(i * 0.5))
        w.append(rec)
    w.close()
    schema, out, bad = A.read_container(p)
    assert bad == []
    assert out == [
        {"id": 1, "s": "a", "x": 0.5},
        {"id": 2, "s": None, "x": 1.0},
        {"id": 3, "s": "c", "x": 1.5},
    ]


def test_reader_rejects_bad_options(spark, tmp_path):
    from etl_data_lake_spark.sources.readers import read_avro, write_avro

    p = str(tmp_path / "t")
    write_avro(spark.range(3), p)
    with pytest.raises(ValueError, match="on_error"):
        read_avro(spark, p, None, on_error="explode")
    from etl_data_lake_spark.sources.avro_source import spark_to_avro_schema
    from pyspark.sql.types import (
        IntegerType, MapType, StringType, StructField, StructType,
    )

    with pytest.raises(A.AvroCodecError, match="string keys"):
        spark_to_avro_schema(
            StructType([StructField(
                "m", MapType(IntegerType(), StringType()))])
        )


def _stream_once(spark, src, sink, ckpt, schema):
    q = (
        spark.readStream.format("avrolake").schema(schema).load(src)
        .writeStream.format("avrolake").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()


def test_streaming_read_write_incremental_exactly_once(spark, tmp_path):
    """avrolake streamReader consumes only files that appeared since
    the checkpointed offset; the stream sink publishes batch-id-
    addressed names so replays never duplicate."""
    from etl_data_lake_spark.sources.avro_source import register_avro_source
    from etl_data_lake_spark.sources.readers import write_avro

    register_avro_source(spark)
    src, sink, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ck")
    )
    schema = "id long, s string"
    write_avro(
        spark.range(5).selectExpr("id", "CAST(id AS STRING) AS s"),
        src, mode="append",
    )
    _stream_once(spark, src, sink, ckpt, schema)

    def sink_ids():
        return sorted(
            r.id
            for r in spark.read.format("avrolake").schema(schema)
            .load(sink).collect()
        )

    assert sink_ids() == [0, 1, 2, 3, 4]
    # new landing files: the next run emits ONLY them
    write_avro(
        spark.range(5, 8).selectExpr("id", "CAST(id AS STRING) AS s"),
        src, mode="append",
    )
    _stream_once(spark, src, sink, ckpt, schema)
    assert sink_ids() == list(range(8))
    # no new files: a further run adds nothing (exactly-once)
    _stream_once(spark, src, sink, ckpt, schema)
    assert sink_ids() == list(range(8))
    import os as _os

    assert all(
        f.startswith("part-") and f.endswith(".avro")
        for f in _os.listdir(sink)
    )


def test_stream_writer_rejects_complete_mode(spark, tmp_path):
    from etl_data_lake_spark.sources.avro_source import register_avro_source
    from etl_data_lake_spark.sources.readers import write_avro

    register_avro_source(spark)
    src = str(tmp_path / "src")
    write_avro(spark.range(3).selectExpr("id", "COUNT(*) OVER () AS n"), src)
    stream = (
        spark.readStream.format("avrolake").schema("id long, n long")
        .load(src).groupBy().count()
    )
    with pytest.raises(Exception, match="append output mode"):
        q = (
            stream.writeStream.format("avrolake")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def test_timestamp_logical_types_and_utc_guard(spark, tmp_path):
    """TimestampType maps to timestamp-micros (instant), timestamp_ntz
    to local-timestamp-micros (wall clock) — per the Avro spec — and
    instant columns REFUSE a non-UTC session instead of silently
    shifting (review regression)."""
    import json

    from etl_data_lake_spark.sources.readers import read_avro, write_avro

    p = str(tmp_path / "t")
    df = spark.sql(
        "SELECT TIMESTAMP'2024-01-02 03:04:05.123456' AS instant, "
        "TIMESTAMP_NTZ'2024-01-02 03:04:05.123456' AS wall"
    )
    write_avro(df.coalesce(1), p)
    part = next(
        f for f in os.listdir(p) if f.endswith(".avro")
    )
    head = open(f"{p}/{part}", "rb").read(1 << 16)
    schema, _, _, _ = A.read_header(head)
    def lt(t):  # literals plan non-nullable → bare type, else union
        return (t[1] if isinstance(t, list) else t)["logicalType"]

    lts = {f["name"]: lt(f["type"]) for f in schema["fields"]}
    assert lts == {
        "instant": "timestamp-micros",
        "wall": "local-timestamp-micros",
    }
    back = read_avro(spark, p, None, on_error="fail")
    assert back.schema["instant"].dataType.simpleString() == "timestamp"
    assert back.schema["wall"].dataType.simpleString() == "timestamp_ntz"
    assert back.collect() == df.collect()

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(Exception, match="timeZone=UTC"):
            write_avro(df, str(tmp_path / "t2"))
        with pytest.raises(Exception, match="timeZone=UTC"):
            read_avro(spark, p, df.schema, on_error="fail").collect()
        # wall-clock-only schemas stay usable in any timezone
        ntz = spark.sql(
            "SELECT TIMESTAMP_NTZ'2024-01-02 03:04:05' AS wall"
        )
        write_avro(ntz.coalesce(1), str(tmp_path / "t3"))
        got = read_avro(
            spark, str(tmp_path / "t3"), ntz.schema, on_error="fail"
        )
        assert got.collect() == ntz.collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_timestamp_micros_exact_far_future(spark, tmp_path):
    """Timestamp encoding computes micros as exact integers from the
    timedelta fields (ADVICE r8): the old float total_seconds()*1e6
    path was off by 1µs for instants past ~2039. Pin the encoder
    value directly AND a full write/read round trip."""
    from pyspark.sql.types import TimestampNTZType

    from etl_data_lake_spark.sources.avro_source import to_avro_value
    from etl_data_lake_spark.sources.readers import read_avro, write_avro

    # 2045-06-01 12:00:00.000001 UTC — 1µs fraction past the float
    # precision cliff (the old code returned ...000002 here)
    dt = datetime.datetime(2045, 6, 1, 12, 0, 0, 1)
    micros = to_avro_value(dt, TimestampNTZType())
    epoch = datetime.datetime(1970, 1, 1)
    td = dt - epoch
    exact = td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds
    assert micros == exact
    assert micros % 10 == 1  # the trailing µs digit survives

    p = str(tmp_path / "far")
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ'2045-06-01 12:00:00.000001' AS wall"
    )
    write_avro(df.coalesce(1), p)
    got = read_avro(spark, p, df.schema, on_error="fail")
    assert got.collect() == df.collect()


def test_avro_writer_streams_blocks(tmp_path):
    """The writers never materialize the task partition (ADVICE r8):
    feed AvroBatchWriter.write a generator that trips a flag per row
    and assert the writer produced multiple blocks (so encoding
    consumed the iterator lazily, block by block) and zero files for
    an empty iterator."""
    from pyspark.sql.types import LongType, StructField, StructType

    from etl_data_lake_spark.sources.avro_source import AvroBatchWriter

    schema = StructType([StructField("id", LongType(), True)])
    path = str(tmp_path / "stream_blocks")
    w = AvroBatchWriter(
        {"path": path, "maxBlockRecords": "8", "sessionTimeZone": "UTC"},
        schema,
        overwrite=False,
    )
    # empty partition: no file at all
    msg = w.write(iter(()))
    assert msg.files == ()

    rows = ((i,) for i in range(100))
    msg = w.write(rows)
    assert len(msg.files) == 1
    w.commit([msg])
    part = os.path.join(path, msg.files[0])
    n = 0
    with open(part, "rb") as fh:
        data = fh.read()
    schema_j, codec, sync, pos = A.read_header(data)
    blocks = 0
    for n_recs, _payload in A.iter_blocks(data, codec, sync, pos):
        blocks += 1
        n += n_recs
    assert n == 100 and blocks >= 12  # 100 rows / 8-row blocks
