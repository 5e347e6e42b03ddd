"""``avrolake`` — Avro as a Spark Python DataSource, on the pure-
Python container codec (sources/avro_codec; this environment ships
neither the spark-avro connector jar nor a Python avro package, so
the format is implemented from the public spec).

    register_avro_source(spark)
    df.write.format("avrolake").mode("overwrite").save(path)
    spark.read.format("avrolake").load(path)                 # inferred
    spark.read.format("avrolake").schema(s).option(
        "on_error", "capture").load(path)                    # policy

Surface parity with the other lake formats (sources/readers):

* schema INFERENCE reads one container HEADER (bytes, not rows) —
  cheap, but explicit schemas remain the recommended path;
* ``on_error`` = ``fail`` (default — die on the first corrupt block)
  | ``drop`` (skip corrupt blocks) | ``capture`` (emit one row per
  corrupt block with the diagnostic in ``_corrupt`` and data columns
  null — the dead-letter surface ``split_corrupt`` consumes). The
  bad-record unit is the Avro BLOCK: the binary encoding has no
  per-row framing, so a corrupt row poisons exactly its block and
  the reader resyncs at the next sync marker (the spec's own
  recovery story);
* writes stage ``part-*.avro`` files per task and publish on driver
  commit (rename + on overwrite delete the files the planning-time
  listing saw) — a failed job leaves only invisible ``_tmp`` files.

Scale shape: one Spark partition per container file (an .avro file is
splittable at sync markers, but split planning needs a block index;
at lake scale files are written bounded — the writer rolls blocks at
``max_block_records`` and tasks at Spark's partition size). All
decode work is executor-side; the driver touches headers only.
"""

from __future__ import annotations

import datetime
import itertools
import os
import uuid
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from etl_data_lake_spark.sources.avro_codec import (
    AvroBlockError,
    AvroCodecError,
    iter_blocks,
    read_header,
    write_container,
    _Reader,
    _decode_value,
    _kind,
    validate_schema,
)

CORRUPT_COL = "_corrupt"
_EPOCH = datetime.datetime(1970, 1, 1)
_EPOCH_DATE = datetime.date(1970, 1, 1)


def capture_schema(schema: StructType) -> StructType:
    """The read schema for ``on_error=capture``: every data column
    nullable (a captured bad block emits one all-null row) plus the
    ``_corrupt`` diagnostic column."""
    fields = [
        StructField(f.name, f.dataType, True)
        for f in schema.fields
        if f.name != CORRUPT_COL
    ]
    return StructType(fields + [StructField(CORRUPT_COL, StringType())])


# ----------------------------------------------------------- schema bridge --


def spark_to_avro_schema(schema: StructType, name: str = "spark_row") -> dict:
    """Spark StructType → Avro record schema (nullable → null union)."""
    return {
        "type": "record",
        "name": name,
        "fields": [
            {
                "name": f.name,
                "type": _field_avro(f.dataType, f.nullable, f"{name}_{f.name}"),
            }
            for f in schema.fields
        ],
    }


def _field_avro(dt: DataType, nullable: bool, name: str):
    base = _type_avro(dt, name)
    return ["null", base] if nullable else base


def _type_avro(dt: DataType, name: str):
    if isinstance(dt, LongType):
        return "long"
    if isinstance(dt, IntegerType):
        return "int"
    if isinstance(dt, DoubleType):
        return "double"
    if isinstance(dt, FloatType):
        return "float"
    if isinstance(dt, StringType):
        return "string"
    if isinstance(dt, BooleanType):
        return "boolean"
    if isinstance(dt, BinaryType):
        return "bytes"
    if isinstance(dt, TimestampType):
        # instant semantics per the Avro spec; valid because the
        # writer/reader REFUSE non-UTC sessions (see _require_utc) —
        # under UTC the session-local naive datetime IS the instant
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, TimestampNTZType):
        # wall-clock semantics: the spec's local-timestamp-micros
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, ArrayType):
        return {
            "type": "array",
            "items": _field_avro(
                dt.elementType, dt.containsNull, f"{name}_item"
            ),
        }
    if isinstance(dt, MapType):
        if not isinstance(dt.keyType, StringType):
            raise AvroCodecError(
                f"Avro maps require string keys, got {dt.keyType}"
            )
        return {
            "type": "map",
            "values": _field_avro(
                dt.valueType, dt.valueContainsNull, f"{name}_value"
            ),
        }
    if isinstance(dt, StructType):
        return spark_to_avro_schema(dt, name)
    raise AvroCodecError(f"no Avro mapping for Spark type {dt}")


def avro_to_spark_schema(schema: dict) -> StructType:
    """Avro record schema → Spark StructType (inference path)."""
    if _kind(schema) != "record":
        raise AvroCodecError(f"top-level schema must be a record: {schema!r}")
    fields = []
    for f in schema["fields"]:
        dt, nullable = _avro_field_spark(f["type"])
        fields.append(StructField(f["name"], dt, nullable))
    return StructType(fields)


def _avro_field_spark(s) -> tuple[DataType, bool]:
    if isinstance(s, list):
        non_null = [b for b in s if _kind(b) != "null"]
        if len(non_null) != 1:
            raise AvroCodecError(f"unsupported union {s!r}")
        dt, _ = _avro_field_spark(non_null[0])
        return dt, True
    if isinstance(s, dict):
        lt = s.get("logicalType")
        if lt == "timestamp-micros":
            return TimestampType(), False
        if lt == "local-timestamp-micros":
            return TimestampNTZType(), False
        if lt == "date":
            return DateType(), False
        k = s["type"]
        if k == "array":
            idt, inul = _avro_field_spark(s["items"])
            return ArrayType(idt, inul), False
        if k == "map":
            vdt, vnul = _avro_field_spark(s["values"])
            return MapType(StringType(), vdt, vnul), False
        if k == "record":
            return avro_to_spark_schema(s), False
        s = k  # primitive spelled as {"type": "long"}
    prim = {
        "long": LongType(), "int": IntegerType(), "double": DoubleType(),
        "float": FloatType(), "string": StringType(),
        "boolean": BooleanType(), "bytes": BinaryType(),
    }.get(s)
    if prim is None:
        raise AvroCodecError(f"unsupported Avro type {s!r}")
    return prim, False


# ------------------------------------------------------- value conversion --


def to_avro_value(v, dt: DataType):
    """Spark-Python value → codec value (datetimes to micros, dates to
    days, nested Rows to dicts)."""
    if v is None:
        return None
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        # a tz-aware value converts to UTC (never just drops its
        # offset); naive values are UTC by the _require_utc contract
        base = (
            v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            if v.tzinfo
            else v
        )
        # exact integer micros from the timedelta fields: the float
        # total_seconds()*1e6 path double-rounds (off by 1µs past
        # ~2039, ~0.4µs error for current-era instants)
        td = base - _EPOCH
        return (
            td.days * 86_400_000_000
            + td.seconds * 1_000_000
            + td.microseconds
        )
    if isinstance(dt, DateType):
        return (v - _EPOCH_DATE).days
    if isinstance(dt, BinaryType):
        return bytes(v)
    if isinstance(dt, ArrayType):
        return [to_avro_value(x, dt.elementType) for x in v]
    if isinstance(dt, MapType):
        return {k: to_avro_value(x, dt.valueType) for k, x in v.items()}
    if isinstance(dt, StructType):
        return {
            f.name: to_avro_value(v[f.name], f.dataType)
            for f in dt.fields
        }
    return v


def from_avro_value(v, dt: DataType):
    """Codec value → the Python value the Spark row expects."""
    if v is None:
        return None
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return _EPOCH + datetime.timedelta(microseconds=v)
    if isinstance(dt, DateType):
        return _EPOCH_DATE + datetime.timedelta(days=v)
    if isinstance(dt, FloatType):
        return float(v)
    if isinstance(dt, ArrayType):
        return [from_avro_value(x, dt.elementType) for x in v]
    if isinstance(dt, MapType):
        return {k: from_avro_value(x, dt.valueType) for k, x in v.items()}
    if isinstance(dt, StructType):
        return tuple(
            from_avro_value(v.get(f.name), f.dataType) for f in dt.fields
        )
    return v


# ------------------------------------------------------------------- files --


def _has_instant(dt: DataType) -> bool:
    if isinstance(dt, TimestampType):
        return True
    if isinstance(dt, ArrayType):
        return _has_instant(dt.elementType)
    if isinstance(dt, MapType):
        return _has_instant(dt.valueType)
    if isinstance(dt, StructType):
        return any(_has_instant(f.dataType) for f in dt.fields)
    return False


def _require_utc(schema: StructType, side: str, tz=None) -> None:
    """Instant (TimestampType) columns only compose with Avro's
    timestamp-micros when the session clock is UTC: Spark hands the
    Python DataSource session-LOCAL naive datetimes. Refuse loudly
    instead of shifting instants silently; use timestamp_ntz (wall
    clock) or a UTC session.

    DataSource planning runs in a SESSION-LESS Python worker, so the
    timezone travels as the ``sessionTimeZone`` option (stamped by
    readers.read_avro / write_avro, the documented surface); with
    neither an option nor an active session the check is best-effort
    skipped — direct ``format("avrolake")`` users own the contract."""
    if not any(_has_instant(f.dataType) for f in schema.fields):
        return
    if tz is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return
        tz = spark.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"avrolake {side} with TimestampType columns requires "
            f"spark.sql.session.timeZone=UTC (got {tz!r}); instants "
            "would shift silently otherwise — use timestamp_ntz or a "
            "UTC session"
        )


def _list_avro_files(path: str) -> list[str]:
    p = Path(path)
    if p.is_file():
        return [str(p)]
    if p.is_dir():
        return sorted(
            str(f) for f in p.iterdir()
            if f.suffix == ".avro" and not f.name.startswith(("_", "."))
        )
    raise FileNotFoundError(f"no Avro file or directory at {path}")


# ------------------------------------------------------------------ reader --


class _AvroFilePart(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _check_read_options(options, schema: StructType) -> str:
    _require_utc(schema, "read", options.get("sessionTimeZone"))
    on_error = str(options.get("on_error", "fail")).lower()
    if on_error not in ("fail", "drop", "capture"):
        raise ValueError(
            f"on_error must be fail|drop|capture: {on_error}"
        )
    if on_error == "capture" and CORRUPT_COL not in schema.fieldNames():
        raise ValueError(
            f"on_error=capture needs a {CORRUPT_COL} string column "
            "in the read schema (readers.read_avro appends it)"
        )
    return on_error


def _read_avro_file(path: str, read_schema: StructType, on_error: str):
    """Decode one container under the block-level policy; yields row
    tuples in ``read_schema`` order (shared by the batch and stream
    readers — one policy implementation, two planners)."""
    fields = [f for f in read_schema.fields if f.name != CORRUPT_COL]
    capture = on_error == "capture"
    n_out = len(fields) + (1 if capture else 0)
    with open(path, "rb") as fh:
        data = fh.read()
    schema, codec, sync, off = read_header(data)
    validate_schema(schema)
    for n, payload in iter_blocks(data, codec, sync, off):
        if isinstance(payload, AvroBlockError):
            if on_error == "fail":
                raise AvroBlockError(f"{path}: {payload}")
            if capture:
                row = [None] * n_out
                row[-1] = f"{os.path.basename(path)}: {payload}"
                yield tuple(row)
            continue
        r = _Reader(payload)
        rows = []
        try:
            for _ in range(n):
                rec = _decode_value(r, schema)
                vals = [
                    from_avro_value(rec.get(f.name), f.dataType)
                    for f in fields
                ]
                if capture:
                    vals.append(None)
                rows.append(tuple(vals))
            if r.pos != len(payload):
                raise AvroBlockError(
                    f"{len(payload) - r.pos} trailing bytes in block"
                )
        except AvroBlockError as exc:
            # the whole block is suspect: emit none of its rows
            if on_error == "fail":
                raise AvroBlockError(f"{path}: {exc}") from exc
            if capture:
                row = [None] * n_out
                row[-1] = f"{os.path.basename(path)}: {exc}"
                yield tuple(row)
            continue
        yield from rows


class AvroBatchReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self._path = options["path"]
        self._on_error = _check_read_options(options, schema)
        self._schema = schema

    def partitions(self):
        return [_AvroFilePart(f) for f in _list_avro_files(self._path)]

    def read(self, partition):
        yield from _read_avro_file(
            partition.path, self._schema, self._on_error
        )


class AvroStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("avrolake")`` over a landing
    directory of immutable container files. Offsets carry the SORTED
    list of consumed file names — each micro-batch reads exactly the
    files that appeared since the previous offset, so replays are
    deterministic and exactly-once composes with an idempotent sink.
    The offset grows with the directory's file count (Spark's own
    file source keeps a compacted file log instead); a production
    landing zone bounds it by rotating directories — documented
    trade-off, fine at the bounded file counts a landing dir holds."""

    def __init__(self, options, schema: StructType):
        self._path = options["path"]
        self._on_error = _check_read_options(options, schema)
        self._schema = schema

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        # NOTE: Spark's Python runner may call this BEFORE
        # initialOffset — keep it side-effect free (listing only)
        try:
            files = _list_avro_files(self._path)
        except FileNotFoundError:
            files = []
        return {"files": [os.path.basename(f) for f in files]}

    def partitions(self, start: dict, end: dict):
        seen = set(start.get("files", ()))
        new = [f for f in end.get("files", ()) if f not in seen]
        if not new:
            # Spark requires at least one partition per planned batch;
            # an empty marker partition reads zero rows
            return [_AvroFilePart("")]
        return [
            _AvroFilePart(os.path.join(self._path, f)) for f in new
        ]

    def read(self, partition):
        if not partition.path:
            return
        yield from _read_avro_file(
            partition.path, self._schema, self._on_error
        )

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the stream's checkpoint


# ------------------------------------------------------------------ writer --


class _AvroWrote(WriterCommitMessage):
    def __init__(self, files: tuple):
        self.files = files


class AvroBatchWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        self._path = options["path"]
        self._codec = str(options.get("codec", "deflate"))
        self._block = int(options.get("maxBlockRecords", 4096))
        _require_utc(
            schema, "write", options.get("sessionTimeZone")
        )
        self._schema = schema
        self._avro_schema = spark_to_avro_schema(schema)
        validate_schema(self._avro_schema)
        # capture the files an overwrite replaces at PLANNING time: a
        # concurrent writer's files landing mid-job are not ours to
        # delete
        self._replaces = (
            tuple(_list_avro_files(self._path))
            if overwrite and Path(self._path).is_dir()
            else ()
        )
        self._overwrite = overwrite

    def write(self, iterator):
        # peek-then-chain keeps the write STREAMING: write_container
        # consumes the generator lazily and flushes per block, so peak
        # memory is one block, not the whole task partition
        it = iter(iterator)
        try:
            first = next(it)
        except StopIteration:
            return _AvroWrote(())
        fields = self._schema.fields
        recs = (
            {
                f.name: to_avro_value(row[i], f.dataType)
                for i, f in enumerate(fields)
            }
            for row in itertools.chain((first,), it)
        )
        os.makedirs(self._path, exist_ok=True)
        final = f"part-{uuid.uuid4().hex}.avro"
        write_container(
            os.path.join(self._path, f"_tmp-{final}"),
            self._avro_schema,
            recs,
            codec=self._codec,
            max_block_records=self._block,
        )
        return _AvroWrote((final,))

    def commit(self, messages):
        staged = [
            f for m in messages if m is not None for f in m.files
        ]
        for f in staged:
            os.replace(
                os.path.join(self._path, f"_tmp-{f}"),
                os.path.join(self._path, f),
            )
        if self._overwrite:
            keep = set(staged)
            for old in self._replaces:
                if os.path.basename(old) not in keep:
                    try:
                        os.remove(old)
                    except OSError:
                        pass

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            for f in m.files:
                try:
                    os.remove(os.path.join(self._path, f"_tmp-{f}"))
                except OSError:
                    pass


class AvroStreamWriter(DataSourceStreamWriter):
    """Streaming append sink: tasks stage invisible ``_tmp`` files,
    and the driver-side commit publishes them under DETERMINISTIC
    names ``part-{batchId}-{seq}.avro`` after clearing any previous
    publication of the same batch id — a replayed micro-batch
    (checkpoint recovery) re-publishes the identical batch instead of
    duplicating it, so the sink is exactly-once under Spark's
    at-least-once replay. (The txnlake sink gets the same property
    from writer watermarks; a plain directory gets it from
    batch-id-addressed names.)"""

    def __init__(self, options, schema: StructType):
        self._path = options["path"]
        self._codec = str(options.get("codec", "deflate"))
        self._block = int(options.get("maxBlockRecords", 4096))
        _require_utc(
            schema, "write", options.get("sessionTimeZone")
        )
        self._schema = schema
        self._avro_schema = spark_to_avro_schema(schema)
        validate_schema(self._avro_schema)

    def write(self, iterator):
        # same streaming peek-then-chain as the batch writer: never
        # materialize the task partition
        it = iter(iterator)
        try:
            first = next(it)
        except StopIteration:
            return _AvroWrote(())
        fields = self._schema.fields
        recs = (
            {
                f.name: to_avro_value(row[i], f.dataType)
                for i, f in enumerate(fields)
            }
            for row in itertools.chain((first,), it)
        )
        os.makedirs(self._path, exist_ok=True)
        name = f"stage-{uuid.uuid4().hex}"
        write_container(
            os.path.join(self._path, f"_tmp-{name}"),
            self._avro_schema,
            recs,
            codec=self._codec,
            max_block_records=self._block,
        )
        return _AvroWrote((name,))

    def commit(self, messages, batchId: int) -> None:
        # clear any earlier publication of this batch id FIRST: the
        # replay then lands the same rows under the same names
        try:
            existing = _list_avro_files(self._path)
        except FileNotFoundError:
            existing = []
        for old in existing:
            if os.path.basename(old).startswith(f"part-{batchId}-"):
                try:
                    os.remove(old)
                except OSError:
                    pass
        staged = sorted(
            f for m in messages if m is not None for f in m.files
        )
        for i, f in enumerate(staged):
            os.replace(
                os.path.join(self._path, f"_tmp-{f}"),
                os.path.join(self._path, f"part-{batchId}-{i}.avro"),
            )

    def abort(self, messages, batchId: int) -> None:  # type: ignore[override]
        for m in messages:
            if m is None:
                continue
            for f in m.files:
                try:
                    os.remove(os.path.join(self._path, f"_tmp-{f}"))
                except OSError:
                    pass


# --------------------------------------------------------------- datasource --


class AvroDataSource(DataSource):
    """``spark.read.format("avrolake")`` / ``df.write.format("avrolake")``."""

    @classmethod
    def name(cls) -> str:
        return "avrolake"

    def schema(self) -> StructType:
        files = _list_avro_files(self.options["path"])
        if not files:
            raise FileNotFoundError(
                f"no .avro files under {self.options['path']}"
            )
        with open(files[0], "rb") as fh:
            head = fh.read(1 << 20)  # header is tiny; 1 MiB is generous
        schema, _, _, _ = read_header(head)
        spark_schema = avro_to_spark_schema(schema)
        if str(self.options.get("on_error", "")).lower() == "capture":
            spark_schema = capture_schema(spark_schema)
        return spark_schema

    def reader(self, schema: StructType) -> DataSourceReader:
        return AvroBatchReader(self.options, schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return AvroStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        return AvroBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "avrolake streaming sink supports append output mode "
                "only (complete-mode would need per-batch truncation "
                "of the landing directory)"
            )
        return AvroStreamWriter(self.options, schema)


def register_avro_source(spark) -> None:
    """Register the ``avrolake`` format on this session (idempotent)."""
    spark.dataSource.register(AvroDataSource)
