"""Streaming ingest: append-only stream → table.

The reference's only streaming surface is append ingest — stdin or Kafka
rows parsed and inserted into a catalog table (Import/StreamImporter.cpp,
Import/KafkaImporter.cpp; SURVEY.md §2.9: no stream queries, no watermarks).
Spark-first: Structured Streaming `readStream` → `writeStream`, append
mode, checkpointed. File-source ingest covers the stdin/file case; the
Kafka source is the same call shape behind `format("kafka")` (available
when the kafka connector jar ships with the cluster — gated here).

Design for scale: ingest partitions by arrival; `maxFilesPerTrigger`
bounds per-batch work, checkpointing gives exactly-once into the sink
table. Downstream batch queries read the sink table like any other.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from compass_query_optimizer_spark.sources.copy_io import CopyParams


@dataclass
class StreamParams:
    """Ingest knobs (analog of StreamInsert's batch size / poll interval)."""

    max_files_per_trigger: int = 16
    checkpoint_dir: str | None = None
    available_now: bool = False  # drain-what-exists-then-stop (tests/backfill)


def stream_csv_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    sink_path: str,
    copy_params: CopyParams | None = None,
    stream_params: StreamParams | None = None,
) -> StreamingQuery:
    """File-drop CSV ingest → parquet table at ``sink_path`` (the analog of
    StreamImporter's delimited stdin rows appended into a table)."""
    cp = copy_params or CopyParams()
    sp = stream_params or StreamParams()
    src = (
        spark.readStream.schema(schema)
        .option("sep", cp.delimiter)
        .option("header", cp.has_header)
        .option("nullValue", cp.null_str)
        .option("maxFilesPerTrigger", sp.max_files_per_trigger)
        .csv(source_dir)
    )
    writer = (
        src.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_path)
        .option(
            "checkpointLocation",
            sp.checkpoint_dir or f"{sink_path}_checkpoint",
        )
    )
    if sp.available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    """Source options for the Kafka reader, as the exact string map Spark's
    DataSource sees. Split out of :func:`stream_kafka_ingest` so the call
    shape — including the offset-management knobs — stays unit-testable
    while the connector jar is absent from the container (`.load()` is the
    first point that needs the jar)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def stream_kafka_ingest(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    sink_path: str,
    stream_params: StreamParams | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
    watermark: tuple[str, str] | None = None,
) -> StreamingQuery:
    """Kafka append ingest (Import/KafkaImporter.cpp analog): raw
    key/value bytes with Kafka metadata appended to a parquet table.
    Requires the spark-sql-kafka connector on the cluster classpath.

    Offset/late-data knobs (the consumer-group offset management the
    reference's importer owns itself, expressed as source options):

    - ``starting_offsets``: "earliest" / "latest" / per-partition JSON —
      where a NEW query (no checkpoint yet) begins; restarts always resume
      from the checkpoint.
    - ``max_offsets_per_trigger``: per-batch record cap across partitions —
      bounds batch size the way StreamParams.max_files_per_trigger does for
      file drops (the importer's poll-batch analog).
    - ``fail_on_data_loss``: fail vs. skip when offsets were aged out by
      retention before being read.
    - ``watermark``: optional (event_time_col, delay) applied to the loaded
      stream (e.g. ("timestamp", "10 minutes"), Kafka's broker-append time)
      so downstream stateful sinks can bound their state.
    """
    sp = stream_params or StreamParams()
    reader = spark.readStream.format("kafka").options(
        **kafka_source_options(
            bootstrap_servers,
            topic,
            starting_offsets=starting_offsets,
            max_offsets_per_trigger=max_offsets_per_trigger,
            fail_on_data_loss=fail_on_data_loss,
        )
    )
    try:
        src = reader.load()
    except Exception as e:  # pragma: no cover - no kafka jar in test env
        raise NotImplementedError(
            "kafka source requires the spark-sql-kafka connector jar"
        ) from e
    if watermark is not None:
        col, delay = watermark
        src = src.withWatermark(col, delay)
    return (
        src.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_path)
        .option(
            "checkpointLocation",
            sp.checkpoint_dir or f"{sink_path}_checkpoint",
        )
        .start()
    )


def stream_upsert_ingest(
    spark,
    source_df,
    sink_path: str,
    key_cols: list[str],
    n_buckets: int = 16,
    checkpoint_dir: str | None = None,
):
    """Streaming keyed upsert via foreachBatch: each micro-batch is merged
    into a bucket-partitioned parquet table — last write per key wins —
    using dynamic partition overwrite, so only the buckets a batch touches
    are rewritten (never the whole table).

    Idempotence: replaying a batch produces the same table state (the
    merge is deterministic in the batch contents, and overwrite replaces
    rather than appends), which is what makes foreachBatch exactly-once
    under Structured Streaming's at-least-once batch redelivery. At
    100 TB, `n_buckets` bounds rewrite amplification: one batch touching
    k keys rewrites at most min(k, n_buckets) buckets.
    """
    from pyspark.sql import functions as F

    bucket_expr = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets))

    def merge_batch(batch_df, batch_id):
        s = batch_df.sparkSession
        incoming = batch_df.withColumn("__bucket", bucket_expr.cast("int"))
        # existence must be decided by the filesystem, not by whether the
        # read raised: treating ANY read exception as "no table yet" turns
        # a transient failure on an EXISTING sink into a dynamic overwrite
        # that silently drops the kept rows of every touched bucket
        jpath = s._jvm.org.apache.hadoop.fs.Path(sink_path)
        fs = jpath.getFileSystem(s._jsc.hadoopConfiguration())
        existing = s.read.parquet(sink_path) if fs.exists(jpath) else None
        if existing is not None:
            touched = [r["__bucket"] for r in incoming.select("__bucket").distinct().collect()]
            keep = existing.filter(F.col("__bucket").isin(touched)).join(
                incoming.select(*key_cols).distinct(), key_cols, "left_anti"
            )
            merged = keep.unionByName(incoming)
        else:
            merged = incoming
        (
            # per-write dynamic overwrite: scoping the mode to this writer
            # (not session conf) means concurrent writers on the shared
            # session keep their own semantics
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__bucket")
            .parquet(sink_path)
        )

    return (
        source_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir or f"{sink_path}_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
