"""Structured Streaming: watermark + tumbling-window agg over the
events table driven to completion with availableNow (the late-data
machinery the engine exposes for real streams; the reference's own
'streaming' is ordered micro-batch replication, SURVEY §2.9)."""

import os

from pyspark.sql import functions as F


def test_windowed_stream_equals_batch(spark, tmp_path):
    import shutil

    src = "/root/testdata/sf0.001/events.parquet"
    schema = spark.read.parquet(src).schema
    # FileStreamSource needs a directory of files
    stream_dir = str(tmp_path / "events_stream")
    os.makedirs(stream_dir)
    shutil.copy(src, os.path.join(stream_dir, "batch-0.parquet"))

    stream = spark.readStream.schema(schema).parquet(stream_dir)
    # Spark 4 reads naive parquet timestamps as TIMESTAMP_NTZ; watermarks
    # require event-time TIMESTAMP (LTZ) — cast (session TZ pinned UTC)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        spark.sql("SELECT window.start AS ws, event_type, n FROM win_out")
        .toPandas()
        .sort_values(["ws", "event_type"])
        .reset_index(drop=True)
    )
    batch = (
        spark.read.parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "5 minutes").alias("window"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
        .toPandas()
        .sort_values(["ws", "event_type"])
        .reset_index(drop=True)
    )
    # append-mode contract: a window is emitted only once the watermark
    # (max event time − 10 min) passes its END — the final window(s)
    # inside the last 10 minutes of data stay open. So: streamed ==
    # batch restricted to closed windows, and nothing extra.
    import pandas as pd

    max_ts = spark.read.parquet(src).agg(F.max(F.col("ts").cast("timestamp"))).first()[0]
    cutoff = max_ts - pd.Timedelta(minutes=10)
    closed = batch[
        pd.to_datetime(batch["ws"]) + pd.Timedelta(minutes=5) <= cutoff
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, closed, check_dtype=False)
    assert len(got) > 100
    assert len(batch) - len(got) <= 4  # only the trailing open windows differ
