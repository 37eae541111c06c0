"""spark-submit entry point — the north-rule launch mode:

    spark-submit --py-files <engine.zip> scripts/run_stream_job.py \
        [sf_dir] [cores-hint] [out_dir]

Runs the flagship streaming pipeline (stage -> watermark -> grid range query
-> tumbling count -> exactly-once sink) end-to-end and prints a one-line JSON
summary. On a cluster, --master/--num-executors come from spark-submit args;
the engine code arrives via --py-files (no repo checkout needed on executors).
"""

from __future__ import annotations

import json
import sys
import tempfile


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp(prefix="sfs_job_")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("spatialflink-stream-job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from spatialflink_spark.config import DEFAULT_CONFIG as C, DEFAULT_QUERY_POINTS
    from spatialflink_spark.sources.streams import (
        read_sequences_stream,
        stage_replay_files,
    )
    from spatialflink_spark.streaming.metrics import HistogramListener
    from spatialflink_spark.streaming.pipeline import (
        run_available_now,
        stream_range_count,
    )
    from spatialflink_spark.streaming.sink import ExactlyOnceSink

    listener = HistogramListener(f"{out_dir}/metrics.jsonl")
    spark.streams.addListener(listener)
    stage_replay_files(spark, sf_dir, f"{out_dir}/replay", n_batches=3)
    sink = ExactlyOnceSink(f"{out_dir}/out", key_cols=("ws", "q_id"))
    stream = read_sequences_stream(spark, f"{out_dir}/replay", C.allowed_lateness_s)
    res = stream_range_count(stream, C, DEFAULT_QUERY_POINTS)
    run_available_now(res, sink.foreach_batch(), f"{out_dir}/ckpt")
    rows = sink.read_committed(spark).count()
    print(
        json.dumps(
            {
                "job": "stream_range_count",
                "sf_dir": sf_dir,
                "rows_out": rows,
                "batches": sorted(sink.committed_batches()),
                "latency": listener.hist.summary(),
                "out_dir": out_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
