"""Streaming metrics — the MetricsSink / instrumented-pipeline surface.

Reference records per-interval count/bytes/eps/MBps/avg-latency CSVs
(sncb/metrics/MetricsSink.java:14-104) and per-stage in/out counters +
fixed-bucket latency histograms (com/mn/operators/CountingMap.java:14-38,
com/mn/metrics/FixedBucketLatency.java:15-77, MetricNames.java:7-36).

Spark-native equivalents:
- `df.observe(name, exprs...)` — JVM-side accumulators evaluated inline with
  the plan (zero extra pass), surfaced per micro-batch.
- `StreamingQueryListener` — per-batch progress (input rows, process rate,
  state store metrics) appended to a JSONL metrics log; combined with the
  sink ledger (streaming/sink.py) this is the checkpointed lineage store.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observe_stream(df: DataFrame, name: str = "engine_metrics") -> DataFrame:
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows_in"),
        F.approx_count_distinct("doc_id").alias("approx_keys"),
        F.min("ts_s").alias("min_ts"),
        F.max("ts_s").alias("max_ts"),
    )


class JsonlMetricsListener(StreamingQueryListener):
    """Appends one JSON line per micro-batch progress event: id, batchId,
    numInputRows, processedRowsPerSecond, observed metrics, state operators.
    The FixedBucketLatency analog is the batch durationMs breakdown Spark
    already reports."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        rec = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs) if p.durationMs else {},
            "observed": {k: dict(v) for k, v in (p.observedMetrics or {}).items()},
            "state": [
                {
                    "rows_total": s.numRowsTotal,
                    "rows_updated": s.numRowsUpdated,
                    "mem_bytes": s.memoryUsedBytes,
                }
                for s in (p.stateOperators or [])
            ],
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def attach_metrics(spark: SparkSession, path: str) -> JsonlMetricsListener:
    lst = JsonlMetricsListener(path)
    spark.streams.addListener(lst)
    return lst
