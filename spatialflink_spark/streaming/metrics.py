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


FIXED_BUCKETS_MS = [0, 1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048,
                    4096, 8192, 16384, 20000, 60000]


class FixedBucketLatency:
    """Fixed-bucket latency histogram with p50/p95/p99 gauges — the
    com/mn/metrics/FixedBucketLatency.java:15-77 surface (buckets
    {0,1,2,4,...,20000,60000} ms). Fed per micro-batch with the batch's
    durationMs (the micro-batch analog of per-record sink latency)."""

    def __init__(self, buckets=None):
        self.buckets = list(buckets or FIXED_BUCKETS_MS)
        self.counts = [0] * (len(self.buckets) + 1)
        self.n = 0

    def record(self, latency_ms: float) -> None:
        import bisect

        i = bisect.bisect_right(self.buckets, latency_ms)
        self.counts[i] += 1
        self.n += 1

    def percentile(self, p: float) -> float:
        """Upper bucket bound holding the p-th percentile (reference
        semantics: gauge reports the bucket boundary, :38-42)."""
        if self.n == 0:
            return 0.0
        target = p * self.n
        seen = 0
        for i, c in enumerate(self.counts):
            seen += c
            if seen >= target:
                return float(
                    self.buckets[i] if i < len(self.buckets) else float("inf")
                )
        return float(self.buckets[-1])

    def summary(self) -> dict:
        return {
            "n": self.n,
            "p50_ms": self.percentile(0.50),
            "p95_ms": self.percentile(0.95),
            "p99_ms": self.percentile(0.99),
        }


class HistogramListener(JsonlMetricsListener):
    """Metrics listener that additionally maintains the fixed-bucket
    histogram over batch durations and appends its summary per line."""

    def __init__(self, path: str):
        super().__init__(path)
        self.hist = FixedBucketLatency()

    def onQueryProgress(self, event):
        p = event.progress
        d = dict(p.durationMs or {})
        if "triggerExecution" in d:
            self.hist.record(float(d["triggerExecution"]))
        super().onQueryProgress(event)
        with open(self.path, "a") as f:
            f.write(json.dumps({"histogram": self.hist.summary()}) + "\n")
