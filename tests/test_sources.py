"""Source-format tests: socket line stream (MN runner source,
MobilityRunner.java:28, InstrumentedMN_Q1.java:118-120), CSV/JSON line
deserialization, and the latency histogram."""

from __future__ import annotations

import socket
import threading
import time

from spatialflink_spark.sources.formats import parse_csv_lines, parse_json_lines
from spatialflink_spark.streaming.metrics import FixedBucketLatency


def test_fixed_bucket_latency():
    h = FixedBucketLatency()
    for ms in [0.5, 3, 3, 100, 5000]:
        h.record(ms)
    s = h.summary()
    assert s["n"] == 5
    assert s["p50_ms"] == 4.0  # bucket bound holding the 3ms values
    assert s["p99_ms"] == 8192.0


def test_csv_json_line_parsing(spark):
    lines = spark.createDataFrame(
        [
            ("1767225600,5,src1,hello world",),
            ("garbage",),
            ("not,a,number,x",),
            ('{"ts_s": 1, "doc_id": 2, "source": "s", "text": "t"}',),
        ],
        ["value"],
    )
    csv = parse_csv_lines(lines).collect()
    assert len(csv) == 1 and csv[0].doc_id == 5 and csv[0].text == "hello world"
    js = parse_json_lines(lines).collect()
    assert len(js) == 1 and js[0].doc_id == 2


def test_socket_source_stream(spark, tmp_path):
    """Real format('socket') round trip: a thread serves CSV lines over TCP;
    the stream parses them to the canonical schema and counts per source."""
    lines = [f"{1767225600 + i},{i},src{i % 2},hello world doc {i}" for i in range(20)]

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            time.sleep(3)  # keep the connection up while Spark reads

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    raw = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    parsed = parse_csv_lines(raw)
    out = []

    def fb(df, bid):
        out.extend(df.collect())

    q = (
        parsed.writeStream.foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    deadline = time.time() + 45
    while time.time() < deadline and len(out) < 20:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    srv.close()
    assert len(out) == 20
    assert {r.source for r in out} == {"src0", "src1"}
    assert sorted(r.doc_id for r in out) == list(range(20))
