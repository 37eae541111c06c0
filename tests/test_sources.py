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


def test_kafka_source_gated_clearly(spark):
    """The Kafka wiring is complete but the connector jar isn't in this
    container — the reader must fail with actionable guidance, not an opaque
    AnalysisException."""
    import pytest as _pytest

    from spatialflink_spark.sources.streams import read_kafka_raw_stream

    with _pytest.raises(RuntimeError, match="Kafka source unavailable"):
        read_kafka_raw_stream(spark, "localhost:9092", "docs")


def test_json_serialize_roundtrip(spark):
    """serialize_json (Serialization.*OutputSchema analog) inverts through
    parse_typed_json_lines losslessly, arrays included."""
    from spatialflink_spark.sources.formats import (
        parse_typed_json_lines,
        serialize_json,
    )
    from spatialflink_spark.sources.sequences import sequences
    from spatialflink_spark.sources.streams import SEQ_STREAM_SCHEMA
    from tests.conftest import SF_SMALL

    seq = sequences(spark, SF_SMALL)
    back = parse_typed_json_lines(serialize_json(seq), SEQ_STREAM_SCHEMA)
    a = seq.toPandas().sort_values(["doc_id", "seq_no"]).reset_index(drop=True)
    b = back.toPandas().sort_values(["doc_id", "seq_no"]).reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        assert all(
            (list(x) == list(y)) if isinstance(x, (list, tuple)) or hasattr(x, "__len__") and not isinstance(x, str) else x == y
            for x, y in zip(av, bv)
        ), c


def test_kafka_parse_chain_matches_sequences_oracle(spark):
    """Kafka parse-path contract (no broker needed): recorded Kafka-shaped
    frames (key/value BINARY + topic/partition/offset metadata, exactly the
    relation format("kafka") produces) pushed through the SAME value-bytes ->
    cast -> parse_json_lines -> derive_sequences chain that
    read_kafka_raw_stream wires (sources/streams.py) must reproduce the
    canonical sequences table bit-for-bit for the same documents."""
    from pyspark.sql import functions as F

    from spatialflink_spark.sources.sequences import derive_sequences, sequences
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    # record the frames: one Kafka message per doc, value = the JSON the
    # reference's producer would emit (JSONKeyValueDeserializationSchema)
    frames = docs.select(
        F.expr("cast(cast(doc_id as string) as binary)").alias("key"),
        F.expr(
            "cast(to_json(named_struct("
            "'ts_s', cast(1700000000 + doc_id % 1000 as bigint), "
            "'doc_id', doc_id, 'source', source, 'text', text)) as binary)"
        ).alias("value"),
        F.lit("seq-topic").alias("topic"),
        F.expr("cast(doc_id % 4 as int)").alias("partition"),
        F.col("doc_id").alias("offset"),
    )
    # the exact parse chain of read_kafka_raw_stream, applied in batch
    from spatialflink_spark.sources.formats import parse_json_lines

    lines = frames.selectExpr("cast(value as string) as value")
    parsed = parse_json_lines(lines)
    got = (
        derive_sequences(parsed)
        .toPandas()
        .sort_values(["doc_id", "seq_no"])
        .reset_index(drop=True)
    )
    exp = (
        sequences(spark, SF_SMALL)
        .toPandas()
        .sort_values(["doc_id", "seq_no"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    for c in ["doc_id", "seq_no", "n_tok", "source", "ts_s"]:
        assert (got[c].values == exp[c].values).all(), c
    assert all(list(a) == list(b) for a, b in zip(got["tokens"], exp["tokens"]))


def test_binfmt_roundtrip_and_corruption(spark, tmp_path):
    """.tsf binary shard format (ShapeFileInputFormat analog): lossless
    round trip including token arrays; bad-magic files and truncated tails
    are dropped under on_error='skip' and fail fast under 'raise'."""
    import pytest

    from spatialflink_spark.sources.binfmt import (
        FILE_HEADER,
        MAGIC,
        VERSION,
        REC_HEADER,
        read_token_shards,
        write_token_shards,
    )

    d = str(tmp_path / "shards")
    rows = [
        (1, 0, [5, 6, 7], 3, "web", 100),
        (2, 1, [9], 1, "book", 200),
        (3, 0, [], 0, "x", 300),  # empty token array round-trips
    ]
    schema = (
        "doc_id bigint, seq_no int, tokens array<int>, n_tok int, "
        "source string, ts_s bigint"
    )
    df = spark.createDataFrame(rows, schema)
    manifest = write_token_shards(df, d).collect()
    assert sum(m.n_records for m in manifest) == 3

    got = sorted(read_token_shards(spark, d).collect(), key=lambda r: r.doc_id)
    assert [(r.doc_id, r.seq_no, r.tokens, r.n_tok, r.source, r.ts_s) for r in got] == rows

    # a shard whose first record is valid but whose SECOND is cut mid-payload:
    # the valid prefix must survive, the tail must drop
    src = b"ok"
    toks = (4).to_bytes(4, "little")
    rec1 = REC_HEADER.pack(7, 0, 400, len(src), 1) + src + toks
    rec2 = REC_HEADER.pack(8, 0, 500, len(src), 1) + src  # tokens missing
    trunc = str(tmp_path / "trunc")
    import os

    os.makedirs(trunc)
    with open(f"{trunc}/part-a.tsf", "wb") as f:
        f.write(FILE_HEADER.pack(MAGIC, VERSION, 2) + rec1 + rec2)
    with open(f"{trunc}/part-b.tsf", "wb") as f:
        f.write(b"JUNK" + b"\x00" * 32)  # bad magic -> whole file rejected
    # bounds-clean record whose source bytes are invalid UTF-8: dropped like
    # a corrupt tail, must not throw under on_error='skip'
    bad_src = REC_HEADER.pack(9, 0, 600, 2, 1) + b"\xff\xfe" + toks
    with open(f"{trunc}/part-c.tsf", "wb") as f:
        f.write(FILE_HEADER.pack(MAGIC, VERSION, 1) + bad_src)
    kept = read_token_shards(spark, trunc).collect()
    assert [(r.doc_id, r.tokens) for r in kept] == [(7, [4])]
    with pytest.raises(Exception, match="truncated .tsf shard|bad .tsf header"):
        read_token_shards(spark, trunc, on_error="raise").collect()
