"""Deserialization formats — the reference's source-format surface.

Reference: spatialStreams/Deserialization.java (1593 LoC of per-format
GeoJSON/WKT/CSV/TSV parsing into Point/Polygon POJOs) and the Kafka JSON
consumer (StreamingJob.java:255). Spark-native: `from_json` with an explicit
schema, `split`/`get_json_object` for lines, `to_timestamp` for dates — all
Catalyst expressions, applied identically on batch or streaming DataFrames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# canonical CSV layout of a raw sequence event, mirroring the reference's
# 14-column GPS CSV (sncb/common/CSVToGpsEventMapFunction.java:13-24):
# ts_s(0), doc_id(1), source(2), text(3...). Format contract: the limit-4
# split puts text LAST so embedded commas in text survive, which requires
# `source` to be comma-free and `text` non-null (concat_ws drops nulls,
# shifting the line to 3 fields) — serializers must enforce this loudly
# (see gate.q_csv_ingest's raise_error guard).
SEQ_CSV_COLUMNS = ("ts_s", "doc_id", "source", "text")


def parse_csv_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """CSV line stream -> canonical raw-doc schema (CSVToGpsEventMapFunction
    analog: positional split + casts; malformed rows -> nulls dropped)."""
    # try_cast, not cast: Spark 4 ANSI mode makes cast THROW on malformed
    # input; deserialization must drop bad rows like the reference's parsers
    parts = F.split(F.col(col), ",", 4)
    out = lines.select(
        F.expr(f"try_cast(split({col}, ',', 4)[0] as bigint)").alias("ts_s"),
        F.expr(f"try_cast(split({col}, ',', 4)[1] as bigint)").alias("doc_id"),
        parts.getItem(2).alias("source"),
        parts.getItem(3).alias("text"),
    )
    return out.where(
        F.col("ts_s").isNotNull() & F.col("doc_id").isNotNull()
    )


def parse_json_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """JSON line stream -> canonical raw-doc schema (Kafka
    JSONKeyValueDeserializationSchema analog, StreamingJob.java:255-258)."""
    schema = "ts_s bigint, doc_id bigint, source string, text string"
    parsed = lines.select(F.from_json(F.col(col), schema).alias("r"))
    return parsed.select("r.ts_s", "r.doc_id", "r.source", "r.text").where(
        F.col("ts_s").isNotNull() & F.col("doc_id").isNotNull()
    )


def json_field(col: str, path: str) -> Column:
    """get_json_object shortcut for semi-structured columns (events.props)."""
    return F.get_json_object(F.col(col), f"$.{path}")


def serialize_json(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Output serialization surface — the analog of the reference's 12
    Serialization.*OutputSchema classes (spatialStreams/Serialization.java:
    17-774, each hand-writing one POJO -> JSON mapping): to_json(struct(...))
    generates the serializer for ANY result schema, batch or streaming.
    Returns a single-column `value: string` relation, ready for a Kafka/text
    sink."""
    cols = cols if cols is not None else df.columns
    return df.select(F.to_json(F.struct(*cols)).alias("value"))


def parse_typed_json_lines(lines: DataFrame, schema: str, col: str = "value") -> DataFrame:
    """Generic inverse of serialize_json: JSON lines -> typed columns via an
    explicit DDL schema (malformed rows become all-null structs, dropped by
    the caller's notNull filters as in parse_json_lines)."""
    parsed = lines.select(F.from_json(F.col(col), schema).alias("r"))
    return parsed.select("r.*")
