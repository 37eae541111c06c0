"""The canonical token-sequence input table.

Authoritative shape per BASELINE.json input_hint:
``(doc_id string->bigint, tokens array<int32>, n_tok int32, source string)``
plus the event-time axis ``ts_s`` (epoch seconds, BIGINT) and a per-doc
monotone ``seq_no`` tie-breaker — the token analog of the reference's spatial
point stream (spatialObjects/Point.java:40-47 objID/timeStampMillisec,
sncb/common/GpsEvent.java:3-11).

Derivation is 100% deterministic from the driver-provided ``documents``
parquet (doc_id, text, lang, source, n_chars), seeded by doc_id only:

- tokens  = portable tokenizer over text, rotated by seq_no
- n_tok   = size(tokens)
- seq_no  = 0..(doc_id % 3)   (1-3 events per doc, like the reference's
            per-device multi-event streams, SyntheticGpsSource.java:29-51)
- ts_s    = EPOCH0 + (doc_id*7) % 600 + seq_no*11  (spread over a 600 s
            event-time axis spanning many windows)

The SAME arithmetic is emitted as a DuckDB CTE (``duck_sequences_cte``) so the
driver's oracle sees bit-identical input. In production this table is an
Iceberg table streamed with ``spark.readStream.table(...)``; here batch =
parquet scan + derivation, streaming = file-source replay of the derived
table (sources/streams.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spatialflink_spark.config import EPOCH0, TS_SPREAD_S, VOCAB_SIZE
from spatialflink_spark.functions import tokens as T


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def derive_sequences(docs: DataFrame) -> DataFrame:
    """Sequence derivation over any raw-doc relation (doc_id, text, source) —
    batch parquet scan or a streaming source (Kafka/socket/file): the
    expressions are plain Catalyst columns, valid on both."""
    d = docs.select("doc_id", "text", "source")
    base = d.select(
        "doc_id",
        "source",
        F.expr(T.spark_tokenize("text")).alias("toks"),
    )
    seq = base.select(
        "doc_id",
        "source",
        "toks",
        F.explode(F.expr("sequence(0, 2)")).alias("seq_no"),
    ).where(F.expr("seq_no <= doc_id % 3"))
    return seq.select(
        "doc_id",
        F.col("seq_no").cast("int").alias("seq_no"),
        F.expr(f"transform(toks, t -> cast((t + seq_no) % {VOCAB_SIZE} as int))").alias(
            "tokens"
        ),
        F.expr("cast(size(toks) as int)").alias("n_tok"),
        "source",
        F.expr(
            f"cast({EPOCH0} + (doc_id*7) % {TS_SPREAD_S} + seq_no*11 as bigint)"
        ).alias("ts_s"),
    )


def sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch derivation of the canonical sequences table.

    Entirely built-in column expressions — the whole derivation compiles into
    one WholeStageCodegen stage over the parquet scan (only doc_id, text,
    source are read: column pruning reaches the scan).
    """
    from spatialflink_spark.session import spread

    # a small fixture file scans as ONE partition — spread it so the
    # tokenizing derivation (and everything persisted downstream) runs at
    # full parallelism; no-op when the scan is already multi-partition
    return derive_sequences(spread(load_documents(spark, sf_dir)))


def duck_sequences_cte(table: str = "documents") -> str:
    """DuckDB CTE body producing the identical sequences relation.

    Usage: f"WITH {duck_sequences_cte()} SELECT ... FROM sequences ..."
    """
    tok = T.duck_tokenize("d.text")
    return f"""
_seq_base AS (
  SELECT d.doc_id, d.source, {tok} AS toks
  FROM {table} d
),
sequences AS (
  SELECT b.doc_id,
         CAST(s.seq_no AS INT) AS seq_no,
         list_transform(b.toks, t -> CAST((t + s.seq_no) % {VOCAB_SIZE} AS INT)) AS tokens,
         CAST(len(b.toks) AS INT) AS n_tok,
         b.source,
         CAST({EPOCH0} + (b.doc_id*7) % {TS_SPREAD_S} + s.seq_no*11 AS BIGINT) AS ts_s
  FROM _seq_base b
  CROSS JOIN (SELECT unnest(range(0, 3)) AS seq_no) s
  WHERE s.seq_no <= b.doc_id % 3
)"""


_SEQ_CACHE: dict[tuple[str, str], DataFrame] = {}


def sequences_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted derivation, one per (session, sf_dir).

    In production the sequence table IS the stored input (Iceberg); the
    tokenizing derivation exists here only because the test fixture ships
    raw documents. Persisting it makes every downstream query read the
    materialized table instead of re-tokenizing — and makes self-joins scan
    it once per side instead of re-deriving per branch."""
    # applicationId is unique per context — id(sparkContext) can be recycled
    # by CPython after a stopped context is GC'd, handing back a DataFrame
    # bound to a dead session (ADVICE round 1)
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _SEQ_CACHE.get(key)
    if df is None:
        df = sequences(spark, sf_dir).persist()
        _SEQ_CACHE[key] = df
    elif not (df.storageLevel.useMemory or df.storageLevel.useDisk):
        # evicted by an external clearCache (e.g. bench's between-query
        # cleanup) — re-mark; the next action rematerializes it once
        df = df.persist()
    return df


def write_bucketed_sequences(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    path: str,
    buckets: int = 16,
) -> None:
    """Persist the derived sequence table BUCKETED by doc_id — the
    co-located-join layout for the 10^12-sequence store: every downstream
    join / groupBy keyed on doc_id reads pre-shuffled, per-bucket files and
    plans WITHOUT a shuffle Exchange on either side (asserted in
    tests/test_plans.py). This is the batch-table counterpart of the
    engine's explicit (source, doc_id) hash partitioning: the shuffle is
    paid ONCE at write time instead of once per query. `bucketBy` requires
    the table-catalog write path (saveAsTable); the explicit `path` makes
    it an external table so the data lives outside the default warehouse
    and survives the (in-memory) catalog."""
    (
        sequences(spark, sf_dir)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "doc_id")
        .sortBy("doc_id", "seq_no")
        .option("path", path)
        .saveAsTable(table)
    )
