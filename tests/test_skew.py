"""Skew handling — the salted repartition must bound the largest partition.

The fixture's `source` column is skewed; hash-partitioning on (source) alone
puts the hot source's rows in one partition. salted_repartition(source) must
spread them across ~salt_buckets partitions (north_rule: explicit salted
hash-partitioner over (source, doc_id) with skew-aware repartitioning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spatialflink_spark.config import DEFAULT_CONFIG as C
from spatialflink_spark.operators.cells import salted_repartition
from spatialflink_spark.sources.sequences import sequences
from tests.conftest import SF_SMALL


def _max_partition_rows(df) -> int:
    counts = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    return max(r["count"] for r in counts)


def test_salted_repartition_bounds_hot_keys(spark):
    seq = sequences(spark, SF_SMALL)
    n_parts = 16
    # artificially concentrate: partition on a single constant-ish key (the
    # degenerate hot-key case — everything lands in one partition)
    hot = seq.withColumn("k", F.lit("hot")).repartition(n_parts, "k")
    salted = salted_repartition(
        seq.withColumn("k", F.lit("hot")), n_parts, C.salt_buckets, "k"
    )
    max_hot = _max_partition_rows(hot)
    max_salted = _max_partition_rows(salted)
    total = seq.count()
    assert max_hot == total  # unsalted: one reducer takes everything
    # salted: largest partition bounded well below the full stream
    assert max_salted <= total / 2
    # and no rows lost
    assert salted.count() == total
