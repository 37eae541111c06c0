"""Replicates the driver's CORRECTNESS gate locally: every queries() entry vs
its oracle_sql() golden, exact value equality at sf0.001 (and the flagship +
the trickiest ops additionally at sf0.01 via the duck_mid fixture)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from spatialflink_spark.oracle.compare import assert_frames_match
from tests.conftest import SF_MID, SF_SMALL

QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_parity_small(spark, duck, name):
    q = entrymod.queries()[name]
    o = entrymod.oracle_sql()[name]
    spdf = q(spark, SF_SMALL).toPandas()
    ddf = duck.execute(o).fetchdf()
    assert_frames_match(spdf, ddf, name)
    assert len(spdf) > 0, f"{name}: empty result is a vacuous pass"


@pytest.mark.parametrize(
    "name", ["range_tumbling_count", "knn_sliding", "join_self_tumbling"]
)
def test_parity_mid(spark, duck_mid, name):
    q = entrymod.queries()[name]
    o = entrymod.oracle_sql()[name]
    spdf = q(spark, SF_MID).toPandas()
    ddf = duck_mid.execute(o).fetchdf()
    assert_frames_match(spdf, ddf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns == ["ws", "q_id", "n_matches"]
