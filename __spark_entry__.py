"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on sf0.001 (MN_Q1 analog).
queries()      -> every implemented gate query (SURVEY.md §2 coverage).
oracle_sql()   -> matching DuckDB SQL golden per query.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from spatialflink_spark import gate  # noqa: E402
from spatialflink_spark.oracle import sql as osql  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return gate.q_range_tumbling_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "range_tumbling_count": gate.q_range_tumbling_count,
        "range_rows": gate.q_range_rows,
        "knn_sliding": gate.q_knn_sliding,
        "join_self_tumbling": gate.q_join_self_tumbling,
        "variation_sliding": gate.q_variation_sliding,
        "variance_sliding": gate.q_variance_sliding,
        "trajectory_tumbling": gate.q_trajectory_tumbling,
        "heatmap_sliding": gate.q_heatmap_sliding,
        "tstats_running": gate.q_tstats_running,
        "events_sessionize": gate.q_events_sessionize,
        "events_sliding_stats": gate.q_events_sliding_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "range_tumbling_count": osql.range_tumbling_count(),
        "range_rows": osql.range_rows(),
        "knn_sliding": osql.knn_sliding(),
        "join_self_tumbling": osql.join_self_tumbling(),
        "variation_sliding": osql.variation_sliding(),
        "variance_sliding": osql.variance_sliding(),
        "trajectory_tumbling": osql.trajectory_tumbling(),
        "heatmap_sliding": osql.heatmap_sliding(),
        "tstats_running": osql.tstats_running(),
        "events_sessionize": osql.events_sessionize(),
        "events_sliding_stats": osql.events_sliding_stats(),
    }
