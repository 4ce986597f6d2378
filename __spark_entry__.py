"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship faconne-DSL query on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles (see faconne_spark/queries/*).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    # events.parquet carries TIMESTAMP(NANOS). Spark <= 4.0 needs this
    # conf (reads as bigint nanos); Spark 4.1+ ignores it and reads
    # timestamp_ntz. Either way faconne_spark.streaming.ensure_event_time
    # normalizes ts to a plain µs TIMESTAMP at load.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the faconne campus-report pattern (nested grouping +
    expand-aggregates + deep merge) over customer⋈nation at sf0.001."""
    _configure(spark)
    from faconne_spark.queries.faconne_demo import fac_campus_report

    return fac_campus_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from faconne_spark.queries import all_queries

    base = all_queries()

    def wrap(fn):
        def run(spark, sf_dir):
            _configure(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    from faconne_spark.queries import all_oracles

    return all_oracles()
