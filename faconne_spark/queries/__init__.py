"""Query registry: every operator from SURVEY.md §2 as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle producing identical results on identical parquet."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (events gets its ns→µs ts fix)."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
    return df


def all_queries() -> dict:
    from faconne_spark.queries import faconne_demo, pipeline, tpch, tpch_ext

    out = {}
    for mod in (faconne_demo, tpch, tpch_ext, pipeline):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict:
    from faconne_spark.queries import faconne_demo, pipeline, tpch, tpch_ext

    out = {}
    for mod in (faconne_demo, tpch, tpch_ext, pipeline):
        out.update(mod.ORACLES)
    return out
