"""Cross-engine verification of the round-11 STAGING bank (built in
round 10, deliberately unregistered): each query/oracle pair runs
driver-style (pandas sort + canon compare) against DuckDB at the test
SF — so round-11 registration inherits already-proven pairs (the
bank_r6…bank_r10 precedent).  The builder additionally smoked every
pair at all three SFs via tools/smoke_pairs.py before staging."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faconne_spark.queries.bank_r11 import BANK_ORACLES, BANK_QUERIES

TABLES = [
    "events", "orders", "customer", "lineitem", "part", "documents",
    "embeddings", "supplier", "nation",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    cols = []
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            col = col.round(9)
        elif col.dtype.kind in "iu":
            col = col.astype("int64")
        elif col.dtype == object:
            col = col.astype(str)
        cols.append(col.astype(str))
    return pd.concat(cols, axis=1).to_csv(index=False)


@pytest.mark.parametrize("name", sorted(BANK_QUERIES))
def test_bank_r11_pair_matches_oracle(spark, sf_dir, duck, name):
    got = BANK_QUERIES[name](spark, sf_dir).toPandas()
    want = duck.sql(BANK_ORACLES[name]).df()
    got.columns = [c.lower() for c in got.columns]
    want.columns = [c.lower() for c in want.columns]
    assert len(got) == len(want), name
    assert sorted(got.columns) == sorted(want.columns), name
    assert _canon(got) == _canon(want), name


def test_bank_r11_partitioning_invariant(spark, sf_dir):
    """The banked pairs carry the registry's determinism claim:
    identical results under different shuffle-partition counts (the
    contingency pair products, R/S segment windows, periodogram trig
    sums, and rank-identity effect sizes are the partition-sensitive
    shapes)."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for k in sorted(BANK_QUERIES):
                rows = sorted(
                    tuple(map(str, r))
                    for r in BANK_QUERIES[k](spark, sf_dir).collect()
                )
                results.setdefault(k, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for k, (r5, r32) in results.items():
        assert r5 == r32, f"{k}: partition-count-dependent output"
