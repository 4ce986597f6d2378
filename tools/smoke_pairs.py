"""Driver-style cross-engine smoke for registry (or bank) pairs at all
three test SFs: pandas sort + canon compare, the same shape as the
driver's correctness gate and tests/test_bank_*.py.

Usage: python tools/smoke_pairs.py key [key ...]
       FACONNE_BANK=bank_r11 python tools/smoke_pairs.py key ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "events", "orders", "customer", "lineitem", "part", "documents",
    "embeddings", "supplier", "nation", "region",
]


def canon(df):
    import pandas as pd

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


def main() -> None:
    import duckdb

    from faconne_spark.session import get_session

    bank = os.environ.get("FACONNE_BANK")
    if bank:
        import importlib

        mod = importlib.import_module(f"faconne_spark.queries.{bank}")
        Q, O = mod.BANK_QUERIES, mod.BANK_ORACLES
    else:
        from faconne_spark.queries import all_oracles, all_queries

        Q, O = all_queries(), all_oracles()
    keys = sys.argv[1:]
    spark = get_session(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for sf in ("0.001", "0.01", "0.1"):
        sd = f"/root/testdata/sf{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{sd}/{t}.parquet')"
            )
        for k in keys:
            try:
                got = Q[k](spark, sd).toPandas()
                want = con.sql(O[k]).df()
                got.columns = [c.lower() for c in got.columns]
                want.columns = [c.lower() for c in want.columns]
                ok = (
                    len(got) == len(want)
                    and sorted(got.columns) == sorted(want.columns)
                    and canon(got) == canon(want)
                )
            except Exception as e:  # noqa: BLE001 - smoke tool reports
                print(f"sf{sf} {k} ERROR {type(e).__name__}: {e}")
                bad += 1
                continue
            print(f"sf{sf} {k} {'MATCH' if ok else 'MISMATCH'} rows={len(got)}")
            if not ok:
                bad += 1
                print(got.head(8))
                print(want.head(8))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
