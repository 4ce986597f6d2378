"""Dump full ``explain("formatted")`` output for registry queries.

Usage:
    python tools/dump_plans.py --out plans/r12 --suffix _before q1 q2 ...
    python tools/dump_plans.py --out plans/r12 --suffix _after  --from-file list.txt

Unlike docs/plans (normalized outlines for drift guarding), these are
the COMPLETE formatted plans the optimization-round judge reads.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--from-file")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = list(args.queries)
    if args.from_file:
        with open(args.from_file) as fh:
            names += [l.strip() for l in fh if l.strip()
                      and not l.startswith("#")]

    from faconne_spark.session import get_session
    from faconne_spark.queries import all_queries
    from faconne_spark.operators.dedup import release_caches

    spark = get_session("faconne_dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        df = qs[name](spark, args.sf)
        qe = df._jdf.queryExecution()
        jvm = spark._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        txt = qe.explainString(mode)
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        release_caches()
        print(path, flush=True)


if __name__ == "__main__":
    main()
