"""Regenerate docs/QUERIES.md — the gate-order registry index.

Each row: position, key, oracle kind, and a one-line summary resolved
from the query wrapper's docstring (falling back to the first operator
it calls, for thin wrappers).

    PYTHONPATH=. python tools/gen_queries_index.py
"""

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faconne_spark.queries import all_oracles, all_queries  # noqa: E402


def _mods():
    import faconne_spark.operators.dedup as D
    import faconne_spark.operators.multimodal as MM
    import faconne_spark.operators.relational as R
    import faconne_spark.operators.similarity as S
    import faconne_spark.operators.text as TX

    return {"D": D, "TX": TX, "S": S, "MM": MM, "R": R}


def summary_of(fn, mods) -> str:
    doc = (fn.__doc__ or "").strip().splitlines()
    if doc and doc[0].strip():
        return doc[0].strip()
    try:
        src = inspect.getsource(fn)
    except OSError:
        return ""
    for alias, name in re.findall(r"\b(D|TX|S|MM|R)\.(\w+)\(", src):
        target = getattr(mods[alias], name, None)
        tdoc = (getattr(target, "__doc__", "") or "").strip().splitlines()
        if tdoc and tdoc[0].strip():
            return tdoc[0].strip()
    return ""


def main() -> None:
    qs, oracles = all_queries(), all_oracles()
    mods = _mods()
    lines = [
        "# QUERIES — the correctness-gate registry",
        "",
        f"{len(qs)} queries, every one paired with a DuckDB oracle "
        "(`__spark_entry__.oracle_sql()`) recomputing the same algorithm "
        "on the same parquet. Listed in gate order (new/changed-this-round "
        "keys first). Full design notes per key: SURVEY.md §2.",
        "",
        "| # | key | oracle | summary |",
        "|---|---|---|---|",
    ]
    for i, (k, fn) in enumerate(qs.items(), 1):
        kind = "SQL" if k in oracles else "rows-only"
        lines.append(f"| {i} | {k} | {kind} | {summary_of(fn, mods)} |")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "QUERIES.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(qs)} rows to {out}")


if __name__ == "__main__":
    main()
