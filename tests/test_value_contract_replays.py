"""Per-site value-contract replays (judge r10 ask #6, extending
SURVEY §7h.13(c)).

The r10 integer-division audit found a handful of half-up
``(2a+b) div (2b)`` sites whose dividend is a SUM OF EVENT VALUES and
flagged them as resting on the generator's value >= 0 contract.  These
replays push a synthetic NEGATIVE-value corpus (numerators engineered
onto negative non-integer quotients, e.g. (2s+n)/(2n) = -1.25) through
BOTH the Spark query and its DuckDB oracle at each site and pin the
outcome.

Empirical r11 finding (probed directly, DuckDB 1.0.0): on INTEGER
operands DuckDB ``//`` truncates toward zero exactly like Spark
``div`` (-10 // 8 = -1 in both), so all three sites MATCH cross-engine
for any sign — the audit's floor-vs-truncate premise applies to
DECIMAL operands only, where DuckDB ``//`` is true division (-1.25)
and only a ::BIGINT cast restores truncation parity (that was the real
shape of the r10 embed_anisotropy_panel staging bite).  What a
negative corpus DOES change is the rounding SEMANTICS: truncation of
(2a+b)/(2b) is half-up only for a >= 0, so the values these keys emit
on negatives are trunc-rounded, not half-up — the corpus-level
contract test (test_hardening.py::test_events_value_nonnegative_
contract) still pins the semantic assumption.  A site regressing to a
genuinely engine-splitting shape (DECIMAL // without the cast, a new
floor()/ceil() asymmetry) flips its expectation here and fails at the
site, not just at the contract.

Audit list (r10, re-derived mechanically for r11 by grepping every
``div (2`` site whose numerator carries a value sum):

- events_value_expected_shortfall  (round10.py — tail mean of values)
- events_dow_type_decomp           (round8.py — mean_micro of values)
- events_value_spearman_daily      (staged_r9.py — daily value means)

Every other half-up site divides counts, squares, χ²/Cauchy–Schwarz
numerators, or |·| sums — structurally non-negative (r10 audit; the
grep in this file's round-11 review found no new value site).
"""

import os

import pytest

# key -> expected behavior on a negative-value corpus:
#   "match" = cross-engine sign-safe (both engines truncate integer
#             division toward zero — proven here);
#   "split" = the site would diverge between engines on negatives.
SITES = {
    "events_value_expected_shortfall": "match",
    "events_dow_type_decomp": "match",
    "events_value_spearman_daily": "match",
}


@pytest.fixture(scope="module")
def neg_dir(spark, tmp_path_factory):
    """A tiny events corpus whose values are engineered to push the
    audited numerators onto negative non-integer quotients: within a
    (type, day) group the value micro-sums land on -1.5-micro means
    (2s + n = -6 with 2n = 4 -> Spark -1, DuckDB -2)."""
    d = str(tmp_path_factory.mktemp("neg_events"))
    rows = []
    eid = 0
    for day in range(1, 8):
        for t_i, et in enumerate(["view", "click", "purchase"]):
            # two events per (day, type): micro values -1 and -2
            # (sum s = -3, n = 2): (2s+n) = -4 -> exact -1, EQUAL; and
            # a second pair at -2,-2 (s = -4): (2s+n) = -6 -> -1.5,
            # the splitting quotient
            for vm in (-1e-06, -2e-06, -2e-06, -2e-06):
                rows.append(
                    (
                        eid,
                        f"2023-03-{day:02d} 0{t_i}:1{eid % 6}:00",
                        eid % 5,
                        et,
                        vm,
                        "{}",
                    )
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "cast(ts_s as timestamp) AS ts", "user_id",
        "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def _canon(df):
    import pandas as pd  # noqa: F401

    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return df.astype(str).to_csv(index=False)


@pytest.mark.parametrize("key", sorted(SITES))
def test_value_contract_site_replay(key, spark, neg_dir):
    import duckdb

    from faconne_spark.queries import all_oracles, all_queries

    spark_pdf = all_queries()[key](spark, neg_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(neg_dir, 'events.parquet')}/*.parquet')"
    )
    duck_pdf = con.execute(all_oracles()[key]).df()
    assert len(spark_pdf) and len(duck_pdf), "vacuous replay"
    agree = _canon(spark_pdf) == _canon(duck_pdf)
    if SITES[key] == "match":
        assert agree, (
            f"{key} split cross-engine on the negative corpus — the"
            " site regressed to an engine-splitting idiom (DECIMAL //"
            " without a ::BIGINT cast, or a floor/ceil asymmetry);"
            " re-audit against the sign-safe round-on-double form"
        )
    else:
        assert not agree, (
            f"{key} now MATCHES on a negative-value corpus — move it"
            " to SITES['...'] = 'match'"
        )


def test_audit_list_is_current():
    """Mechanical freshness check: every engine `div (2` site whose
    nearby context carries an event-value sum must be enumerated in
    SITES (via its enclosing module), so a NEW value-dividing site
    cannot ship unexamined."""
    import re

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "faconne_spark",
    )
    # modules containing the three audited sites (value-sum numerators)
    expected_modules = {
        "round10.py", "round8.py", "staged_r9.py",
    }
    found = set()
    for sub in ("queries", "operators"):
        base = os.path.join(root, sub)
        for fname in sorted(os.listdir(base)):
            if not fname.endswith(".py"):
                continue
            src = open(os.path.join(base, fname)).read().splitlines()
            for i, line in enumerate(src):
                if "div (2" not in line and "div(2" not in line:
                    continue
                ctx = "\n".join(src[max(0, i - 12) : i + 3])
                if re.search(r"tail_sum|vm\b|value \* 1000000", ctx):
                    found.add(fname)
    assert found == expected_modules, (
        f"value-sum div sites moved: {sorted(found)} — re-audit and"
        " update SITES + this list"
    )
