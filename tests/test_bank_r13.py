"""Cross-engine verification of the round-13 STAGING bank (built in
round 12, deliberately unregistered): each query/oracle pair runs
driver-style (pandas sort + canon compare) against DuckDB at the test
SF — so round-13 registration inherits already-proven pairs (the
bank_r6…bank_r12 precedent).  The builder additionally smoked every
pair at all three SFs via tools/smoke_pairs.py before staging; the
rank-moment keys (Mood, Cuzick) pin their null moments by EXHAUSTIVE
permutation on a tiny case, the serial/trend statistics carry
brute-force replays, and the exp-consuming KS key replays the per-cell
CDF rounding (this round's staging caught two NEW portability classes:
Spark parsing bare 4.0/5.0 literals as DECIMAL — collapsing a variance
to scale-truncated decimal division — and DuckDB's double-rounded
int128→double cast flipping a round-to-integer term's last unit)."""

import itertools
import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faconne_spark.queries.bank_r13 import BANK_ORACLES, BANK_QUERIES

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
def test_bank_r13_pair_matches_oracle(spark, sf_dir, duck, name):
    got = BANK_QUERIES[name](spark, sf_dir).toPandas()
    want = duck.sql(BANK_ORACLES[name]).df()
    got.columns = [c.lower() for c in got.columns]
    want.columns = [c.lower() for c in want.columns]
    assert len(got) == len(want), name
    assert len(got) > 0, f"{name} vacuous"
    assert sorted(got.columns) == sorted(want.columns), name
    assert _canon(got) == _canon(want), name


def test_bank_r13_partitioning_invariant(spark, sf_dir):
    """Identical results under different shuffle-partition counts —
    the rank primitives (Mood/Cuzick avg-ranks, per-year Gini
    windows), the per-user lag windows (streaks, gap KS), and the
    top-k cutoffs (corr pairs) are the partition-sensitive shapes."""
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


# --------------------------------------------------------- replays


def test_mood_null_moments_by_exhaustive_permutation():
    """E[T4] = n1(N²−1)/3 and Var[T4] = 4n1n2(N+1)(N²−4)/45 pinned by
    brute force: enumerate every size-n1 subset of ranks 1..N and
    compute the exact mean/variance of T4 = Σ(2r − (N+1))²."""
    N, n1 = 8, 3
    vals = []
    for subset in itertools.combinations(range(1, N + 1), n1):
        vals.append(sum((2 * r - (N + 1)) ** 2 for r in subset))
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / len(vals)
    assert math.isclose(mean, n1 * (N * N - 1) / 3)
    assert math.isclose(var, 4 * n1 * (N - n1) * (N + 1) * (N * N - 4) / 45)


def test_cuzick_null_moments_by_exhaustive_permutation():
    """E[T] = (N+1)/2·Σn_l·l and Var[T] = (N+1)/12·(N·Σn_l·l² −
    (Σn_l·l)²) pinned by enumerating every rank assignment."""
    scores = [1, 1, 2, 3, 3]  # five rows, three groups
    N = len(scores)
    vals = []
    for perm in itertools.permutations(range(1, N + 1)):
        vals.append(sum(s * r for s, r in zip(scores, perm)))
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / len(vals)
    sl = sum(scores)
    sl2 = sum(s * s for s in scores)
    assert math.isclose(mean, (N + 1) / 2 * sl)
    assert math.isclose(var, (N + 1) / 12 * (N * sl2 - sl * sl))


def test_bartels_rvn_bruteforce_replay(sf_dir):
    """RVN and z recomputed in plain Python from the daily counts with
    the same avg2 tie ranks — pins the rank arithmetic AND the
    integer-literal variance expression (the 4.0/5.0-as-DECIMAL trap
    was caught here)."""
    con = duckdb.connect()
    days = con.sql(
        f"SELECT ts::DATE AS d, count(*) AS x FROM"
        f" read_parquet('{sf_dir}/events.parquet')"
        f" GROUP BY 1 ORDER BY 1"
    ).fetchall()
    xs = [x for _d, x in days]
    n = len(xs)
    srt = sorted(xs)
    avg2 = []
    for x in xs:
        below = sum(1 for v in srt if v < x)
        ties = sum(1 for v in srt if v == x)
        avg2.append(2 * below + ties + 1)
    nm4 = sum(
        (avg2[i] - avg2[i + 1]) ** 2 for i in range(n - 1)
    )
    d4 = sum((a - (n + 1)) ** 2 for a in avg2)
    rvn = nm4 / d4
    var = (
        4 * (n - 2) * (5 * n * n - 2 * n - 9)
        / (5 * n * (n + 1) * (n - 1) * (n - 1))
    )
    z = (nm4 - 2 * d4) / d4 / math.sqrt(var)
    row = con.sql(
        BANK_ORACLES["events_daily_bartels_rank_vn"].replace(
            "FROM events", f"FROM read_parquet('{sf_dir}/events.parquet')"
        )
    ).fetchone()
    assert row[1] == nm4 and row[2] == d4
    assert row[3] == pytest.approx(round(rvn, 6), abs=1e-9)
    assert row[4] == pytest.approx(round(z, 6), abs=1e-9)


def test_kuiper_bruteforce_replay(sf_dir):
    """V = D⁺ + D⁻ recomputed from raw per-hour counts."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT extract(hour FROM ts)::INT AS h,"
        f" ((ts::DATE - DATE '1970-01-01') % 7 IN (2, 3))::INT AS we,"
        f" count(*) AS c FROM"
        f" read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    c1 = {h: 0 for h in range(24)}
    c2 = {h: 0 for h in range(24)}
    for h, we, c in rows:
        (c1 if we else c2)[h] += c
    n1, n2 = sum(c1.values()), sum(c2.values())
    f1 = f2 = 0
    gplus = gminus = 0
    for h in sorted(set(k for k in c1 if c1[k] or c2[k])):
        f1 += c1[h]
        f2 += c2[h]
        g = f1 * n2 - f2 * n1
        gplus = max(gplus, g)
        gminus = max(gminus, -g)
    got = con.sql(
        BANK_ORACLES["events_weekend_kuiper"].replace(
            "FROM events", f"FROM read_parquet('{sf_dir}/events.parquet')"
        )
    ).fetchone()
    assert (got[2], got[3]) == (gplus, gminus)
    assert got[4] == pytest.approx(
        round((gplus + gminus) / (n1 * n2), 6), abs=1e-9
    )


def test_ca_trend_bruteforce_replay(sf_dir):
    """Cochran–Armitage z recomputed from per-month (n, r) counts with
    the textbook p̄q̄ form — pins the integer-assembled identity."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT year(l_shipdate) * 12 + month(l_shipdate) AS m,"
        f" count(*) AS n,"
        f" sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r"
        f" FROM read_parquet('{sf_dir}/lineitem.parquet') GROUP BY 1"
    ).fetchall()
    m0 = min(m for m, _n, _r in rows)
    N = sum(n for _m, n, _r in rows)
    R = sum(r for _m, _n, r in rows)
    sr = sum((m - m0) * r for m, _n, r in rows)
    sn = sum((m - m0) * n for m, n, _r in rows)
    sns2 = sum((m - m0) ** 2 * n for m, n, _r in rows)
    p = R / N
    num = sr - p * sn
    var = p * (1 - p) * (sns2 - sn * sn / N)
    z = num / math.sqrt(var)
    got = con.sql(
        BANK_ORACLES["lineitem_monthly_return_trend_ca"].replace(
            "FROM lineitem",
            f"FROM read_parquet('{sf_dir}/lineitem.parquet')",
        )
    ).fetchone()
    assert got[3] == pytest.approx(round(z, 6), abs=2e-6)


def test_gap_exponential_cdf_replay(sf_dir):
    """The per-edge model CDF micros replayed in plain Python (the
    first exp() consumer — same per-cell contract as ln)."""
    from faconne_spark.queries.bank_r13 import GAP_KS_EDGES_US

    con = duckdb.connect()
    n, sg = con.sql(
        f"""
        WITH g0 AS (
          SELECT epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS g
          FROM read_parquet('{sf_dir}/events.parquet'))
        SELECT count(*), sum(g) FROM g0 WHERE g IS NOT NULL
        """
    ).fetchone()
    mean_us = (2 * sg + n) // (2 * n)
    for i, e in enumerate(GAP_KS_EDGES_US):
        want = math.floor(
            (1 - math.exp(-(e / mean_us))) * 1e6 + 0.5
        )
        got = con.sql(
            f"SELECT round((1 - exp(-({e}::DOUBLE / {mean_us}::DOUBLE)))"
            f" * 1000000, 0)::BIGINT"
        ).fetchone()[0]
        assert got == want, (i, e)


def test_theil_decomposition_identity(spark, sf_dir, duck):
    """t_within is DEFINED as total − between (exact integers); the
    mathematical identity T_w = Σ(S_g/S)·T_g holds up to the per-cell
    micro rounding — verify the decomposition is consistent and all
    three parts are non-negative on real data."""
    row = duck.sql(BANK_ORACLES["events_value_theil_decomp_dow"]).fetchone()
    n, t_tot, t_btw, t_win = row
    assert t_tot == t_btw + t_win
    assert t_tot >= 0 and t_btw >= 0 and t_win >= 0
    # between must not exceed total (grouping can only explain part)
    assert t_btw <= t_tot


def test_partial_corr_bruteforce_replay(sf_dir):
    """The three pairwise r's and the partial recomputed in plain
    Python from the same exact integer moments."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_quantity::BIGINT,"
        f" round(l_extendedprice::DOUBLE * 100, 0)::BIGINT,"
        f" round(l_discount::DOUBLE * 100, 0)::BIGINT"
        f" FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    n = len(rows)
    sx = sum(r[0] for r in rows)
    sy = sum(r[1] for r in rows)
    sz = sum(r[2] for r in rows)
    sxx = sum(r[0] * r[0] for r in rows)
    syy = sum(r[1] * r[1] for r in rows)
    szz = sum(r[2] * r[2] for r in rows)
    sxy = sum(r[0] * r[1] for r in rows)
    sxz = sum(r[0] * r[2] for r in rows)
    syz = sum(r[1] * r[2] for r in rows)

    def corr(ab, sa, sb, saa, sbb):
        return (n * ab - sa * sb) / math.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )

    rxy = corr(sxy, sx, sy, sxx, syy)
    rxz = corr(sxz, sx, sz, sxx, szz)
    ryz = corr(syz, sy, sz, syy, szz)
    part = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz * rxz) * (1 - ryz * ryz)
    )
    got = con.sql(
        BANK_ORACLES["lineitem_qty_price_partial_corr"].replace(
            "FROM lineitem",
            f"FROM read_parquet('{sf_dir}/lineitem.parquet')",
        )
    ).fetchone()
    assert got[1] == pytest.approx(round(rxy, 6), abs=2e-6)
    assert got[4] == pytest.approx(round(part, 6), abs=2e-6)


def test_streaks_bruteforce_replay(sf_dir):
    """Max streak per user recomputed with plain Python set logic."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT DISTINCT user_id,"
        f" (ts::DATE - DATE '1970-01-01')::BIGINT"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    by_user: dict = {}
    for u, d in rows:
        by_user.setdefault(u, set()).add(d)
    maxes = []
    for days in by_user.values():
        best = cur = 1
        prev = None
        for d in sorted(days):
            cur = cur + 1 if prev is not None and d == prev + 1 else 1
            best = max(best, cur)
            prev = d
        maxes.append(best)
    got = con.sql(
        BANK_ORACLES["events_user_streak_quantiles"].replace(
            "FROM events", f"FROM read_parquet('{sf_dir}/events.parquet')"
        )
    ).fetchone()
    assert got[0] == len(maxes)
    assert got[4] == max(maxes)
    ge7 = sum(1 for m in maxes if m >= 7)
    assert got[5] == (2 * 1_000_000 * ge7 + len(maxes)) // (
        2 * len(maxes)
    )


# ------------------- continuation-growth replays (wave 5)


def _round_away(x):
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def test_mcnemar_replay(spark, sf_dir, duck):
    rows = duck.sql(
        "SELECT user_id,"
        " max((epoch_us(ts) // 86400000000 % 7 IN (2,3))::INT),"
        " max((epoch_us(ts) // 86400000000 % 7 NOT IN (2,3))::INT)"
        " FROM events WHERE event_type = 'purchase' GROUP BY 1"
    ).fetchall()
    b = sum(1 for _, we, wd in rows if we and not wd)
    c = sum(1 for _, we, wd in rows if wd and not we)
    r = BANK_QUERIES["events_weekend_mcnemar"](spark, sf_dir).collect()[0]
    assert r["n_users"] == len(rows)
    assert (r["n10"], r["n01"]) == (b, c)
    if b + c:
        assert math.isclose(
            r["mcnemar_chi2"], round((b - c) ** 2 / (b + c), 6),
            abs_tol=1e-9,
        )


def _q_times_k(xs, k, num):
    """k× the continuous quantile at p = num/k of sorted ints: exact."""
    xs = sorted(xs)
    m = len(xs)
    idx, rem = (num * (m - 1)) // k, (num * (m - 1)) % k
    return k * xs[idx] + (rem * (xs[idx + 1] - xs[idx]) if rem else 0)


def test_chatterjee_xi_bruteforce_replay(spark, sf_dir, duck):
    """Replay ξ from the Chatterjee (2021) ties definition directly:
    in day order, rᵢ = #{cⱼ ≤ cᵢ}, lᵢ = #{cⱼ ≥ cᵢ}."""
    daily = [
        int(c)
        for _, c in duck.sql(
            "SELECT ts::DATE d, count(*) FROM events GROUP BY 1 ORDER BY 1"
        ).fetchall()
    ]
    n = len(daily)
    r = [sum(1 for x in daily if x <= ci) for ci in daily]
    l = [sum(1 for x in daily if x >= ci) for ci in daily]
    num = n * sum(abs(a - b) for a, b in zip(r[1:], r))
    den = 2 * sum(li * (n - li) for li in l)
    row = BANK_QUERIES["events_daily_chatterjee_xi"](
        spark, sf_dir
    ).collect()[0]
    assert row["n_days"] == n
    assert row["sum_rank_jumps"] == sum(abs(a - b) for a, b in zip(r[1:], r))
    assert math.isclose(row["xi"], round(1 - num / den, 6), abs_tol=1e-9)


def test_jackknife_replay(spark, sf_dir, duck):
    rows = duck.sql(
        "SELECT ts::DATE d, sum(floor(value * 100 + 0.5)::BIGINT),"
        " count(*) FROM events GROUP BY 1"
    ).fetchall()
    g = len(rows)
    S = sum(int(s) for _, s, _ in rows)
    N = sum(int(c) for _, _, c in rows)
    t = [_round_away((S - int(s)) / (N - int(c)) * 1e6)
         for _, s, c in rows]
    tt, tq = sum(t), sum(x * x for x in t)
    row = BANK_QUERIES["events_value_jackknife_se"](
        spark, sf_dir
    ).collect()[0]
    assert row["n_days"] == g
    assert math.isclose(
        row["loo_mean"], round(tt / (g * 1e6) / 100, 6), abs_tol=1e-9
    )
    want = round(
        math.sqrt((g * tq - tt * tt) * (g - 1)) / (g * g) / 1e6 / 100, 6
    )
    assert math.isclose(row["jackknife_se"], want, abs_tol=1e-9)


def test_gini_correlation_replay(spark, sf_dir, duck):
    rows = duck.sql(
        "SELECT floor(l_quantity + 0.5)::BIGINT,"
        " floor(l_extendedprice * 100 + 0.5)::BIGINT FROM lineitem"
    ).fetchall()
    xs = [int(x) for x, _ in rows]
    ys = [int(y) for _, y in rows]
    n = len(xs)

    def tie_ranks2(vals):
        from collections import Counter

        cnt = Counter(vals)
        below = {}
        run = 0
        for v in sorted(cnt):
            below[v] = run
            run += cnt[v]
        return [2 * below[v] + cnt[v] + 1 for v in vals]

    r2x, r2y = tie_ranks2(xs), tie_ranks2(ys)
    sx, sy = sum(xs), sum(ys)
    srx, sry = sum(r2x), sum(r2y)
    sxry = sum(x * r for x, r in zip(xs, r2y))
    syrx = sum(y * r for y, r in zip(ys, r2x))
    sxrx = sum(x * r for x, r in zip(xs, r2x))
    syry = sum(y * r for y, r in zip(ys, r2y))

    def half_up_signed(num, den):
        if num >= 0:
            return (2 * num * 10**6 + den) // (2 * den)
        return -((2 * (-num) * 10**6 + den) // (2 * den))

    gxy = half_up_signed(n * sxry - sx * sry, n * sxrx - sx * srx)
    gyx = half_up_signed(n * syrx - sy * srx, n * syry - sy * sry)
    row = BANK_QUERIES["lineitem_qty_price_gini_correlation"](
        spark, sf_dir
    ).collect()[0]
    assert row["n_rows"] == n
    assert math.isclose(row["gini_corr_xy"], round(gxy / 1e6, 6),
                        abs_tol=1e-9)
    assert math.isclose(row["gini_corr_yx"], round(gyx / 1e6, 6),
                        abs_tol=1e-9)


def test_bank_keys_do_not_collide_with_registry():
    """Staging-time name-collision guard: a bank pair that reuses a
    REGISTERED key's name would silently shadow it at registration
    (caught live in r12: a staged Moors-kurtosis pair duplicated the
    r10 key events_value_moors_kurtosis and was dropped)."""
    from faconne_spark.queries import all_queries

    overlap = sorted(set(BANK_QUERIES) & set(all_queries()))
    assert not overlap, f"bank keys shadow registered keys: {overlap}"


def test_cochran_q_replay(spark, sf_dir, duck):
    rows = duck.sql(
        "WITH ev AS (SELECT user_id, event_type, ts::DATE AS d"
        " FROM events),"
        " top3 AS (SELECT event_type, row_number() OVER"
        " (ORDER BY count(*) DESC, event_type) AS rk FROM ev"
        " GROUP BY event_type QUALIFY rk <= 3)"
        " SELECT user_id, rk, (count(DISTINCT d) >= 11)::INT"
        " FROM ev JOIN top3 USING (event_type) GROUP BY 1, 2"
    ).fetchall()
    users = {}
    for uid, rk, x in rows:
        users.setdefault(uid, {})[rk] = int(x)
    n = len(users)
    c = {j: sum(u.get(j, 0) for u in users.values()) for j in (1, 2, 3)}
    t = sum(c.values())
    r2 = sum(sum(u.values()) ** 2 for u in users.values())
    row = BANK_QUERIES["events_type_cochran_q"](spark, sf_dir).collect()[0]
    assert row["n_users"] == n
    assert (row["c1"], row["c2"], row["c3"]) == (c[1], c[2], c[3])
    if 3 * t - r2 > 0:
        want = round(
            2 * sum((3 * c[j] - t) ** 2 for j in (1, 2, 3))
            / (3 * (3 * t - r2)), 6,
        )
        assert math.isclose(row["cochran_q"], want, abs_tol=1e-9)
        assert row["cochran_q"] is not None
