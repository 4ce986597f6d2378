"""Round-13 staging bank: query/oracle pairs built and cross-engine
proven at three SFs in round 12 (the bank discipline — operator +
oracle + driver-style test + partitioning sweep + plain-Python
replays in tests/test_bank_r13.py), deliberately UNREGISTERED so the
r12 driver window stays within budget.  Registration is the round-13
opening move (QUERIES/ORACLES aliases + _merged() import + window
entries + snapshots stamped at registration + bench + SURVEY rows +
SCALING)."""

from __future__ import annotations

from pyspark.sql import functions as F

from faconne_spark.queries import T

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}


# ----------------------------------- supplier-nation balance ANOVA

def supplier_nation_balance_anova(spark, sf):
    """One-way ANOVA of SUPPLIER account balance across nations — the
    supplier-table member of the location family (customers have the
    segment ANOVA, nation Kruskal, Welch pairs; suppliers had only the
    debt-rate CI): does geography explain any supply-side balance
    variance?

    Exactness — a STRICTER discipline than evalstats.oneway_anova's
    micro-rounded double terms, adopted after this key caught the
    int128→double conversion hazard at staging (DuckDB converts a
    >2⁶⁴ DECIMAL to double via two 64-bit halves — double-rounded —
    where the JVM's BigDecimal conversion rounds once; one supplier
    SS term flipped its last unit at sf0.1): every term is an EXACT
    integer half-up division of exact DECIMAL products,
    b = (s·nt − st·n)² ⁄ (n·nt²·100), w = (ss·n − s²) ⁄ (n·100), via
    the (2a+b) div (2b) idiom — no DECIMAL ever crosses to double
    before the final F/η².  Balances are exact CENTI integers (two
    decimal places), so the squared-sum products stay inside
    DECIMAL(38,0) through sf100."""
    g = (
        T(spark, sf, "supplier")
        .filter("s_acctbal is not null")
        .groupBy("s_nationkey")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr(
                "sum(cast(round(cast(s_acctbal as double) * 100, 0)"
                " as bigint))"
            ).alias("s"),
            F.expr(
                "sum(cast(round(cast(s_acctbal as double) * 100, 0)"
                " as bigint) * cast(round(cast(s_acctbal as double)"
                " * 100, 0) as decimal(38,0)))"
            ).alias("ss"),
        )
    )
    tot = g.groupBy().agg(
        F.sum("n").alias("nt"),
        F.sum("s").alias("st"),
        F.count("*").alias("k"),
    )
    bnum = (
        "(cast(s as decimal(38,0)) * nt - cast(st as decimal(38,0)) * n)"
    )
    bden = "(cast(n as decimal(38,0)) * nt * nt * 100)"
    wnum = (
        "(cast(ss as decimal(38,0)) * n"
        " - cast(s as decimal(38,0)) * s)"
    )
    wden = "(cast(n as decimal(38,0)) * 100)"
    terms = g.crossJoin(F.broadcast(tot)).selectExpr(
        "k", "nt",
        f"cast((2 * {bnum} * {bnum} + {bden}) div (2 * {bden})"
        " as bigint) AS b",
        f"cast((2 * {wnum} + {wden}) div (2 * {wden}) as bigint) AS w",
    )
    fs = (
        "(cast(sum(b) as double) / (max(k) - 1))"
        " / (cast(sum(w) as double) / (max(nt) - max(k)))"
    )
    return terms.groupBy().agg(
        F.max("k").cast("long").alias("n_groups"),
        F.max("nt").cast("long").alias("n_rows"),
        F.sum("b").cast("long").alias("ssb_centi2"),
        F.sum("w").cast("long").alias("ssw_centi2"),
        F.expr(
            f"case when max(k) >= 2 and max(nt) > max(k) and sum(w) > 0"
            f" then round({fs}, 6) + 0.0 end"
        ).alias("f_stat"),
        F.expr(
            "case when sum(b) + sum(w) > 0 then"
            " round(cast(sum(b) as double)"
            " / (cast(sum(b) as double) + cast(sum(w) as double)), 6)"
            " + 0.0 end"
        ).alias("eta_sq"),
    )


ORACLE_SUPPLIER_ANOVA = """
WITH g AS (
  SELECT s_nationkey, count(*)::BIGINT AS n,
         sum(round(s_acctbal::DOUBLE * 100, 0)::BIGINT)::BIGINT AS s,
         sum(round(s_acctbal::DOUBLE * 100, 0)::BIGINT
             * round(s_acctbal::DOUBLE * 100, 0)::BIGINT::DECIMAL(38,0))
           AS ss
  FROM supplier WHERE s_acctbal IS NOT NULL GROUP BY 1),
tot AS (
  SELECT sum(n)::BIGINT AS nt, sum(s)::BIGINT AS st,
         count(*)::BIGINT AS k
  FROM g),
terms AS (
  SELECT k, nt,
         ((2 * (s::HUGEINT * nt - st::HUGEINT * n)
             * (s::HUGEINT * nt - st::HUGEINT * n)
           + n::HUGEINT * nt * nt * 100)
          // (2 * n::HUGEINT * nt * nt * 100))::BIGINT AS b,
         ((2 * (ss::HUGEINT * n - s::HUGEINT * s)
           + n::HUGEINT * 100)
          // (2 * n::HUGEINT * 100))::BIGINT AS w
  FROM g CROSS JOIN tot)
SELECT max(k)::BIGINT AS n_groups, max(nt)::BIGINT AS n_rows,
       sum(b)::BIGINT AS ssb_centi2, sum(w)::BIGINT AS ssw_centi2,
       CASE WHEN max(k) >= 2 AND max(nt) > max(k) AND sum(w) > 0 THEN
         round((sum(b)::DOUBLE / (max(k) - 1))
               / (sum(w)::DOUBLE / (max(nt) - max(k))), 6) + 0.0 END
         AS f_stat,
       CASE WHEN sum(b) + sum(w) > 0 THEN
         round(sum(b)::DOUBLE / (sum(b)::DOUBLE + sum(w)::DOUBLE), 6)
         + 0.0 END AS eta_sq
FROM terms
"""

BANK_QUERIES["supplier_nation_balance_anova"] = supplier_nation_balance_anova
BANK_ORACLES["supplier_nation_balance_anova"] = ORACLE_SUPPLIER_ANOVA


# ------------------------- supplier-vs-customer balance gap per nation

def nation_balance_welch_gap(spark, sf):
    """Per-nation Welch unequal-variance t between SUPPLIER and
    CUSTOMER account balances — the cross-table localization the
    one-table tests can't give (a nation whose suppliers sit far
    richer than its customers is a payment-terms asymmetry story;
    pooling nations hides it).  Fourth Welch consumer, wearing the
    r12 degenerate-data CASE guard from day one.

    Exactness: balances are exact centi integers; per-side moments
    are one groupBy each; the 25-row nation frame does all the
    arithmetic in closed-form doubles."""
    sup = T(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        F.expr(
            "cast(round(cast(s_acctbal as double) * 100, 0) as bigint)"
        ).alias("b"),
    )
    cus = T(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.expr(
            "cast(round(cast(c_acctbal as double) * 100, 0) as bigint)"
        ).alias("b"),
    )

    def moments(df, tag):
        return df.groupBy("nationkey").agg(
            F.count("*").cast("long").alias(f"n{tag}"),
            F.sum("b").alias(f"s{tag}"),
            F.sum(
                F.col("b").cast("decimal(38,0)")
                * F.col("b").cast("decimal(38,0)")
            ).alias(f"ss{tag}"),
        )

    m = moments(sup, "a").join(F.broadcast(moments(cus, "b")), "nationkey")
    va = (
        "((cast(ssa as double) - cast(sa as double) * sa / na)"
        " / (na - 1))"
    )
    vb = (
        "((cast(ssb as double) - cast(sb as double) * sb / nb)"
        " / (nb - 1))"
    )
    se2 = f"({va} / na + {vb} / nb)"
    guard = f"na > 1 AND nb > 1 AND {se2} > 0"
    return m.selectExpr(
        "nationkey", "na AS n_suppliers", "nb AS n_customers",
        f"CASE WHEN {guard} THEN "
        f"round((cast(sa as double) / na - cast(sb as double) / nb)"
        f" / sqrt({se2}), 6) + 0.0 END AS welch_t",
        f"CASE WHEN {guard} THEN "
        f"round(pow({se2}, 2) / (pow({va} / na, 2) / (na - 1)"
        f" + pow({vb} / nb, 2) / (nb - 1)), 6) + 0.0 END AS welch_df",
    )


ORACLE_NATION_WELCH_GAP = """
WITH sup AS (
  SELECT s_nationkey AS nationkey, count(*)::BIGINT AS na,
         sum(round(s_acctbal::DOUBLE * 100, 0)::BIGINT)::BIGINT AS sa,
         sum(round(s_acctbal::DOUBLE * 100, 0)::BIGINT::DECIMAL(38,0)
             * round(s_acctbal::DOUBLE * 100, 0)::BIGINT::DECIMAL(38,0))
           AS ssa
  FROM supplier GROUP BY 1),
cus AS (
  SELECT c_nationkey AS nationkey, count(*)::BIGINT AS nb,
         sum(round(c_acctbal::DOUBLE * 100, 0)::BIGINT)::BIGINT AS sb,
         sum(round(c_acctbal::DOUBLE * 100, 0)::BIGINT::DECIMAL(38,0)
             * round(c_acctbal::DOUBLE * 100, 0)::BIGINT::DECIMAL(38,0))
           AS ssb
  FROM customer GROUP BY 1)
SELECT nationkey, na AS n_suppliers, nb AS n_customers,
       CASE WHEN na > 1 AND nb > 1
              AND ((ssa::DOUBLE - sa::DOUBLE * sa / na) / (na - 1)) / na
                  + ((ssb::DOUBLE - sb::DOUBLE * sb / nb) / (nb - 1)) / nb > 0
       THEN
       round((sa::DOUBLE / na - sb::DOUBLE / nb)
             / sqrt(((ssa::DOUBLE - sa::DOUBLE * sa / na) / (na - 1)) / na
                    + ((ssb::DOUBLE - sb::DOUBLE * sb / nb) / (nb - 1)) / nb),
             6) + 0.0 END AS welch_t,
       CASE WHEN na > 1 AND nb > 1
              AND ((ssa::DOUBLE - sa::DOUBLE * sa / na) / (na - 1)) / na
                  + ((ssb::DOUBLE - sb::DOUBLE * sb / nb) / (nb - 1)) / nb > 0
       THEN
       round(pow(((ssa::DOUBLE - sa::DOUBLE * sa / na) / (na - 1)) / na
                 + ((ssb::DOUBLE - sb::DOUBLE * sb / nb) / (nb - 1)) / nb, 2)
             / (pow(((ssa::DOUBLE - sa::DOUBLE * sa / na) / (na - 1)) / na, 2)
                  / (na - 1)
                + pow(((ssb::DOUBLE - sb::DOUBLE * sb / nb) / (nb - 1)) / nb, 2)
                  / (nb - 1)), 6) + 0.0 END AS welch_df
FROM sup JOIN cus USING (nationkey)
"""

BANK_QUERIES["nation_balance_welch_gap"] = nation_balance_welch_gap
BANK_ORACLES["nation_balance_welch_gap"] = ORACLE_NATION_WELCH_GAP


# ------------------------------------ weekend/weekday circular Kuiper

def events_weekend_kuiper(spark, sf):
    """Two-sample Kuiper statistic V = D⁺ + D⁻ between the weekend and
    weekday HOUR-OF-DAY distributions — the circular member of the
    drift family (KS's D is rotation-DEPENDENT on a clock: a shift
    straddling midnight can vanish; Kuiper's V is invariant to where
    the 24-hour cycle is cut, which is exactly what a clock
    distribution needs).  Weekend = epoch-day % 7 ∈ {2, 3}.

    Exactness: per-hour counts are exact; D⁺/D⁻ numerators are exact
    integer maxima of (F₁·n₂ − F₂·n₁); V is one final double."""
    from pyspark.sql import Window as W

    ev = T(spark, sf, "events").select(
        F.expr(
            "cast(datediff(to_date(ts), DATE'1970-01-01') % 7 in (2, 3)"
            " as int)"
        ).alias("we"),
        F.expr("cast(hour(ts) as int)").alias("h"),
    )
    binned = ev.groupBy("h").agg(
        F.sum("we").alias("c1"),
        F.sum(F.expr("1 - we")).alias("c2"),
    )
    w = W.orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    tot = W.orderBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = binned.select(
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
        F.sum("c1").over(tot).alias("n1"),
        F.sum("c2").over(tot).alias("n2"),
    )
    gaps = cum.select(
        "n1", "n2",
        F.expr(
            "cast(f1 as decimal(38,0)) * n2"
            " - cast(f2 as decimal(38,0)) * n1"
        ).alias("g"),
    )
    return gaps.groupBy().agg(
        F.min("n1").cast("long").alias("n_weekend"),
        F.min("n2").cast("long").alias("n_weekday"),
        F.expr("cast(greatest(max(g), 0) as bigint)").alias("d_plus_num"),
        F.expr("cast(greatest(max(-g), 0) as bigint)").alias("d_minus_num"),
        F.expr(
            "round((cast(greatest(max(g), 0) as double)"
            " + cast(greatest(max(-g), 0) as double))"
            " / (cast(min(n1) as double) * min(n2)), 6) + 0.0"
        ).alias("kuiper_v"),
    )


ORACLE_WEEKEND_KUIPER = """
WITH ev AS (
  SELECT ((ts::DATE - DATE '1970-01-01') % 7 IN (2, 3))::INT AS we,
         extract(hour FROM ts)::INT AS h
  FROM events),
binned AS (
  SELECT h, sum(we)::BIGINT AS c1, sum(1 - we)::BIGINT AS c2
  FROM ev GROUP BY 1),
cum AS (
  SELECT sum(c1) OVER (ORDER BY h)::BIGINT AS f1,
         sum(c2) OVER (ORDER BY h)::BIGINT AS f2,
         sum(c1) OVER ()::BIGINT AS n1,
         sum(c2) OVER ()::BIGINT AS n2
  FROM binned),
gaps AS (
  SELECT n1, n2,
         f1::DECIMAL(38,0) * n2 - f2::DECIMAL(38,0) * n1 AS g
  FROM cum)
SELECT min(n1)::BIGINT AS n_weekend, min(n2)::BIGINT AS n_weekday,
       greatest(max(g), 0)::BIGINT AS d_plus_num,
       greatest(max(-g), 0)::BIGINT AS d_minus_num,
       round((greatest(max(g), 0)::DOUBLE + greatest(max(-g), 0)::DOUBLE)
             / (min(n1)::DOUBLE * min(n2)), 6) + 0.0 AS kuiper_v
FROM gaps
"""

BANK_QUERIES["events_weekend_kuiper"] = events_weekend_kuiper
BANK_ORACLES["events_weekend_kuiper"] = ORACLE_WEEKEND_KUIPER


# --------------------------------------- weekend/weekday Mood scale test

def events_weekend_mood_scale(spark, sf):
    """Mood two-sample SCALE test, weekend vs weekday event values:
    T = Σ_weekend (rᵢ − (N+1)/2)² on pooled ranks — the rank-based
    DISPERSION drift gauge completing the family (Wilcoxon reads
    location; Cliff's δ effect size; KS/CvM/AD whole-curve; Mood asks
    specifically "did the SPREAD change?", robust to heavy tails where
    the variance-ratio F is useless).  z from the exact no-tie null
    moments E[T] = n₁(N²−1)/12, Var[T] = n₁n₂(N+1)(N²−4)/180
    (documented approximation under ties; values are micro-grained so
    ties are sparse — the replay pins both moments by exhaustive
    permutation on a tiny case).

    Exactness: avg2 tie-ranks are exact integers (two-phase ranks on
    the distinct-value relation); each (avg2 − (N+1))² term is an
    exact BIGINT summed in DECIMAL(38,0); z is one final double."""
    from faconne_spark.operators.relational import distributed_avg_ranks

    ev = T(spark, sf, "events").select(
        F.expr(
            "cast(datediff(to_date(ts), DATE'1970-01-01') % 7 in (2, 3)"
            " as int)"
        ).alias("we"),
        F.expr("cast(floor(value * 1000000 + 0.5) as bigint)").alias("v"),
    ).filter("v is not null")
    ranked = distributed_avg_ranks(ev, "v")
    # t4 = Σ we·(avg2 − (N+1))² assembled from RAW moments so no
    # window needs the global N mid-stream:
    # t4 = Σwe·avg2² − 2(N+1)·Σwe·avg2 + (N+1)²·n1 — all exact ints
    agg = ranked.groupBy().agg(
        F.count("*").alias("n"),
        F.sum("we").alias("n1"),
        F.sum(
            F.expr("cast(we as decimal(38,0)) * avg2_rank")
        ).alias("m1"),
        F.sum(
            F.expr(
                "cast(we as decimal(38,0)) * avg2_rank * avg2_rank"
            )
        ).alias("m2"),
    )
    t4 = (
        "(m2 - 2 * cast(n + 1 as decimal(38,0)) * m1"
        " + cast(n + 1 as decimal(38,0)) * (n + 1) * n1)"
    )
    e4 = "(cast(n1 as double) * (cast(n as double) * n - 1) / 3.0)"
    var4 = (
        "(4.0 * cast(n1 as double) * (n - n1) * (n + 1)"
        " * (cast(n as double) * n - 4) / 45.0)"
    )
    return agg.selectExpr(
        "cast(n1 as bigint) AS n_weekend",
        "cast(n - n1 as bigint) AS n_weekday",
        f"cast({t4} as double) AS t4_stat",
        f"case when n1 > 0 and n - n1 > 0 and {var4} > 0 then"
        f" round((cast({t4} as double) - {e4}) / sqrt({var4}), 6) + 0.0 end"
        " AS mood_z",
    )


ORACLE_WEEKEND_MOOD = """
WITH ev AS (
  SELECT ((ts::DATE - DATE '1970-01-01') % 7 IN (2, 3))::INT AS we,
         floor(value * 1000000 + 0.5)::BIGINT AS v
  FROM events WHERE value IS NOT NULL),
ranked AS (
  SELECT we,
         2 * rank() OVER (ORDER BY v)
           + count(*) OVER (PARTITION BY v) - 1 AS avg2
  FROM ev),
agg AS (
  SELECT count(*)::BIGINT AS n, sum(we)::BIGINT AS n1,
         sum(we::DECIMAL(38,0) * avg2) AS m1,
         sum(we::DECIMAL(38,0) * avg2 * avg2) AS m2
  FROM ranked),
stat AS (
  SELECT n, n1,
         (m2 - 2 * (n + 1)::DECIMAL(38,0) * m1
          + (n + 1)::DECIMAL(38,0) * (n + 1) * n1) AS t4
  FROM agg)
SELECT n1 AS n_weekend, (n - n1)::BIGINT AS n_weekday,
       t4::DOUBLE AS t4_stat,
       CASE WHEN n1 > 0 AND n - n1 > 0
              AND 4.0 * n1::DOUBLE * (n - n1) * (n + 1)
                  * (n::DOUBLE * n - 4) / 45.0 > 0
       THEN round((t4::DOUBLE
                   - n1::DOUBLE * (n::DOUBLE * n - 1) / 3.0)
                  / sqrt(4.0 * n1::DOUBLE * (n - n1) * (n + 1)
                         * (n::DOUBLE * n - 4) / 45.0), 6) + 0.0
       END AS mood_z
FROM stat
"""

BANK_QUERIES["events_weekend_mood_scale"] = events_weekend_mood_scale
BANK_ORACLES["events_weekend_mood_scale"] = ORACLE_WEEKEND_MOOD


# --------------------------------- Bartels rank von Neumann randomness

def events_daily_bartels_rank_vn(spark, sf):
    """Bartels' rank von Neumann ratio on the daily volume series:
    RVN = Σ(Rₜ − Rₜ₊₁)² / Σ(Rₜ − R̄)² — the RANK-based serial
    randomness test (von Neumann's ratio on ranks; Bartels 1982),
    completing the randomness ladder beside the runs test (signs
    only) and the turning-point test (local shape only): RVN reads
    the MAGNITUDE of rank moves, catching slow drifts both miss.
    RVN ≈ 2 under randomness; z = (RVN − 2)/σ with the exact no-tie
    variance 4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²).

    Exactness: the day relation is bounded (≤ ~2.2k rows), avg2 tie
    ranks exact via a bounded window; numerator and denominator are
    exact ×4 integers; RVN and z are final doubles."""
    from pyspark.sql import Window as W

    daily = (
        T(spark, sf, "events")
        .groupBy(F.expr("to_date(ts)").alias("day"))
        .agg(F.count("*").alias("x"))
    )
    ranked = daily.select(
        "day",
        F.expr(
            "2 * rank() over (order by x)"
            " + count(*) over (partition by x) - 1"
        ).alias("avg2"),
        F.expr("count(*) over ()").alias("n"),
    )
    w = W.orderBy("day")
    pairs = ranked.select(
        "n", "avg2",
        F.lead("avg2").over(w).alias("nxt"),
    )
    agg = pairs.groupBy().agg(
        F.max("n").cast("long").alias("n"),
        F.expr(
            "cast(sum(case when nxt is not null then"
            " (avg2 - nxt) * (avg2 - nxt) else 0 end) as bigint)"
        ).alias("nm4"),
        F.expr(
            "cast(sum((avg2 - n - 1) * (avg2 - n - 1)) as bigint)"
        ).alias("d4"),
    )
    # NO bare decimal literals: Spark parses 4.0/5.0 as DECIMAL and
    # the whole variance collapses to scale-truncated DECIMAL division
    # (caught at staging: var came back as Decimal('0.126903') and z
    # lost its 6th digit) — exact integer num/den, ONE double division
    rvn = "(cast(nm4 as double) / cast(d4 as double))"
    var = (
        "(cast(4 * (n - 2) * (5 * n * n - 2 * n - 9) as double)"
        " / cast(5 * n * (n + 1) * (n - 1) * (n - 1) as double))"
    )
    z = (
        f"(cast(nm4 - 2 * d4 as double) / cast(d4 as double)"
        f" / sqrt({var}))"
    )
    return agg.selectExpr(
        "n AS n_days",
        "nm4",
        "d4",
        f"case when d4 > 0 then round({rvn}, 6) + 0.0 end AS rvn",
        f"case when d4 > 0 and n > 2 then"
        f" round({z}, 6) + 0.0 end AS z",
    )


ORACLE_BARTELS = """
WITH daily AS (
  SELECT ts::DATE AS day, count(*)::BIGINT AS x
  FROM events GROUP BY 1),
ranked AS (
  SELECT day,
         2 * rank() OVER (ORDER BY x)
           + count(*) OVER (PARTITION BY x) - 1 AS avg2,
         count(*) OVER ()::BIGINT AS n
  FROM daily),
pairs AS (
  SELECT n, avg2, lead(avg2) OVER (ORDER BY day) AS nxt
  FROM ranked),
agg AS (
  SELECT max(n)::BIGINT AS n,
         sum(CASE WHEN nxt IS NOT NULL
              THEN (avg2 - nxt) * (avg2 - nxt) ELSE 0 END)::BIGINT
           AS nm4,
         sum((avg2 - n - 1) * (avg2 - n - 1))::BIGINT AS d4
  FROM pairs)
SELECT n AS n_days, nm4, d4,
       CASE WHEN d4 > 0 THEN
         round(nm4::DOUBLE / d4::DOUBLE, 6) + 0.0 END AS rvn,
       CASE WHEN d4 > 0 AND n > 2 THEN
         round((nm4 - 2 * d4)::DOUBLE / d4::DOUBLE
               / sqrt((4 * (n - 2) * (5 * n * n - 2 * n - 9))::DOUBLE
                      / (5 * n * (n + 1) * (n - 1) * (n - 1))::DOUBLE),
               6) + 0.0 END AS z
FROM agg
"""

BANK_QUERIES["events_daily_bartels_rank_vn"] = events_daily_bartels_rank_vn
BANK_ORACLES["events_daily_bartels_rank_vn"] = ORACLE_BARTELS


# ------------------------------------- Cuzick trend across priorities

def orders_priority_cuzick_trend(spark, sf):
    """Cuzick's rank test for TREND across the ordered priority levels
    (1-URGENT … 5-LOW) on order value: T = Σ lᵢ·rᵢ with level scores
    l ∈ {1..5} — the ordered-alternative test the one-way
    Kruskal/ANOVA family cannot express (an omnibus H treats levels
    as unordered; Cuzick asks "does value MONOTONICALLY move with
    urgency?", one df, far more power against the ordered
    alternative).  z from the exact no-tie null moments
    E[T] = (N+1)/2·Σn_l·l, Var[T] = (N+1)/12·(N·Σn_l·l² − (Σn_l·l)²)
    (tie caveat documented; the replay pins both moments by
    exhaustive permutation).

    Exactness: avg2 ranks two-phase on the distinct-cent relation;
    T2 = Σ l·avg2 summed in DECIMAL; z one final double."""
    from faconne_spark.operators.relational import distributed_avg_ranks

    orders = T(spark, sf, "orders").select(
        F.expr("cast(substring(o_orderpriority, 1, 1) as int)").alias("l"),
        F.expr(
            "cast(floor(o_totalprice * 100 + 0.5) as bigint)"
        ).alias("v"),
    )
    ranked = distributed_avg_ranks(orders, "v")
    agg = ranked.groupBy().agg(
        F.count("*").alias("n"),
        F.sum(
            F.expr("cast(l as decimal(38,0)) * avg2_rank")
        ).alias("t2"),
        F.sum("l").alias("sl"),
        F.sum(F.expr("l * l")).alias("sl2"),
    )
    e2 = "(cast(n + 1 as double) * sl)"
    var2 = (
        "(cast(n + 1 as double) / 3.0"
        " * (cast(n as double) * sl2 - cast(sl as double) * sl))"
    )
    return agg.selectExpr(
        "cast(n as bigint) AS n_orders",
        "cast(t2 as bigint) AS t2_stat",
        f"case when {var2} > 0 then"
        f" round((cast(t2 as double) - {e2}) / sqrt({var2}), 6) + 0.0 end"
        " AS cuzick_z",
    )


ORACLE_CUZICK = """
WITH orders_s AS (
  SELECT substring(o_orderpriority, 1, 1)::INT AS l,
         floor(o_totalprice * 100 + 0.5)::BIGINT AS v
  FROM orders),
ranked AS (
  SELECT l,
         2 * rank() OVER (ORDER BY v)
           + count(*) OVER (PARTITION BY v) - 1 AS avg2
  FROM orders_s),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(l::DECIMAL(38,0) * avg2) AS t2,
         sum(l)::BIGINT AS sl, sum(l * l)::BIGINT AS sl2
  FROM ranked)
SELECT n AS n_orders, t2::BIGINT AS t2_stat,
       CASE WHEN (n + 1)::DOUBLE / 3.0
                 * (n::DOUBLE * sl2 - sl::DOUBLE * sl) > 0
       THEN round((t2::DOUBLE - (n + 1)::DOUBLE * sl)
                  / sqrt((n + 1)::DOUBLE / 3.0
                         * (n::DOUBLE * sl2 - sl::DOUBLE * sl)),
                  6) + 0.0 END AS cuzick_z
FROM agg
"""

BANK_QUERIES["orders_priority_cuzick_trend"] = orders_priority_cuzick_trend
BANK_ORACLES["orders_priority_cuzick_trend"] = ORACLE_CUZICK
