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


# --------------------------------- qty↔price partial correlation

def lineitem_qty_price_partial_corr(spark, sf):
    """Partial Pearson correlation between quantity and extended price
    CONTROLLING for discount — the first partial correlation in the
    registry (the pairwise r's can't separate "qty drives price" from
    "discount drives both"; r_xy·z removes the shared channel).
    Returns the three pairwise r's and the partial.

    Exactness: quantity is an exact integer, price exact centi,
    discount exact centi; all ten moments are exact DECIMAL(38,0)
    sums; every r is a final-expression double (variance products
    would overflow DECIMAL, so each variance casts to double BEFORE
    the sqrt — deterministic both engines)."""
    li = T(spark, sf, "lineitem").selectExpr(
        "cast(l_quantity as bigint) AS x",
        "cast(round(cast(l_extendedprice as double) * 100, 0)"
        " as bigint) AS y",
        "cast(round(cast(l_discount as double) * 100, 0) as bigint) AS z",
    )
    m = li.groupBy().agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.expr("sum(cast(x as decimal(38,0)) * x)").alias("sxx"),
        F.expr("sum(cast(y as decimal(38,0)) * y)").alias("syy"),
        F.expr("sum(cast(z as decimal(38,0)) * z)").alias("szz"),
        F.expr("sum(cast(x as decimal(38,0)) * y)").alias("sxy"),
        F.expr("sum(cast(x as decimal(38,0)) * z)").alias("sxz"),
        F.expr("sum(cast(y as decimal(38,0)) * z)").alias("syz"),
    )

    def cov(a, b, ab):
        return (
            f"cast(cast(n as decimal(38,0)) * {ab}"
            f" - cast(s{a} as decimal(38,0)) * s{b} as double)"
        )

    def var(a, aa):
        return (
            f"cast(cast(n as decimal(38,0)) * {aa}"
            f" - cast(s{a} as decimal(38,0)) * s{a} as double)"
        )

    rxy = f"({cov('x','y','sxy')} / (sqrt({var('x','sxx')}) * sqrt({var('y','syy')})))"
    rxz = f"({cov('x','z','sxz')} / (sqrt({var('x','sxx')}) * sqrt({var('z','szz')})))"
    ryz = f"({cov('y','z','syz')} / (sqrt({var('y','syy')}) * sqrt({var('z','szz')})))"
    part = (
        f"(({rxy} - {rxz} * {ryz})"
        f" / sqrt((1 - {rxz} * {rxz}) * (1 - {ryz} * {ryz})))"
    )
    ok = (
        f"n > 2 and {var('x','sxx')} > 0 and {var('y','syy')} > 0"
        f" and {var('z','szz')} > 0"
    )
    return m.selectExpr(
        "cast(n as bigint) AS n_lines",
        f"case when {ok} then round({rxy}, 6) + 0.0 end AS r_qty_price",
        f"case when {ok} then round({rxz}, 6) + 0.0 end AS r_qty_disc",
        f"case when {ok} then round({ryz}, 6) + 0.0 end AS r_price_disc",
        f"case when {ok} and (1 - {rxz} * {rxz}) * (1 - {ryz} * {ryz}) > 0"
        f" then round({part}, 6) + 0.0 end AS partial_r_qty_price",
    )


def _oracle_partial_corr() -> str:
    def cov(a, b, ab):
        return f"(n::DECIMAL(38,0) * {ab} - s{a}::DECIMAL(38,0) * s{b})::DOUBLE"

    def var(a, aa):
        return f"(n::DECIMAL(38,0) * {aa} - s{a}::DECIMAL(38,0) * s{a})::DOUBLE"

    rxy = f"({cov('x','y','sxy')} / (sqrt({var('x','sxx')}) * sqrt({var('y','syy')})))"
    rxz = f"({cov('x','z','sxz')} / (sqrt({var('x','sxx')}) * sqrt({var('z','szz')})))"
    ryz = f"({cov('y','z','syz')} / (sqrt({var('y','syy')}) * sqrt({var('z','szz')})))"
    part = (
        f"(({rxy} - {rxz} * {ryz})"
        f" / sqrt((1 - {rxz} * {rxz}) * (1 - {ryz} * {ryz})))"
    )
    ok = (
        f"n > 2 AND {var('x','sxx')} > 0 AND {var('y','syy')} > 0"
        f" AND {var('z','szz')} > 0"
    )
    return f"""
WITH li AS (
  SELECT l_quantity::BIGINT AS x,
         round(l_extendedprice::DOUBLE * 100, 0)::BIGINT AS y,
         round(l_discount::DOUBLE * 100, 0)::BIGINT AS z
  FROM lineitem),
m AS (
  SELECT count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(z)::BIGINT AS sz,
         sum(x::DECIMAL(38,0) * x) AS sxx,
         sum(y::DECIMAL(38,0) * y) AS syy,
         sum(z::DECIMAL(38,0) * z) AS szz,
         sum(x::DECIMAL(38,0) * y) AS sxy,
         sum(x::DECIMAL(38,0) * z) AS sxz,
         sum(y::DECIMAL(38,0) * z) AS syz
  FROM li)
SELECT n AS n_lines,
       CASE WHEN {ok} THEN round({rxy}, 6) + 0.0 END AS r_qty_price,
       CASE WHEN {ok} THEN round({rxz}, 6) + 0.0 END AS r_qty_disc,
       CASE WHEN {ok} THEN round({ryz}, 6) + 0.0 END AS r_price_disc,
       CASE WHEN {ok} AND (1 - {rxz} * {rxz}) * (1 - {ryz} * {ryz}) > 0
            THEN round({part}, 6) + 0.0 END AS partial_r_qty_price
FROM m
"""


BANK_QUERIES["lineitem_qty_price_partial_corr"] = (
    lineitem_qty_price_partial_corr
)
BANK_ORACLES["lineitem_qty_price_partial_corr"] = _oracle_partial_corr()


# -------------------------------------- user activity-streak quantiles

def events_user_streak_quantiles(spark, sf):
    """Quartiles of each user's LONGEST consecutive-active-day streak,
    plus the share of users with a streak ≥ 7 — the habit-formation
    tile the stickiness ratio and cohort half-life can't show (both
    read totals; a streak reads CONTIGUITY, the strongest retention
    predictor product teams track).

    Gaps-and-islands: distinct (user, day) → island id = day −
    row_number within user (exact integers; the window partitions by
    user), streak = island size, per-user max, ×4-exact quartiles
    across users + a half-up micro share."""
    from pyspark.sql import Window as W

    days = (
        T(spark, sf, "events")
        .selectExpr(
            "user_id",
            "cast(datediff(to_date(ts), DATE'1970-01-01') as bigint) AS d",
        )
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("d")
    streaks = (
        days.withColumn("island", F.expr("d") - F.row_number().over(w))
        .groupBy("user_id", "island")
        .agg(F.count("*").alias("len"))
    )
    per_user = streaks.groupBy("user_id").agg(
        F.max("len").alias("mx")
    )
    return per_user.groupBy().agg(
        F.count("*").cast("long").alias("n_users"),
        F.expr(
            "cast(floor(4 * percentile(mx, 0.25) + 0.5) as bigint)"
        ).alias("q1_x4"),
        F.expr(
            "cast(floor(4 * percentile(mx, 0.5) + 0.5) as bigint)"
        ).alias("q2_x4"),
        F.expr(
            "cast(floor(4 * percentile(mx, 0.75) + 0.5) as bigint)"
        ).alias("q3_x4"),
        F.max("mx").cast("long").alias("max_streak"),
        F.expr(
            "cast((2 * 1000000 * sum(if(mx >= 7, 1, 0)) + count(*))"
            " div (2 * count(*)) as bigint)"
        ).alias("share_ge7_micro"),
    )


ORACLE_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id,
         (ts::DATE - DATE '1970-01-01')::BIGINT AS d
  FROM events),
streaks AS (
  SELECT user_id,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d)
           AS island
  FROM days),
lens AS (
  SELECT user_id, count(*)::BIGINT AS len
  FROM streaks GROUP BY user_id, island),
per_user AS (
  SELECT user_id, max(len)::BIGINT AS mx FROM lens GROUP BY 1)
SELECT count(*)::BIGINT AS n_users,
       floor(4 * quantile_cont(mx, 0.25) + 0.5)::BIGINT AS q1_x4,
       floor(4 * quantile_cont(mx, 0.5) + 0.5)::BIGINT AS q2_x4,
       floor(4 * quantile_cont(mx, 0.75) + 0.5)::BIGINT AS q3_x4,
       max(mx)::BIGINT AS max_streak,
       ((2 * 1000000 * sum(CASE WHEN mx >= 7 THEN 1 ELSE 0 END)
         + count(*)) // (2 * count(*)))::BIGINT AS share_ge7_micro
FROM per_user
"""

BANK_QUERIES["events_user_streak_quantiles"] = events_user_streak_quantiles
BANK_ORACLES["events_user_streak_quantiles"] = ORACLE_STREAKS


# ------------------------------------- doc-length Tukey fences per source

def docs_length_iqr_outliers(spark, sf):
    """Tukey-fence outlier counts of document length (n_chars) per
    source — the corpus-intake anomaly screen mirroring the unit-price
    fences (a source whose low fence trips often is shipping stubs/
    truncations; the high side is concatenation artifacts — both are
    dedup/packing hazards upstream).

    Exactness: n_chars is already an exact integer; ×4-exact
    quartiles; the fences are exact ×8 integer compares."""
    d = T(spark, sf, "documents").select(
        "source", F.col("n_chars").alias("u")
    )
    q = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr(
            "cast(floor(4 * percentile(u, 0.25) + 0.5) as bigint)"
        ).alias("q1_x4"),
        F.expr(
            "cast(floor(4 * percentile(u, 0.75) + 0.5) as bigint)"
        ).alias("q3_x4"),
    )
    f = d.join(F.broadcast(q), "source").select(
        "source", "n_docs", "q1_x4", "q3_x4",
        F.expr(
            "if(8 * u < 2 * q1_x4 - 3 * (q3_x4 - q1_x4), 1, 0)"
        ).alias("lo"),
        F.expr(
            "if(8 * u > 2 * q3_x4 + 3 * (q3_x4 - q1_x4), 1, 0)"
        ).alias("hi"),
    )
    return f.groupBy("source", "n_docs", "q1_x4", "q3_x4").agg(
        F.sum("lo").cast("long").alias("n_low_outliers"),
        F.sum("hi").cast("long").alias("n_high_outliers"),
    )


ORACLE_DOC_LEN_IQR = """
WITH d AS (SELECT source, n_chars::BIGINT AS u FROM documents),
q AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         floor(4 * quantile_cont(u, 0.25) + 0.5)::BIGINT AS q1_x4,
         floor(4 * quantile_cont(u, 0.75) + 0.5)::BIGINT AS q3_x4
  FROM d GROUP BY 1)
SELECT source, n_docs, q1_x4, q3_x4,
       sum(CASE WHEN 8 * u < 2 * q1_x4 - 3 * (q3_x4 - q1_x4)
                THEN 1 ELSE 0 END)::BIGINT AS n_low_outliers,
       sum(CASE WHEN 8 * u > 2 * q3_x4 + 3 * (q3_x4 - q1_x4)
                THEN 1 ELSE 0 END)::BIGINT AS n_high_outliers
FROM d JOIN q USING (source)
GROUP BY source, n_docs, q1_x4, q3_x4
"""

BANK_QUERIES["docs_length_iqr_outliers"] = docs_length_iqr_outliers
BANK_ORACLES["docs_length_iqr_outliers"] = ORACLE_DOC_LEN_IQR


# ------------------------------------- packing fragmentation sweep

PACK_SWEEP_BUDGETS = (256, 512, 1024)


def pack_fragmentation_sweep(spark, sf):
    """Packing-quality sweep over chunk budgets {256, 512, 1024}: per
    (source, budget) — how many documents STRADDLE a chunk boundary
    (each split doc pays an attention-discontinuity cost in training),
    their share, the total chunk count, and the tail padding the
    ragged last chunk of every (source, shard) stream wastes.  The
    decision relation behind choosing the packing budget: bigger
    chunks waste less tail but split more documents.

    Exactness & scale: ONE shard-partitioned cumulative-sum window
    (the proven packing_plan layout — order (content hash, doc_id),
    engine-stable) shared by all three budgets; per-budget flags are
    pure integer div arithmetic on the same cum column."""
    from faconne_spark.functions import phash60, tokens_ws
    from faconne_spark.queries.curation import PACK_SHARDS
    from pyspark.sql import Window as W

    h = phash60("text", "spark")
    base = T(spark, sf, "documents").select(
        "doc_id", "source",
        F.expr(f"pmod({h}, {PACK_SHARDS})").alias("shard"),
        F.expr(
            f"cast(size({tokens_ws('text', 'spark')}) as bigint)"
        ).alias("n_tokens"),
        F.expr(h).alias("_ord"),
    )
    w = (
        W.partitionBy("source", "shard")
        .orderBy("_ord", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = base.withColumn("cum", F.sum("n_tokens").over(w))
    budgets = ", ".join(str(b) for b in PACK_SWEEP_BUDGETS)
    per_doc = cum.selectExpr(
        "source", "shard", "n_tokens", "cum",
        f"explode(array({budgets})) AS budget",
    ).selectExpr(
        "source", "shard", "budget", "n_tokens", "cum",
        "if((cum - n_tokens) div budget < (cum - 1) div budget, 1, 0)"
        " AS split",
    )
    doc_stats = per_doc.groupBy("source", "budget").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("split").cast("long").alias("n_split_docs"),
    )
    shard_tot = per_doc.groupBy("source", "shard", "budget").agg(
        F.max("cum").alias("total")
    )
    shard_stats = shard_tot.groupBy("source", "budget").agg(
        F.expr(
            "cast(sum((total + budget - 1) div budget) as bigint)"
        ).alias("n_chunks"),
        F.expr(
            "cast(sum((total + budget - 1) div budget * budget - total)"
            " as bigint)"
        ).alias("tail_pad_tokens"),
    )
    return doc_stats.join(shard_stats, ["source", "budget"]).selectExpr(
        "source", "cast(budget as bigint) AS budget", "n_docs",
        "n_split_docs",
        "cast((2 * 1000000 * n_split_docs + n_docs) div (2 * n_docs)"
        " as bigint) AS split_share_micro",
        "n_chunks", "tail_pad_tokens",
    )


def _oracle_pack_sweep() -> str:
    from faconne_spark.functions import phash60, tokens_ws
    from faconne_spark.queries.curation import PACK_SHARDS

    budgets = ", ".join(f"({b})" for b in PACK_SWEEP_BUDGETS)
    return f"""
WITH base AS (
  SELECT doc_id, source,
         ({phash60('text', 'duckdb')}) % {PACK_SHARDS} AS shard,
         len({tokens_ws('text', 'duckdb')})::BIGINT AS n_tokens,
         ({phash60('text', 'duckdb')}) AS ord_h
  FROM documents),
c AS (
  SELECT *, sum(n_tokens) OVER (
      PARTITION BY source, shard ORDER BY ord_h, doc_id
      ROWS UNBOUNDED PRECEDING) AS cum
  FROM base),
per_doc AS (
  SELECT source, shard, b.budget, n_tokens, cum,
         CASE WHEN (cum - n_tokens) // b.budget < (cum - 1) // b.budget
              THEN 1 ELSE 0 END AS split
  FROM c CROSS JOIN (VALUES {budgets}) b(budget)),
doc_stats AS (
  SELECT source, budget, count(*)::BIGINT AS n_docs,
         sum(split)::BIGINT AS n_split_docs
  FROM per_doc GROUP BY 1, 2),
shard_tot AS (
  SELECT source, shard, budget, max(cum)::BIGINT AS total
  FROM per_doc GROUP BY 1, 2, 3),
shard_stats AS (
  SELECT source, budget,
         sum((total + budget - 1) // budget)::BIGINT AS n_chunks,
         sum((total + budget - 1) // budget * budget - total)::BIGINT
           AS tail_pad_tokens
  FROM shard_tot GROUP BY 1, 2)
SELECT source, budget::BIGINT AS budget, n_docs, n_split_docs,
       ((2 * 1000000 * n_split_docs + n_docs) // (2 * n_docs))::BIGINT
         AS split_share_micro,
       n_chunks, tail_pad_tokens
FROM doc_stats JOIN shard_stats USING (source, budget)
"""


BANK_QUERIES["pack_fragmentation_sweep"] = pack_fragmentation_sweep
BANK_ORACLES["pack_fragmentation_sweep"] = _oracle_pack_sweep()


# ------------------------------- top correlated embedding-dim pairs

GRAM_TOP_PAIRS = 8
GRAM_DIMS = 64  # embeddings.embedding is FLOAT[64] at every SF (TESTDATA.md)


def embed_gram_top_corr_pairs(spark, sf):
    """Top-8 embedding-dimension pairs by |Pearson correlation| — the
    redundancy readout on the Gramian family (variance concentration
    says how much mass one dim holds; a strongly CORRELATED pair says
    two dims carry one signal, the precursor to PCA truncation and a
    distance-metric distortion in its own right).

    Exactness: per-element micro fixed-point like the Gramian; all
    pair sums are exact DECIMAL; each correlation is one final double
    from exact integers; top-8 picked on the deterministic
    (|r| desc, i, j) total order.  Scale: the pair stage is the
    exploded self-join on vec_id — n·d(d−1)/2 products, one shuffle
    by vec_id, bounded output (d² cells)."""
    e = T(spark, sf, "embeddings").select(
        "vec_id",
        F.posexplode("embedding").alias("i", "x"),
    ).select(
        "vec_id", "i",
        F.expr("cast(floor(cast(x as double) * 1000000 + 0.5) as bigint)")
        .alias("xm"),
    )
    dims = e.groupBy("i").agg(
        F.count("*").alias("n"),
        F.sum("xm").alias("s"),
        F.expr("sum(cast(xm as decimal(38,0)) * xm)").alias("ssq"),
    )
    pairs = (
        e.select("vec_id", F.col("i").alias("i1"), F.col("xm").alias("x1"))
        .join(
            e.select(
                "vec_id", F.col("i").alias("i2"), F.col("xm").alias("x2")
            ),
            "vec_id",
        )
        .filter("i1 < i2")
        .groupBy("i1", "i2")
        .agg(F.expr("sum(cast(x1 as decimal(38,0)) * x2)").alias("sp"))
    )
    d1 = dims.selectExpr(
        "i AS i1", "n", "s AS s1", "ssq AS ss1"
    )
    d2 = dims.selectExpr("i AS i2", "s AS s2", "ssq AS ss2")
    j = pairs.join(F.broadcast(d1), "i1").join(F.broadcast(d2), "i2")
    num = (
        "cast(cast(n as decimal(38,0)) * sp"
        " - cast(s1 as decimal(38,0)) * s2 as double)"
    )
    v1 = (
        "cast(cast(n as decimal(38,0)) * ss1"
        " - cast(s1 as decimal(38,0)) * s1 as double)"
    )
    v2 = (
        "cast(cast(n as decimal(38,0)) * ss2"
        " - cast(s2 as decimal(38,0)) * s2 as double)"
    )
    r = f"({num} / (sqrt({v1}) * sqrt({v2})))"
    scored = j.selectExpr(
        "cast(i1 as int) AS i1", "cast(i2 as int) AS i2",
        f"case when {v1} > 0 and {v2} > 0 then round({r}, 6) + 0.0 end"
        " AS corr_r",
    )
    return (
        scored.orderBy(
            F.abs(F.col("corr_r")).desc(), F.col("i1"), F.col("i2")
        )
        .limit(GRAM_TOP_PAIRS)
    )


def _oracle_gram_top_pairs() -> str:
    num = "(n::DECIMAL(38,0) * sp - s1::DECIMAL(38,0) * s2)::DOUBLE"
    v1 = "(n::DECIMAL(38,0) * ss1 - s1::DECIMAL(38,0) * s1)::DOUBLE"
    v2 = "(n::DECIMAL(38,0) * ss2 - s2::DECIMAL(38,0) * s2)::DOUBLE"
    r = f"({num} / (sqrt({v1}) * sqrt({v2})))"
    return f"""
WITH e AS (
  SELECT vec_id, g.d - 1 AS i,
         floor(embedding[g.d]::DOUBLE * 1000000 + 0.5)::BIGINT AS xm
  FROM embeddings, generate_series(1, {GRAM_DIMS}) g(d)),
dims AS (
  SELECT i, count(*)::BIGINT AS n, sum(xm)::BIGINT AS s,
         sum(xm::DECIMAL(38,0) * xm) AS ssq
  FROM e GROUP BY 1),
pairs AS (
  SELECT a.i AS i1, b.i AS i2,
         sum(a.xm::DECIMAL(38,0) * b.xm) AS sp
  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i < b.i
  GROUP BY 1, 2),
j AS (
  SELECT i1, i2, sp, d1.n AS n, d1.s AS s1, d1.ssq AS ss1,
         d2.s AS s2, d2.ssq AS ss2
  FROM pairs
  JOIN dims d1 ON d1.i = i1
  JOIN dims d2 ON d2.i = i2)
SELECT i1::INTEGER AS i1, i2::INTEGER AS i2,
       CASE WHEN {v1} > 0 AND {v2} > 0
            THEN round({r}, 6) + 0.0 END AS corr_r
FROM j
ORDER BY abs(CASE WHEN {v1} > 0 AND {v2} > 0
             THEN round({r}, 6) + 0.0 END) DESC, i1, i2
LIMIT {GRAM_TOP_PAIRS}
"""


BANK_QUERIES["embed_gram_top_corr_pairs"] = embed_gram_top_corr_pairs
BANK_ORACLES["embed_gram_top_corr_pairs"] = _oracle_gram_top_pairs()


# --------------------------------- metric-learning margin on the panel

MARGIN_PANEL_N = 400


def embed_panel_margin_stats(spark, sf):
    """Nearest-positive vs nearest-negative cosine MARGIN on the fixed
    400-row sample_panel with labels: for each anchor, margin =
    max cosine to a SAME-label point − max cosine to an OTHER-label
    point — the metric-learning health readout beside label
    consistency (which reads k-NN purity; the margin reads by HOW
    MUCH the classes separate, and its violation share is the triplet
    loss's active-set size).

    Exactness: cosines micro-round once per pair (signed); per-anchor
    maxima are exact integer maxes; the mean margin and violation
    share are half-up divisions of exact integers.  Scale: panel² —
    bounded constant work (sample_panel's guarantee)."""
    from faconne_spark.functions import dot_expr
    from faconne_spark.operators.relational import sample_panel

    emb = T(spark, sf, "embeddings").select(
        "vec_id", "label", "embedding",
        F.expr(dot_expr("embedding", "embedding", "spark", dim=64)).alias("nn"),
    )
    panel = sample_panel(emb, "vec_id", MARGIN_PANEL_N, salt="margin")
    a = panel.selectExpr(
        "vec_id AS ia", "label AS la", "embedding AS ea", "nn AS na"
    )
    b = panel.selectExpr(
        "vec_id AS ib", "label AS lb", "embedding AS eb", "nn AS nb"
    )
    pairs = (
        a.join(F.broadcast(b), F.col("ia") != F.col("ib"))
        .filter("na > 0 and nb > 0")
        .select(
            "ia", "la", "lb",
            F.expr(
                "cast(round(("
                + dot_expr("ea", "eb", "spark", dim=64)
                + ") / (sqrt(na) * sqrt(nb)) * 1000000, 0) as bigint)"
            ).alias("cm"),
        )
    )
    anchors = pairs.groupBy("ia").agg(
        F.max(F.expr("case when la = lb then cm end")).alias("pos"),
        F.max(F.expr("case when la != lb then cm end")).alias("neg"),
    ).filter("pos is not null and neg is not null")
    return anchors.groupBy().agg(
        F.count("*").cast("long").alias("n_anchors"),
        F.sum(F.expr("pos - neg")).cast("long").alias("sum_margin_micro"),
        F.min(F.expr("pos - neg")).cast("long").alias("min_margin_micro"),
        F.sum(F.expr("if(pos < neg, 1, 0)")).cast("long").alias(
            "n_violations"
        ),
        F.expr(
            "cast((2 * 1000000 * sum(if(pos < neg, 1, 0)) + count(*))"
            " div (2 * count(*)) as bigint)"
        ).alias("violation_share_micro"),
    )


def _oracle_margin_stats() -> str:
    from faconne_spark.functions import dot_expr
    from faconne_spark.operators.relational import sample_panel_sql

    panel = sample_panel_sql(
        "vec_id", MARGIN_PANEL_N, salt="margin", from_sql="embeddings"
    )
    dot = dot_expr("a.embedding", "b.embedding", "duckdb")
    nrm = dot_expr("embedding", "embedding", "duckdb")
    return f"""
WITH panel AS MATERIALIZED (
  SELECT vec_id, label, embedding, ({nrm}) AS nn FROM ({panel})),
pairs AS (
  SELECT a.vec_id AS ia, a.label AS la, b.label AS lb,
         round(({dot}) / (sqrt(a.nn) * sqrt(b.nn)) * 1000000,
               0)::BIGINT AS cm
  FROM panel a JOIN panel b
    ON a.vec_id != b.vec_id AND a.nn > 0 AND b.nn > 0),
anchors AS (
  SELECT ia,
         max(CASE WHEN la = lb THEN cm END) AS pos,
         max(CASE WHEN la != lb THEN cm END) AS neg
  FROM pairs GROUP BY 1
  HAVING max(CASE WHEN la = lb THEN cm END) IS NOT NULL
     AND max(CASE WHEN la != lb THEN cm END) IS NOT NULL)
SELECT count(*)::BIGINT AS n_anchors,
       sum(pos - neg)::BIGINT AS sum_margin_micro,
       min(pos - neg)::BIGINT AS min_margin_micro,
       sum(CASE WHEN pos < neg THEN 1 ELSE 0 END)::BIGINT AS n_violations,
       ((2 * 1000000 * sum(CASE WHEN pos < neg THEN 1 ELSE 0 END)
         + count(*)) // (2 * count(*)))::BIGINT
         AS violation_share_micro
FROM anchors
"""


BANK_QUERIES["embed_panel_margin_stats"] = embed_panel_margin_stats
BANK_ORACLES["embed_panel_margin_stats"] = _oracle_margin_stats()


# ----------------------------- char trigram conditional entropy

def docs_char_trigram_cond_entropy(spark, sf):
    """Per-language conditional entropy H(c₃ | c₁c₂) over the
    lowercased character stream, exact integer micro-nats — the
    order-2 rung of the entropy-rate ladder (marginal H, H(c₂|c₁),
    now H(c₃|c₁c₂): natural text keeps dropping as context grows;
    templated/generated text collapses early, so the LADDER SHAPE is
    the signal, not any single value).  Same integer discipline as
    the bigram key: per-cell ln micro-rounds BEFORE the count
    multiply.

    Scale: trigram explode is map-only and linear in corpus chars;
    everything after the (lang, c1, c2, c3) groupBy runs on the
    bounded alphabet³ relation."""
    chars = "filter(split(lower(text), ''), x -> x != '')"
    tris = (
        "zip_with(zip_with(slice(cs, 1, size(cs) - 2),"
        " slice(cs, 2, size(cs) - 2),"
        " (a, b) -> struct(a as c1, b as c2)),"
        " slice(cs, 3, size(cs) - 2),"
        " (p, c) -> struct(p.c1 as c1, p.c2 as c2, c as c3))"
    )
    cells3 = (
        T(spark, sf, "documents")
        .select("lang", F.expr(chars).alias("cs"))
        .filter(F.expr("size(cs) >= 3"))
        .select("lang", F.explode(F.expr(tris)).alias("t"))
        .groupBy(
            "lang",
            F.col("t.c1").alias("c1"),
            F.col("t.c2").alias("c2"),
            F.col("t.c3").alias("c3"),
        )
        .agg(F.count("*").alias("n_stu"))
    )
    ctx = cells3.groupBy("lang", "c1", "c2").agg(
        F.sum("n_stu").alias("n_st")
    )
    cells = cells3.join(ctx, ["lang", "c1", "c2"]).withColumn(
        "__l",
        F.expr(
            "cast(round(ln(cast(n_stu as double) / n_st) * 1000000, 0)"
            " as bigint)"
        ),
    )
    return cells.groupBy("lang").agg(
        F.sum("n_stu").alias("n_trigrams"),
        F.count("*").alias("n_cells"),
        (-F.sum(F.col("n_stu") * F.col("__l"))).alias("h_micro"),
    )


ORACLE_CHAR_TRIGRAM_H = """
WITH cs AS (
  SELECT lang, string_split(lower(text), '') AS c FROM documents),
tris AS (
  SELECT lang, t.c1 AS c1, t.c2 AS c2, t.c3 AS c3,
         count(*)::BIGINT AS n_stu
  FROM (
    SELECT lang,
           unnest(list_transform(range(1, len(c) - 1),
                  i -> {'c1': c[i], 'c2': c[i + 1], 'c3': c[i + 2]})) AS t
    FROM cs WHERE len(c) >= 3)
  GROUP BY 1, 2, 3, 4),
ctx AS (
  SELECT lang, c1, c2, sum(n_stu)::BIGINT AS n_st
  FROM tris GROUP BY 1, 2, 3),
cells AS (
  SELECT t.lang, t.n_stu,
         round(ln(t.n_stu::DOUBLE / x.n_st) * 1000000, 0)::BIGINT AS l
  FROM tris t JOIN ctx x
    ON x.lang = t.lang AND x.c1 = t.c1 AND x.c2 = t.c2)
SELECT lang, sum(n_stu)::BIGINT AS n_trigrams,
       count(*)::BIGINT AS n_cells,
       (-sum(n_stu * l))::BIGINT AS h_micro
FROM cells GROUP BY lang
"""

BANK_QUERIES["docs_char_trigram_cond_entropy"] = (
    docs_char_trigram_cond_entropy
)
BANK_ORACLES["docs_char_trigram_cond_entropy"] = ORACLE_CHAR_TRIGRAM_H


# ------------------------------ Cochran–Armitage return-rate trend

def lineitem_monthly_return_trend_ca(spark, sf):
    """Cochran–Armitage trend test of the RETURN rate across ship
    months (scores = month index): is the share of returned lines
    drifting monotonically over time?  The binomial-trend member of
    the trend family (Mann–Kendall reads a numeric series; CA reads a
    RATE against ordered groups with one df — the classic
    degradation-drift test).

    Exactness: z is assembled from five exact integer sums —
    z = (N·Σsr − R·Σsn)·√N ⁄ √(R(N−R)(N·Σns² − (Σsn)²)) — with ONE
    DECIMAL→double cast per factor and no intermediate rounding."""
    li = T(spark, sf, "lineitem").selectExpr(
        "cast(year(l_shipdate) * 12 + month(l_shipdate) as bigint) AS m",
        "if(l_returnflag = 'R', 1, 0) AS r",
    )
    base = li.groupBy("m").agg(
        F.count("*").alias("n"),
        F.sum("r").alias("rr"),
    )
    lo = base.groupBy().agg(F.min("m").alias("m0"))
    g = base.crossJoin(F.broadcast(lo)).selectExpr(
        "cast(m - m0 as bigint) AS s", "n", "rr"
    )
    agg = g.groupBy().agg(
        F.sum("n").alias("nt"),
        F.sum("rr").alias("rt"),
        F.expr("sum(cast(s as decimal(38,0)) * rr)").alias("sr"),
        F.expr("sum(cast(s as decimal(38,0)) * n)").alias("sn"),
        F.expr("sum(cast(s as decimal(38,0)) * s * n)").alias("sns2"),
        F.count("*").alias("n_months"),
    )
    num = (
        "(cast(nt as decimal(38,0)) * sr"
        " - cast(rt as decimal(38,0)) * sn)"
    )
    den = (
        "(cast(rt as decimal(38,0)) * (nt - rt)"
        " * (cast(nt as decimal(38,0)) * sns2 - sn * sn))"
    )
    return agg.selectExpr(
        "cast(nt as bigint) AS n_lines",
        "cast(rt as bigint) AS n_returned",
        "cast(n_months as bigint) AS n_months",
        f"case when rt > 0 and rt < nt and {den} > 0 then"
        f" round(cast({num} as double) * sqrt(cast(nt as double))"
        f" / sqrt(cast({den} as double)), 6) + 0.0 end AS ca_z",
    )


ORACLE_CA_TREND = """
WITH li AS (
  SELECT (year(l_shipdate) * 12 + month(l_shipdate))::BIGINT AS m,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
  FROM lineitem),
base AS (
  SELECT m, count(*)::BIGINT AS n, sum(r)::BIGINT AS rr
  FROM li GROUP BY 1),
g AS (
  SELECT (m - (SELECT min(m) FROM base))::BIGINT AS s, n, rr
  FROM base),
agg AS (
  SELECT sum(n)::BIGINT AS nt, sum(rr)::BIGINT AS rt,
         sum(s::DECIMAL(38,0) * rr) AS sr,
         sum(s::DECIMAL(38,0) * n) AS sn,
         sum(s::DECIMAL(38,0) * s * n) AS sns2,
         count(*)::BIGINT AS n_months
  FROM g)
SELECT nt AS n_lines, rt AS n_returned, n_months,
       CASE WHEN rt > 0 AND rt < nt
              AND (rt::DECIMAL(38,0) * (nt - rt)
                   * (nt::DECIMAL(38,0) * sns2 - sn * sn)) > 0
       THEN round((nt::DECIMAL(38,0) * sr
                   - rt::DECIMAL(38,0) * sn)::DOUBLE
                  * sqrt(nt::DOUBLE)
                  / sqrt((rt::DECIMAL(38,0) * (nt - rt)
                          * (nt::DECIMAL(38,0) * sns2
                             - sn * sn))::DOUBLE), 6) + 0.0
       END AS ca_z
FROM agg
"""

BANK_QUERIES["lineitem_monthly_return_trend_ca"] = (
    lineitem_monthly_return_trend_ca
)
BANK_ORACLES["lineitem_monthly_return_trend_ca"] = ORACLE_CA_TREND


# ---------------------------- source doc-length KS drift matrix

LEN_KS_LO, LEN_KS_WIDTH, LEN_KS_BINS = 0.0, 100.0, 64


def docs_source_length_ks_matrix(spark, sf):
    """Pairwise two-sample KS between every two sources' document
    LENGTH distributions on a shared fixed bin grid — the
    mixture-planning matrix on the docs side (the events KS matrix
    reads value drift; this reads which sources are LENGTH-
    interchangeable, the first thing packing and curriculum mixing
    care about).

    Exactness: per-(source, bin) counts exact; max gap is an exact
    BIGINT cross-product max; D one final double.  Scale: one docs
    pass to the sources × 64 grid; the pair frame is ≤ sources² × 64."""
    from pyspark.sql import Window as W

    from faconne_spark.operators.evalstats import ks_binned

    binned = ks_binned(
        T(spark, sf, "documents"), "source", "n_chars",
        LEN_KS_LO, LEN_KS_WIDTH, LEN_KS_BINS,
    )
    grid = (
        binned.select("grp").distinct()
        .crossJoin(
            F.broadcast(
                binned.sparkSession.range(LEN_KS_BINS).selectExpr(
                    "cast(id as int) AS bin"
                )
            )
        )
    )
    cells = (
        grid.join(binned, ["grp", "bin"], "left")
        .select(
            "grp", "bin",
            F.coalesce("n_gb", F.lit(0)).cast("long").alias("c"),
        )
    )
    w = W.partitionBy("grp").orderBy("bin").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = cells.select(
        "grp", "bin",
        F.sum("c").over(w).alias("cc"),
        F.sum("c").over(W.partitionBy("grp")).alias("n"),
    )
    a = cum.select(
        F.col("grp").alias("source_a"), "bin",
        F.col("cc").alias("ca"), F.col("n").alias("na"),
    )
    b = cum.select(
        F.col("grp").alias("source_b"), "bin",
        F.col("cc").alias("cb"), F.col("n").alias("nb"),
    )
    pairs = a.join(b, "bin").filter(
        F.col("source_a") < F.col("source_b")
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
            F.max(
                F.expr(
                    "abs(cast(ca as decimal(38,0)) * nb"
                    " - cast(cb as decimal(38,0)) * na)"
                )
            ).alias("gap"),
        )
        .selectExpr(
            "source_a", "source_b", "n_a", "n_b",
            "round(cast(gap as double)"
            " / (cast(n_a as double) * cast(n_b as double)), 6) + 0.0"
            " AS ks_d",
        )
    )


ORACLE_LEN_KS_MATRIX = f"""
WITH binned AS (
  SELECT source AS grp,
         least(greatest(floor((n_chars - {LEN_KS_LO!r})
           / {LEN_KS_WIDTH!r}), 0), {LEN_KS_BINS - 1})::INT AS bin,
         count(*)::BIGINT AS c
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
grid AS (
  SELECT grp, r.range::INT AS bin
  FROM (SELECT DISTINCT grp FROM binned), range(0, {LEN_KS_BINS}) r),
cells AS (
  SELECT grid.grp, grid.bin, coalesce(binned.c, 0)::BIGINT AS c
  FROM grid LEFT JOIN binned USING (grp, bin)),
cum AS (
  SELECT grp, bin,
         sum(c) OVER (PARTITION BY grp ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS cc,
         sum(c) OVER (PARTITION BY grp)::BIGINT AS n
  FROM cells)
SELECT a.grp AS source_a, b.grp AS source_b,
       max(a.n)::BIGINT AS n_a, max(b.n)::BIGINT AS n_b,
       round(max(abs(a.cc::DECIMAL(38,0) * b.n
                     - b.cc::DECIMAL(38,0) * a.n))::DOUBLE
             / (max(a.n)::DOUBLE * max(b.n)::DOUBLE), 6) + 0.0 AS ks_d
FROM cum a JOIN cum b ON a.bin = b.bin AND a.grp < b.grp
GROUP BY a.grp, b.grp
"""

BANK_QUERIES["docs_source_length_ks_matrix"] = docs_source_length_ks_matrix
BANK_ORACLES["docs_source_length_ks_matrix"] = ORACLE_LEN_KS_MATRIX


# ------------------------ Theil between/within decomposition by DOW

def events_value_theil_decomp_dow(spark, sf):
    """Theil T decomposition of event-value inequality across day-of-
    week groups: T_total = T_between + T_within — the property the
    Theil index was CHOSEN for (Gini does not decompose additively):
    how much of ticket-value inequality is explained by WHICH DAY the
    ticket lands on (between) vs within-day spread?

    Exactness: T_total follows the per-cell ln rule on the distinct-
    value relation; T_between micro-rounds one ln of the exact ratio
    n·S_g/(S·n_g) per day-of-week group; both numerators integer-sum
    in DECIMAL, divide half-up by S (HUGEINT-cast in the oracle — the
    lang-mix lesson); t_within is their exact integer difference."""
    ev = T(spark, sf, "events").select(
        F.expr(
            "cast(datediff(to_date(ts), DATE'1970-01-01') % 7 as int)"
        ).alias("g"),
        F.expr("cast(floor(value * 1000000 + 0.5) as bigint)").alias("v"),
    ).filter("v is not null")
    tot = ev.groupBy().agg(
        F.sum(F.expr("cast(1 as bigint)")).alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
    )
    # T_total: per distinct value
    dist = ev.groupBy("v").agg(F.count("*").alias("c"))
    t_tot_terms = dist.crossJoin(F.broadcast(tot)).filter("v > 0").select(
        "n", "sv",
        F.expr(
            "cast(c as decimal(38,0)) * cast(v as decimal(38,0))"
            " * cast(round(ln(cast(n as double) * v / cast(sv as double))"
            " * 1000000, 0) as bigint)"
        ).alias("t"),
    )
    t_total = t_tot_terms.groupBy().agg(
        F.max("n").alias("n"),
        F.max("sv").alias("sv"),
        F.sum("t").alias("tt"),
    ).selectExpr(
        "n", "sv",
        "cast((2 * tt + sv) div (2 * sv) as bigint) AS t_total_micro",
    )
    # T_between: per day-of-week group
    grp = ev.groupBy("g").agg(
        F.count("*").alias("ng"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sg"),
    )
    t_b_terms = grp.crossJoin(F.broadcast(tot)).filter("sg > 0").select(
        "sv",
        F.expr(
            "cast(sg as decimal(38,0))"
            " * cast(round(ln(cast(n as double) * cast(sg as double)"
            " / (cast(sv as double) * ng)) * 1000000, 0) as bigint)"
        ).alias("t"),
    )
    t_between = t_b_terms.groupBy().agg(
        F.max("sv").alias("sv2"),
        F.sum("t").alias("tb"),
    ).selectExpr(
        "cast((2 * tb + sv2) div (2 * sv2) as bigint) AS t_between_micro"
    )
    return t_total.crossJoin(F.broadcast(t_between)).selectExpr(
        "cast(n as bigint) AS n_events",
        "t_total_micro",
        "t_between_micro",
        "t_total_micro - t_between_micro AS t_within_micro",
    )


ORACLE_THEIL_DECOMP = """
WITH ev AS (
  SELECT ((ts::DATE - DATE '1970-01-01') % 7)::INT AS g,
         floor(value * 1000000 + 0.5)::BIGINT AS v
  FROM events WHERE value IS NOT NULL),
tot AS (
  SELECT count(*)::BIGINT AS n, sum(v::DECIMAL(38,0)) AS sv FROM ev),
dist AS (SELECT v, count(*)::BIGINT AS c FROM ev GROUP BY 1),
t_tot AS (
  SELECT max(n)::BIGINT AS n, max(sv) AS sv,
         ((2 * sum(c::DECIMAL(38,0) * v::DECIMAL(38,0)
             * round(ln(n::DOUBLE * v / sv::DOUBLE)
                     * 1000000, 0)::BIGINT)::HUGEINT
           + max(sv)::HUGEINT)
          // (2 * max(sv)::HUGEINT))::BIGINT AS t_total_micro
  FROM dist CROSS JOIN tot WHERE v > 0),
grp AS (
  SELECT g, count(*)::BIGINT AS ng, sum(v::DECIMAL(38,0)) AS sg
  FROM ev GROUP BY 1),
t_btw AS (
  SELECT ((2 * sum(sg::DECIMAL(38,0)
             * round(ln(n::DOUBLE * sg::DOUBLE / (sv::DOUBLE * ng))
                     * 1000000, 0)::BIGINT)::HUGEINT
           + max(sv)::HUGEINT)
          // (2 * max(sv)::HUGEINT))::BIGINT AS t_between_micro
  FROM grp CROSS JOIN tot WHERE sg > 0)
SELECT n AS n_events, t_total_micro, t_between_micro,
       (t_total_micro - t_between_micro)::BIGINT AS t_within_micro
FROM t_tot CROSS JOIN t_btw
"""

BANK_QUERIES["events_value_theil_decomp_dow"] = events_value_theil_decomp_dow
BANK_ORACLES["events_value_theil_decomp_dow"] = ORACLE_THEIL_DECOMP


# --------------------------- order-count dispersion incl. zero-inflation

def customer_order_count_dispersion(spark, sf):
    """Variance-to-mean ratio of orders-per-customer INCLUDING the
    customers who never ordered (left join; every per-order rollup
    silently drops them), plus the zero share with Wilson bounds —
    the overdispersion + zero-inflation panel that decides between
    Poisson/NB/ZINB models of purchase frequency.  Fifth
    wilson_bounds_sql consumer.

    Exactness: counts exact; VMR = (n·Σc² − (Σc)²)/((n−1)·Σc) from
    exact DECIMAL sums, one final double."""
    from faconne_spark.operators.relational import wilson_bounds_sql

    oc = T(spark, sf, "orders").groupBy(
        F.col("o_custkey").alias("c_custkey")
    ).agg(F.count("*").alias("c"))
    cc = (
        T(spark, sf, "customer")
        .select("c_custkey")
        .join(oc, "c_custkey", "left")
        .selectExpr("coalesce(c, 0) AS c")
    )
    agg = cc.groupBy().agg(
        F.count("*").alias("n"),
        F.sum("c").alias("sc"),
        F.expr("sum(cast(c as decimal(38,0)) * c)").alias("sc2"),
        F.sum(F.expr("if(c = 0, 1, 0)")).alias("zeros"),
    )
    vmr = (
        "(cast(cast(n as decimal(38,0)) * sc2"
        " - cast(sc as decimal(38,0)) * sc as double)"
        " / (cast(n - 1 as double) * sc))"
    )
    lo, hi = wilson_bounds_sql("zeros", "n")
    return agg.selectExpr(
        "cast(n as bigint) AS n_customers",
        "cast(sc as bigint) AS n_orders",
        "cast(zeros as bigint) AS n_zero_customers",
        f"case when n > 1 and sc > 0 then round({vmr}, 6) + 0.0 end"
        " AS vmr",
        f"round({lo}, 6) + 0.0 AS zero_share_lo",
        f"round({hi}, 6) + 0.0 AS zero_share_hi",
    )


def _oracle_order_dispersion() -> str:
    from faconne_spark.operators.relational import wilson_bounds_sql

    lo, hi = wilson_bounds_sql("zeros", "n")
    return f"""
WITH oc AS (
  SELECT o_custkey AS c_custkey, count(*)::BIGINT AS c
  FROM orders GROUP BY 1),
cc AS (
  SELECT coalesce(c, 0)::BIGINT AS c
  FROM customer LEFT JOIN oc USING (c_custkey)),
agg AS (
  SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS sc,
         sum(c::DECIMAL(38,0) * c) AS sc2,
         sum(CASE WHEN c = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros
  FROM cc)
SELECT n AS n_customers, sc AS n_orders, zeros AS n_zero_customers,
       CASE WHEN n > 1 AND sc > 0 THEN
         round((n::DECIMAL(38,0) * sc2
                - sc::DECIMAL(38,0) * sc)::DOUBLE
               / ((n - 1)::DOUBLE * sc), 6) + 0.0 END AS vmr,
       round({lo}, 6) + 0.0 AS zero_share_lo,
       round({hi}, 6) + 0.0 AS zero_share_hi
FROM agg
"""


BANK_QUERIES["customer_order_count_dispersion"] = (
    customer_order_count_dispersion
)
BANK_ORACLES["customer_order_count_dispersion"] = _oracle_order_dispersion()


# ----------------------------------- embedding-norm ICC across labels

def embed_norm_label_icc(spark, sf):
    """ICC(1) of the embedding L2 NORM across labels (unbalanced k₀)
    — does the label explain any of the norm variance?  Third ICC
    consumer (customer value, brand price, now embedding geometry):
    the norm-vs-label ANOVA gives the F; ICC gives the share, which
    is what calibration work actually budgets against.

    Exactness: each vector's norm micro-rounds ONCE (sqrt of the
    exact micro² dot, deterministic); between/within terms follow the
    ANOVA integer-term discipline."""
    from faconne_spark.functions import dot_expr

    e = T(spark, sf, "embeddings").select(
        "label",
        F.expr(
            "cast(round(sqrt("
            + dot_expr("embedding", "embedding", "spark", dim=64)
            + ") * 1000000, 0) as bigint)"
        ).alias("v"),
    )
    g = e.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(
            F.col("v").cast("decimal(38,0)")
            * F.col("v").cast("decimal(38,0)")
        ).alias("ss"),
    )
    tot = g.agg(
        F.sum("n").alias("nt"),
        F.sum("s").alias("st"),
        F.count("*").alias("j"),
        F.sum(F.expr("n * n")).alias("sn2"),
    )
    bnum = (
        "(cast(s as decimal(38,0)) * nt - cast(st as decimal(38,0)) * n)"
    )
    bden = "(cast(n as decimal(38,0)) * nt * nt * 1000000)"
    wnum = (
        "(cast(ss as decimal(38,0)) * n - cast(s as decimal(38,0)) * s)"
    )
    wden = "(cast(n as decimal(38,0)) * 1000000)"
    terms = g.crossJoin(F.broadcast(tot)).selectExpr(
        "j", "nt", "sn2",
        f"cast((2 * {bnum} * {bnum} + {bden}) div (2 * {bden})"
        " as bigint) AS b",
        f"cast((2 * {wnum} + {wden}) div (2 * {wden}) as bigint) AS w",
    )
    msb = "(cast(sum(b) as double) / (max(j) - 1))"
    msw = "(cast(sum(w) as double) / (max(nt) - max(j)))"
    k0 = (
        "((cast(max(nt) as double)"
        " - cast(max(sn2) as double) / max(nt)) / (max(j) - 1))"
    )
    ok = "max(j) >= 2 and max(nt) > max(j) and sum(w) > 0"
    return terms.groupBy().agg(
        F.max("j").cast("long").alias("n_labels"),
        F.max("nt").cast("long").alias("n_vecs"),
        F.expr(f"round({k0}, 6) + 0.0").alias("k0"),
        F.expr(
            f"case when {ok} then round({msb} / {msw}, 6) + 0.0 end"
        ).alias("f_stat"),
        F.expr(
            f"case when {ok} then"
            f" round(({msb} - {msw}) / ({msb} + ({k0} - 1) * {msw}), 6)"
            f" + 0.0 end"
        ).alias("icc1"),
    )


def _oracle_norm_icc() -> str:
    from faconne_spark.functions import dot_expr

    nrm = dot_expr("embedding", "embedding", "duckdb")
    return f"""
WITH e AS (
  SELECT label,
         round(sqrt({nrm}) * 1000000, 0)::BIGINT AS v
  FROM embeddings),
g AS (
  SELECT label, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
         sum(v::DECIMAL(38,0) * v) AS ss
  FROM e GROUP BY 1),
tot AS (
  SELECT sum(n)::BIGINT AS nt, sum(s)::BIGINT AS st,
         count(*)::BIGINT AS j, sum(n * n)::BIGINT AS sn2
  FROM g),
terms AS (
  SELECT j, nt, sn2,
         ((2 * (s::HUGEINT * nt - st::HUGEINT * n)
             * (s::HUGEINT * nt - st::HUGEINT * n)
           + n::HUGEINT * nt * nt * 1000000)
          // (2 * n::HUGEINT * nt * nt * 1000000))::BIGINT AS b,
         ((2 * (ss::HUGEINT * n - s::HUGEINT * s)
           + n::HUGEINT * 1000000)
          // (2 * n::HUGEINT * 1000000))::BIGINT AS w
  FROM g CROSS JOIN tot)
SELECT max(j)::BIGINT AS n_labels, max(nt)::BIGINT AS n_vecs,
       round((max(nt)::DOUBLE - max(sn2)::DOUBLE / max(nt))
             / (max(j) - 1), 6) + 0.0 AS k0,
       CASE WHEN max(j) >= 2 AND max(nt) > max(j) AND sum(w) > 0 THEN
         round((sum(b)::DOUBLE / (max(j) - 1))
               / (sum(w)::DOUBLE / (max(nt) - max(j))), 6) + 0.0 END
         AS f_stat,
       CASE WHEN max(j) >= 2 AND max(nt) > max(j) AND sum(w) > 0 THEN
         round(((sum(b)::DOUBLE / (max(j) - 1))
                - (sum(w)::DOUBLE / (max(nt) - max(j))))
               / ((sum(b)::DOUBLE / (max(j) - 1))
                  + (((max(nt)::DOUBLE - max(sn2)::DOUBLE / max(nt))
                      / (max(j) - 1)) - 1)
                    * (sum(w)::DOUBLE / (max(nt) - max(j)))), 6) + 0.0
       END AS icc1
FROM terms
"""


BANK_QUERIES["embed_norm_label_icc"] = embed_norm_label_icc
BANK_ORACLES["embed_norm_label_icc"] = _oracle_norm_icc()


# ------------------------------------------ daily PACF at lag 2

def events_daily_pacf2(spark, sf):
    """Partial autocorrelation of daily volume at lag 2 via
    Durbin–Levinson: φ₂₂ = (ρ₂ − ρ₁²)/(1 − ρ₁²) — the AR-order probe
    the ACF family can't answer (an AR(1) series has ρ₂ = ρ₁² ≠ 0 but
    φ₂₂ = 0: "is there structure BEYOND yesterday?" is a PACF
    question; it decides between AR(1) and AR(2) forecast baselines).

    Exactness: same exact mean-centering as the Ljung–Box key
    (yₜ = D·xₜ − S); ρ₁/ρ₂ micro-round once each (signed); φ₂₂ is ONE
    double division of exact integer combinations of the two micros."""
    from pyspark.sql import Window as W

    daily = (
        T(spark, sf, "events")
        .groupBy(F.expr("to_date(ts)").alias("d"))
        .agg(F.count("*").alias("c"))
    )
    tot = daily.groupBy().agg(
        F.count("*").alias("nd"), F.sum("c").alias("s")
    )
    y = daily.crossJoin(F.broadcast(tot)).select(
        "d", "nd", F.expr("nd * c - s").alias("y")
    )
    w = W.orderBy("d")
    lagged = y.select(
        "nd",
        F.col("y").cast("decimal(38,0)").alias("y0"),
        F.lag("y", 1).over(w).cast("decimal(38,0)").alias("y1"),
        F.lag("y", 2).over(w).cast("decimal(38,0)").alias("y2"),
    )
    m = lagged.groupBy().agg(
        F.max("nd").alias("n"),
        F.sum(F.expr("y0 * y0")).alias("den"),
        F.sum(F.expr("y0 * y1")).alias("num1"),
        F.sum(F.expr("y0 * y2")).alias("num2"),
    )
    r = m.selectExpr(
        "n",
        "cast(round(cast(num1 as double) / cast(den as double)"
        " * 1000000, 0) as bigint) AS rho1_micro",
        "cast(round(cast(num2 as double) / cast(den as double)"
        " * 1000000, 0) as bigint) AS rho2_micro",
    )
    phi = (
        "(cast(1000000 * rho2_micro - rho1_micro * rho1_micro as double)"
        " / cast(1000000000000 - cast(rho1_micro as decimal(38,0))"
        " * rho1_micro as double))"
    )
    return r.selectExpr(
        "cast(n as bigint) AS n_days",
        "rho1_micro", "rho2_micro",
        f"case when 1000000000000 - cast(rho1_micro as decimal(38,0))"
        f" * rho1_micro != 0 then round({phi}, 6) + 0.0 end AS pacf2",
    )


ORACLE_PACF2 = """
WITH daily AS (
  SELECT ts::DATE AS d, count(*)::BIGINT AS c FROM events GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS nd, sum(c)::BIGINT AS s FROM daily),
y AS (
  SELECT d, nd, (nd * c - s)::BIGINT AS y
  FROM daily CROSS JOIN tot),
lagged AS (
  SELECT nd, y::DECIMAL(38,0) AS y0,
         lag(y, 1) OVER (ORDER BY d)::DECIMAL(38,0) AS y1,
         lag(y, 2) OVER (ORDER BY d)::DECIMAL(38,0) AS y2
  FROM y),
m AS (
  SELECT max(nd)::BIGINT AS n, sum(y0 * y0) AS den,
         sum(y0 * y1) AS num1, sum(y0 * y2) AS num2
  FROM lagged),
r AS (
  SELECT n,
         round(num1::DOUBLE / den::DOUBLE * 1000000, 0)::BIGINT
           AS rho1_micro,
         round(num2::DOUBLE / den::DOUBLE * 1000000, 0)::BIGINT
           AS rho2_micro
  FROM m)
SELECT n AS n_days, rho1_micro, rho2_micro,
       CASE WHEN 1000000000000 - rho1_micro::DECIMAL(38,0) * rho1_micro
                 != 0
       THEN round((1000000 * rho2_micro
                   - rho1_micro * rho1_micro)::DOUBLE
                  / (1000000000000
                     - rho1_micro::DECIMAL(38,0) * rho1_micro)::DOUBLE,
                  6) + 0.0 END AS pacf2
FROM r
"""

BANK_QUERIES["events_daily_pacf2"] = events_daily_pacf2
BANK_ORACLES["events_daily_pacf2"] = ORACLE_PACF2


# ------------------------------------- yearly Gini of order totals

def orders_yearly_gini_trend(spark, sf):
    """Exact Gini of order totals PER ORDER-YEAR plus the OLS slope of
    the Gini sequence — is value inequality between orders widening
    over time?  The temporal lens on the inequality family (the
    static Ginis read one snapshot; curation budgets react to the
    TREND).

    Exactness: per-year Σr·v on the (cents, orderkey) total order is
    tie-order-invariant; gini_micro is an exact half-up integer per
    year ((2A+B) div (2B), HUGEINT in the oracle); the slope over the
    bounded year relation is one double from exact integer OLS
    moments, repeated per row for a single-relation output."""
    from pyspark.sql import Window as W

    o = T(spark, sf, "orders").select(
        F.expr("cast(year(o_orderdate) as bigint)").alias("yr"),
        F.expr(
            "cast(floor(o_totalprice * 100 + 0.5) as bigint)"
        ).alias("v"),
        "o_orderkey",
    )
    r = o.withColumn(
        "r",
        F.row_number()
        .over(W.partitionBy("yr").orderBy("v", "o_orderkey"))
        .cast("long"),
    )
    g = r.groupBy("yr").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
        F.sum(
            F.col("r").cast("decimal(38,0)")
            * F.col("v").cast("decimal(38,0)")
        ).alias("srv"),
    )
    gm = g.selectExpr(
        "yr", "n",
        "cast((2 * (1000000 * (2 * srv - cast(n + 1 as decimal(38,0))"
        " * sv)) + cast(n as decimal(38,0)) * sv)"
        " div (2 * cast(n as decimal(38,0)) * sv) as bigint)"
        " AS gini_micro",
    )
    idx = gm.crossJoin(
        F.broadcast(gm.groupBy().agg(F.min("yr").alias("y0")))
    ).selectExpr("yr", "n", "gini_micro", "cast(yr - y0 as bigint) AS t")
    mom = idx.groupBy().agg(
        F.count("*").alias("k"),
        F.sum("t").alias("st"),
        F.sum(F.expr("t * t")).alias("stt"),
        F.sum(F.expr("cast(t as decimal(38,0)) * gini_micro")).alias("stg"),
        F.sum("gini_micro").alias("sg"),
    )
    slope = (
        "(cast(cast(k as decimal(38,0)) * stg"
        " - cast(st as decimal(38,0)) * sg as double)"
        " / cast(cast(k as decimal(38,0)) * stt"
        " - cast(st as decimal(38,0)) * st as double))"
    )
    sl = mom.selectExpr(
        f"case when k > 1 and cast(k as decimal(38,0)) * stt"
        f" - cast(st as decimal(38,0)) * st != 0 then"
        f" round({slope}, 6) + 0.0 end AS gini_slope_micro_per_year"
    )
    return idx.select("yr", "n", "gini_micro").crossJoin(F.broadcast(sl))


ORACLE_YEARLY_GINI = """
WITH o AS (
  SELECT year(o_orderdate)::BIGINT AS yr,
         floor(o_totalprice * 100 + 0.5)::BIGINT AS v, o_orderkey
  FROM orders),
r AS (
  SELECT yr, v,
         row_number() OVER (PARTITION BY yr ORDER BY v, o_orderkey)
           ::BIGINT AS r
  FROM o),
g AS (
  SELECT yr, count(*)::BIGINT AS n, sum(v::DECIMAL(38,0)) AS sv,
         sum(r::DECIMAL(38,0) * v) AS srv
  FROM r GROUP BY 1),
gm AS (
  SELECT yr, n,
         ((2 * (1000000 * (2 * srv::HUGEINT
                           - (n + 1)::HUGEINT * sv::HUGEINT))
           + n::HUGEINT * sv::HUGEINT)
          // (2 * n::HUGEINT * sv::HUGEINT))::BIGINT AS gini_micro
  FROM g),
idx AS (
  SELECT yr, n, gini_micro,
         (yr - (SELECT min(yr) FROM gm))::BIGINT AS t
  FROM gm),
mom AS (
  SELECT count(*)::BIGINT AS k, sum(t)::BIGINT AS st,
         sum(t * t)::BIGINT AS stt,
         sum(t::DECIMAL(38,0) * gini_micro) AS stg,
         sum(gini_micro)::BIGINT AS sg
  FROM idx),
sl AS (
  SELECT CASE WHEN k > 1 AND k::DECIMAL(38,0) * stt
                   - st::DECIMAL(38,0) * st != 0
         THEN round((k::DECIMAL(38,0) * stg
                     - st::DECIMAL(38,0) * sg)::DOUBLE
                    / (k::DECIMAL(38,0) * stt
                       - st::DECIMAL(38,0) * st)::DOUBLE, 6) + 0.0
         END AS gini_slope_micro_per_year
  FROM mom)
SELECT yr, n, gini_micro, gini_slope_micro_per_year
FROM idx CROSS JOIN sl
"""

BANK_QUERIES["orders_yearly_gini_trend"] = orders_yearly_gini_trend
BANK_ORACLES["orders_yearly_gini_trend"] = ORACLE_YEARLY_GINI


# --------------------------- exponential GoF of inter-event gaps

GAP_KS_EDGES_US = (
    60_000_000, 120_000_000, 300_000_000, 600_000_000,
    1_800_000_000, 3_600_000_000, 7_200_000_000, 14_400_000_000,
    28_800_000_000, 43_200_000_000, 86_400_000_000, 172_800_000_000,
    345_600_000_000, 604_800_000_000,
)


def events_gap_exponential_ks(spark, sf):
    """Binned KS goodness-of-fit of within-user inter-event gaps
    against the fitted Exponential(1/mean) — the memorylessness
    verdict at the µs grain (the geometric GoF reads integer DAY
    gaps; sessionization thresholds and the Weibull shape both hinge
    on whether the µs process is Poisson, and the KS-vs-fitted curve
    is the standard check).  Fixed 14-edge grid from 1 minute to 7
    days.

    Exactness: gaps are exact µs integers ((user, ts, event_id) lag
    order); the mean is a half-up exact integer; each model CDF value
    1 − e^(−edge/mean) micro-rounds ONCE per edge (per-cell rule —
    the first exp consumer, same contract as ln); the KS numerator is
    an exact integer max of |cum·10⁶ − n·F_micro|."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        T(spark, sf, "events")
        .select("user_id", "ts", "event_id")
        .withColumn("prev", F.lag("ts").over(w))
        .filter("prev is not null")
        .selectExpr(
            "cast(unix_micros(ts) - unix_micros(prev) as bigint) AS g"
        )
    )
    cums = [
        F.sum(F.expr(f"if(g <= {e}, 1, 0)")).alias(f"c{i}")
        for i, e in enumerate(GAP_KS_EDGES_US)
    ]
    agg = gaps.groupBy().agg(
        F.count("*").alias("n"), F.sum("g").alias("sg"), *cums
    )
    mean = agg.selectExpr(
        "n", "sg",
        "cast((2 * sg + n) div (2 * n) as bigint) AS mean_us",
        *[f"c{i}" for i in range(len(GAP_KS_EDGES_US))],
    )
    fm = [
        f"cast(round((1 - exp(-(cast({e} as double)"
        f" / cast(mean_us as double)))) * 1000000, 0) as bigint)"
        f" AS f{i}"
        for i, e in enumerate(GAP_KS_EDGES_US)
    ]
    withf = mean.selectExpr(
        "n", "mean_us",
        *[f"c{i}" for i in range(len(GAP_KS_EDGES_US))],
        *fm,
    )
    gaps_abs = ", ".join(
        f"abs(cast(c{i} as decimal(38,0)) * 1000000"
        f" - cast(n as decimal(38,0)) * f{i})"
        for i in range(len(GAP_KS_EDGES_US))
    )
    return withf.selectExpr(
        "cast(n as bigint) AS n_gaps",
        "mean_us",
        f"cast(greatest({gaps_abs}) as bigint) AS d_num",
        f"round(cast(greatest({gaps_abs}) as double)"
        f" / (cast(n as double) * 1000000), 6) + 0.0 AS ks_d",
    )


def _oracle_gap_exp_ks() -> str:
    edges = GAP_KS_EDGES_US
    cums = ",\n         ".join(
        f"sum(CASE WHEN g <= {e} THEN 1 ELSE 0 END)::BIGINT AS c{i}"
        for i, e in enumerate(edges)
    )
    fm = ",\n       ".join(
        f"round((1 - exp(-({e}::DOUBLE / mean_us::DOUBLE)))"
        f" * 1000000, 0)::BIGINT AS f{i}"
        for i, e in enumerate(edges)
    )
    gaps_abs = ", ".join(
        f"abs(c{i}::DECIMAL(38,0) * 1000000"
        f" - n::DECIMAL(38,0) * f{i})"
        for i in range(len(edges))
    )
    return f"""
WITH g0 AS (
  SELECT epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS g
  FROM events),
gaps AS (SELECT g::BIGINT AS g FROM g0 WHERE g IS NOT NULL),
agg AS (
  SELECT count(*)::BIGINT AS n, sum(g)::BIGINT AS sg,
         {cums}
  FROM gaps),
m AS (
  SELECT *, ((2 * sg + n) // (2 * n))::BIGINT AS mean_us FROM agg),
f AS (
  SELECT *,
       {fm}
  FROM m)
SELECT n AS n_gaps, mean_us,
       greatest({gaps_abs})::BIGINT AS d_num,
       round(greatest({gaps_abs})::DOUBLE
             / (n::DOUBLE * 1000000), 6) + 0.0 AS ks_d
FROM f
"""


BANK_QUERIES["events_gap_exponential_ks"] = events_gap_exponential_ks
BANK_ORACLES["events_gap_exponential_ks"] = _oracle_gap_exp_ks()


# ------------------------------------- per-user ticket-value ICC

def events_user_value_icc(spark, sf):
    """ICC(1) of ticket VALUE within users (unbalanced k₀) — do users
    have personal price points, or is every ticket drawn from one
    pool?  Fourth ICC consumer and the first at GROUP-COUNT scale
    (thousands of user groups, not 25 brands): the share of value
    variance the user identity explains is the personalization-
    signal budget.

    Exactness: values exact micro; between/within terms are exact
    half-up integers ((2a+b) div (2b) on DECIMAL products — the
    supplier-ANOVA discipline; products bounded through sf1);
    ICC/k₀/F final doubles."""
    e = (
        T(spark, sf, "events")
        .filter("value is not null")
        .select(
            "user_id",
            F.expr(
                "cast(floor(value * 1000000 + 0.5) as bigint)"
            ).alias("v"),
        )
    )
    g = e.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(
            F.col("v").cast("decimal(38,0)")
            * F.col("v").cast("decimal(38,0)")
        ).alias("ss"),
    )
    tot = g.agg(
        F.sum("n").alias("nt"),
        F.sum("s").alias("st"),
        F.count("*").alias("j"),
        F.sum(F.expr("n * n")).alias("sn2"),
    )
    bnum = (
        "(cast(s as decimal(38,0)) * nt - cast(st as decimal(38,0)) * n)"
    )
    bden = "(cast(n as decimal(38,0)) * nt * nt * 1000000)"
    wnum = (
        "(cast(ss as decimal(38,0)) * n - cast(s as decimal(38,0)) * s)"
    )
    wden = "(cast(n as decimal(38,0)) * 1000000)"
    terms = g.crossJoin(F.broadcast(tot)).selectExpr(
        "j", "nt", "sn2",
        f"cast((2 * {bnum} * {bnum} + {bden}) div (2 * {bden})"
        " as bigint) AS b",
        f"cast((2 * {wnum} + {wden}) div (2 * {wden}) as bigint) AS w",
    )
    msb = "(cast(sum(b) as double) / (max(j) - 1))"
    msw = "(cast(sum(w) as double) / (max(nt) - max(j)))"
    k0 = (
        "((cast(max(nt) as double)"
        " - cast(max(sn2) as double) / max(nt)) / (max(j) - 1))"
    )
    ok = "max(j) >= 2 and max(nt) > max(j) and sum(w) > 0"
    return terms.groupBy().agg(
        F.max("j").cast("long").alias("n_users"),
        F.max("nt").cast("long").alias("n_events"),
        F.expr(f"round({k0}, 6) + 0.0").alias("k0"),
        F.expr(
            f"case when {ok} then round({msb} / {msw}, 6) + 0.0 end"
        ).alias("f_stat"),
        F.expr(
            f"case when {ok} then"
            f" round(({msb} - {msw}) / ({msb} + ({k0} - 1) * {msw}), 6)"
            f" + 0.0 end"
        ).alias("icc1"),
    )


ORACLE_USER_VALUE_ICC = """
WITH e AS (
  SELECT user_id, floor(value * 1000000 + 0.5)::BIGINT AS v
  FROM events WHERE value IS NOT NULL),
g AS (
  SELECT user_id, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
         sum(v::DECIMAL(38,0) * v) AS ss
  FROM e GROUP BY 1),
tot AS (
  SELECT sum(n)::BIGINT AS nt, sum(s)::BIGINT AS st,
         count(*)::BIGINT AS j, sum(n * n)::BIGINT AS sn2
  FROM g),
terms AS (
  SELECT j, nt, sn2,
         ((2 * (s::HUGEINT * nt - st::HUGEINT * n)
             * (s::HUGEINT * nt - st::HUGEINT * n)
           + n::HUGEINT * nt * nt * 1000000)
          // (2 * n::HUGEINT * nt * nt * 1000000))::BIGINT AS b,
         ((2 * (ss::HUGEINT * n - s::HUGEINT * s)
           + n::HUGEINT * 1000000)
          // (2 * n::HUGEINT * 1000000))::BIGINT AS w
  FROM g CROSS JOIN tot)
SELECT max(j)::BIGINT AS n_users, max(nt)::BIGINT AS n_events,
       round((max(nt)::DOUBLE - max(sn2)::DOUBLE / max(nt))
             / (max(j) - 1), 6) + 0.0 AS k0,
       CASE WHEN max(j) >= 2 AND max(nt) > max(j) AND sum(w) > 0 THEN
         round((sum(b)::DOUBLE / (max(j) - 1))
               / (sum(w)::DOUBLE / (max(nt) - max(j))), 6) + 0.0 END
         AS f_stat,
       CASE WHEN max(j) >= 2 AND max(nt) > max(j) AND sum(w) > 0 THEN
         round(((sum(b)::DOUBLE / (max(j) - 1))
                - (sum(w)::DOUBLE / (max(nt) - max(j))))
               / ((sum(b)::DOUBLE / (max(j) - 1))
                  + (((max(nt)::DOUBLE - max(sn2)::DOUBLE / max(nt))
                      / (max(j) - 1)) - 1)
                    * (sum(w)::DOUBLE / (max(nt) - max(j)))), 6) + 0.0
       END AS icc1
FROM terms
"""

BANK_QUERIES["events_user_value_icc"] = events_user_value_icc
BANK_ORACLES["events_user_value_icc"] = ORACLE_USER_VALUE_ICC


# ------------------------- continuation growth: paired / robust / rank

def events_weekend_mcnemar(spark, sf):
    """McNemar test on paired per-user purchase activity, weekend vs
    weekday: each user contributes ONE paired binary observation
    (purchased on a weekend?, purchased on a weekday?), and the test
    reads only the DISCORDANT cells — the paired-proportions family
    member the two-sample weekend keys (KS/CvM/AD/Mood/energy) cannot
    cover, because those treat weekend and weekday events as
    independent samples while this pairs them within user.

    Exactness: cell counts are exact integers; χ² = (b−c)²/(b+c) is
    one final double division.  Scale: one events pass to per-user
    flags (groupBy user), then a 4-cell aggregate."""
    flags = (
        T(spark, sf, "events")
        .filter("event_type = 'purchase'")
        .select(
            "user_id",
            F.expr(
                "cast(datediff(to_date(ts), DATE'1970-01-01') % 7"
                " in (2, 3) as int)"
            ).alias("we"),
        )
        .groupBy("user_id")
        .agg(
            F.max("we").alias("a_we"),
            F.max(F.expr("1 - we")).alias("a_wd"),
        )
    )
    return flags.groupBy().agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.expr("cast(a_we = 1 and a_wd = 1 as int)"))
        .cast("long").alias("n11"),
        F.sum(F.expr("cast(a_we = 1 and a_wd = 0 as int)"))
        .cast("long").alias("n10"),
        F.sum(F.expr("cast(a_we = 0 and a_wd = 1 as int)"))
        .cast("long").alias("n01"),
        F.expr(
            "case when sum(cast(a_we = 1 and a_wd = 0 as int))"
            " + sum(cast(a_we = 0 and a_wd = 1 as int)) > 0 then"
            " round(cast((sum(cast(a_we = 1 and a_wd = 0 as int))"
            " - sum(cast(a_we = 0 and a_wd = 1 as int)))"
            " * (sum(cast(a_we = 1 and a_wd = 0 as int))"
            " - sum(cast(a_we = 0 and a_wd = 1 as int))) as double)"
            " / (sum(cast(a_we = 1 and a_wd = 0 as int))"
            " + sum(cast(a_we = 0 and a_wd = 1 as int))), 6) + 0.0"
            " end"
        ).alias("mcnemar_chi2"),
    )


ORACLE_MCNEMAR = """
WITH flags AS (
  SELECT user_id,
         max((epoch_us(ts) // 86400000000 % 7 IN (2, 3))::INT) AS a_we,
         max((epoch_us(ts) // 86400000000 % 7 NOT IN (2, 3))::INT)
           AS a_wd
  FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT count(*)::BIGINT AS n_users,
       sum((a_we = 1 AND a_wd = 1)::INT)::BIGINT AS n11,
       sum((a_we = 1 AND a_wd = 0)::INT)::BIGINT AS n10,
       sum((a_we = 0 AND a_wd = 1)::INT)::BIGINT AS n01,
       CASE WHEN sum((a_we = 1 AND a_wd = 0)::INT)
                 + sum((a_we = 0 AND a_wd = 1)::INT) > 0 THEN
         round(((sum((a_we = 1 AND a_wd = 0)::INT)
                 - sum((a_we = 0 AND a_wd = 1)::INT))
                * (sum((a_we = 1 AND a_wd = 0)::INT)
                   - sum((a_we = 0 AND a_wd = 1)::INT)))::DOUBLE
               / (sum((a_we = 1 AND a_wd = 0)::INT)
                  + sum((a_we = 0 AND a_wd = 1)::INT)), 6) + 0.0
       END AS mcnemar_chi2
FROM flags
"""

BANK_QUERIES["events_weekend_mcnemar"] = events_weekend_mcnemar
BANK_ORACLES["events_weekend_mcnemar"] = ORACLE_MCNEMAR


def events_daily_chatterjee_xi(spark, sf):
    """Chatterjee's ξ coefficient (Chatterjee 2021, JASA) of daily
    volume AGAINST TIME: ξ(day → count) detects ANY functional
    dependence of volume on the calendar — trend, seasonality, or
    regime structure — where Mann–Kendall only sees monotone trend
    (ξ ≈ 0 for iid noise, → 1 as volume becomes a deterministic
    function of the day).  Ties version: with rᵢ = #{j: cⱼ ≤ cᵢ},
    lᵢ = #{j: cⱼ ≥ cᵢ} in day order, ξ = 1 − n·Σ|rᵢ₊₁ − rᵢ| /
    (2·Σ lᵢ(n − lᵢ)).

    Exactness: ranks come from count-over-RANGE windows (peers
    included — identical semantics both engines), all sums exact
    integers, ONE final division.  The x variable (day) is unique, so
    no x-tie randomization is needed — the estimator is exact.
    Scale: everything runs on the bounded day relation."""
    from pyspark.sql import Window as W

    daily = (
        T(spark, sf, "events")
        .groupBy(F.expr("to_date(ts)").alias("d"))
        .agg(F.count("*").alias("c"))
    )
    ranked = daily.select(
        "d",
        F.count("*").over(
            W.orderBy("c").rangeBetween(W.unboundedPreceding, 0)
        ).alias("r"),
        F.count("*").over(
            W.orderBy(F.col("c").desc())
            .rangeBetween(W.unboundedPreceding, 0)
        ).alias("l"),
    )
    seq = ranked.select(
        "r", "l",
        F.lag("r").over(W.orderBy("d")).alias("rp"),
        F.count("*").over(
            W.orderBy(F.lit(1)).rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n"),
    )
    return seq.groupBy().agg(
        F.max("n").cast("long").alias("n_days"),
        F.sum(F.expr("case when rp is not null then abs(r - rp)"
                     " else 0 end")).cast("long").alias("sum_rank_jumps"),
        F.expr(
            "case when sum(l * (n - l)) > 0 then"
            " round(1.0 - cast(max(n) * sum(case when rp is not null"
            " then abs(r - rp) else 0 end) as double)"
            " / (2.0 * sum(l * (n - l))), 6) + 0.0 end"
        ).alias("xi"),
    )


ORACLE_CHATTERJEE = """
WITH daily AS (
  SELECT ts::DATE AS d, count(*)::BIGINT AS c FROM events GROUP BY 1),
ranked AS (
  SELECT d,
         count(*) OVER (ORDER BY c RANGE BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)::BIGINT AS r,
         count(*) OVER (ORDER BY c DESC RANGE BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW)::BIGINT AS l
  FROM daily),
seq AS (
  SELECT r, l, lag(r) OVER (ORDER BY d) AS rp,
         count(*) OVER ()::BIGINT AS n
  FROM ranked)
SELECT max(n)::BIGINT AS n_days,
       sum(CASE WHEN rp IS NOT NULL THEN abs(r - rp) ELSE 0
           END)::BIGINT AS sum_rank_jumps,
       CASE WHEN sum(l * (n - l)) > 0 THEN
         round(1.0 - (max(n) * sum(CASE WHEN rp IS NOT NULL THEN
               abs(r - rp) ELSE 0 END))::DOUBLE
               / (2.0 * sum(l * (n - l))), 6) + 0.0
       END AS xi
FROM seq
"""

BANK_QUERIES["events_daily_chatterjee_xi"] = events_daily_chatterjee_xi
BANK_ORACLES["events_daily_chatterjee_xi"] = ORACLE_CHATTERJEE


def events_value_jackknife_se(spark, sf):
    """Delete-one-DAY (block) jackknife standard error of the overall
    mean event value — the resampling family's second member beside
    the percentile bootstrap: blocks are calendar days, so the SE is
    honest under within-day dependence that the iid bootstrap key
    understates; Var = (g−1)/g · Σ(θ̂₍ᵢ₎ − θ̄)².

    Exactness: leave-one-out estimates θ̂₍ᵢ₎ = (S−sᵢ)/(N−nᵢ) each
    micro-round ONE exact-integer ratio (per-cell rule, centi input
    units so all magnitudes stay < 2⁵³); deviations scale exactly by
    g (dᵢ = g·tᵢ − T); Σd² is exact; the SE is one final composite.
    Scale: one events pass to per-day (sum, count), the rest is
    day-bounded."""
    daily = (
        T(spark, sf, "events")
        .groupBy(F.expr("to_date(ts)").alias("d"))
        .agg(
            F.sum(
                F.expr("cast(floor(value * 100 + 0.5) as bigint)")
            ).alias("sv"),
            F.count("*").alias("nv"),
        )
    )
    tot = daily.groupBy().agg(
        F.count("*").alias("g"),
        F.sum("sv").alias("s"),
        F.sum("nv").alias("n"),
    )
    loo = daily.crossJoin(F.broadcast(tot)).select(
        "g",
        F.expr(
            "cast(round(cast(s - sv as double) / (n - nv) * 1000000,"
            " 0) as bigint)"
        ).alias("t"),
    )
    dev = loo.groupBy().agg(
        F.max("g").alias("g"),
        F.sum("t").alias("tt"),
        F.sum(F.expr("cast(t as decimal(38,0)) * t")).alias("tq"),
    )
    return dev.selectExpr(
        "cast(g as bigint) AS n_days",
        "round(cast(tt as double) / (g * 1e6) / 100, 6) + 0.0"
        " AS loo_mean",
        "round(sqrt(cast(g * tq - cast(tt as decimal(38,0)) * tt"
        " as double) * (g - 1)) / (cast(g as double) * g) / 1e6 / 100,"
        " 6) + 0.0 AS jackknife_se",
    )


ORACLE_JACKKNIFE = """
WITH daily AS (
  SELECT ts::DATE AS d, sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT
           AS sv, count(*)::BIGINT AS nv
  FROM events GROUP BY 1),
tot AS (
  SELECT count(*)::BIGINT AS g, sum(sv)::BIGINT AS s,
         sum(nv)::BIGINT AS n
  FROM daily),
loo AS (
  SELECT g, round((s - sv)::DOUBLE / (n - nv) * 1000000, 0)::BIGINT AS t
  FROM daily, tot),
dev AS (
  SELECT max(g)::BIGINT AS g, sum(t)::BIGINT AS tt,
         sum(t::HUGEINT * t)::HUGEINT AS tq
  FROM loo)
SELECT g AS n_days,
       round(tt::DOUBLE / (g * 1e6) / 100, 6) + 0.0 AS loo_mean,
       round(sqrt((g * tq - tt::HUGEINT * tt)::DOUBLE * (g - 1))
             / (g::DOUBLE * g) / 1e6 / 100, 6) + 0.0 AS jackknife_se
FROM dev
"""

BANK_QUERIES["events_value_jackknife_se"] = events_value_jackknife_se
BANK_ORACLES["events_value_jackknife_se"] = ORACLE_JACKKNIFE


def lineitem_qty_price_gini_correlation(spark, sf):
    """Schechtman–Yitzhaki Gini correlations between quantity and
    extended price: Γ(x,y) = cov(x, rank(y)) / cov(x, rank(x)) and its
    transpose — the L¹-geometry dependence gauge between Pearson
    (moment geometry, tax×discount key) and Kendall (pure rank,
    qty×discount key); the ASYMMETRY |Γxy − Γyx| is itself a read-off
    (equal iff the joint distribution is exchangeable after
    standardization).

    Exactness: average tie-ranks come from the distinct-VALUE
    relations (the two-phase Kruskal idiom — no row-scale sort), held
    ×2 so they stay integers; all five cross-moments run in
    DECIMAL(38,0); each Γ micro-rounds ONE sign-safe half-up integer
    division of exact DECIMALs (never casting a >2⁶⁴ integer to
    double).  Scale: two distinct-value rollups + one row pass."""
    li = T(spark, sf, "lineitem").select(
        F.expr("cast(floor(l_quantity + 0.5) as bigint)").alias("x"),
        F.expr(
            "cast(floor(l_extendedprice * 100 + 0.5) as bigint)"
        ).alias("y"),
    )

    def ranks(col):
        from pyspark.sql import Window as W

        dv = li.groupBy(F.col(col).alias("v")).agg(
            F.count("*").alias("cv")
        )
        w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
        # 2 * average tie rank of value v: (cum_below + cum_incl + 1)
        return dv.select(
            "v",
            (
                F.sum("cv").over(w) * 2 - F.col("cv") + F.lit(1)
            ).alias(f"r2_{col}"),
        ).withColumnRenamed("v", col)
    rx, ry = ranks("x"), ranks("y")
    j = li.join(rx, "x").join(ry, "y")
    m = j.groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.expr("cast(x as decimal(38,0))")).alias("sx"),
        F.sum(F.expr("cast(y as decimal(38,0))")).alias("sy"),
        F.sum(F.expr("cast(r2_x as decimal(38,0))")).alias("srx"),
        F.sum(F.expr("cast(r2_y as decimal(38,0))")).alias("sry"),
        F.sum(F.expr("cast(x as decimal(38,0)) * r2_y")).alias("sxry"),
        F.sum(F.expr("cast(y as decimal(38,0)) * r2_x")).alias("syrx"),
        F.sum(F.expr("cast(x as decimal(38,0)) * r2_x")).alias("sxrx"),
        F.sum(F.expr("cast(y as decimal(38,0)) * r2_y")).alias("syry"),
    )
    gm = (
        "case when {den} > 0 then case when {num} >= 0 then"
        " (2 * {num} * 1000000 + {den}) div (2 * {den})"
        " else -((2 * (-({num})) * 1000000 + {den}) div (2 * {den}))"
        " end end"
    )
    gxy = gm.format(num="(n * sxry - sx * sry)", den="(n * sxrx - sx * srx)")
    gyx = gm.format(num="(n * syrx - sy * srx)", den="(n * syry - sy * sry)")
    return m.selectExpr(
        "cast(n as bigint) AS n_rows",
        f"round(({gxy}) / 1e6, 6) + 0.0 AS gini_corr_xy",
        f"round(({gyx}) / 1e6, 6) + 0.0 AS gini_corr_yx",
    )


ORACLE_GINI_CORR = """
WITH li AS (
  SELECT floor(l_quantity + 0.5)::BIGINT AS x,
         floor(l_extendedprice * 100 + 0.5)::BIGINT AS y
  FROM lineitem),
rx AS (
  SELECT v AS x,
         (sum(cv) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) * 2 - cv + 1)::BIGINT AS r2_x
  FROM (SELECT x AS v, count(*)::BIGINT AS cv FROM li GROUP BY 1)),
ry AS (
  SELECT v AS y,
         (sum(cv) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) * 2 - cv + 1)::BIGINT AS r2_y
  FROM (SELECT y AS v, count(*)::BIGINT AS cv FROM li GROUP BY 1)),
m AS (
  SELECT count(*)::HUGEINT AS n,
         sum(x::HUGEINT)::HUGEINT AS sx, sum(y::HUGEINT)::HUGEINT AS sy,
         sum(r2_x::HUGEINT)::HUGEINT AS srx,
         sum(r2_y::HUGEINT)::HUGEINT AS sry,
         sum(x::HUGEINT * r2_y)::HUGEINT AS sxry,
         sum(y::HUGEINT * r2_x)::HUGEINT AS syrx,
         sum(x::HUGEINT * r2_x)::HUGEINT AS sxrx,
         sum(y::HUGEINT * r2_y)::HUGEINT AS syry
  FROM li JOIN rx USING (x) JOIN ry USING (y))
SELECT n::BIGINT AS n_rows,
       round((CASE WHEN (n * sxrx - sx * srx) > 0 THEN
         CASE WHEN (n * sxry - sx * sry) >= 0 THEN
           (2 * (n * sxry - sx * sry) * 1000000 + (n * sxrx - sx * srx))
             // (2 * (n * sxrx - sx * srx))
         ELSE -((2 * (-(n * sxry - sx * sry)) * 1000000
                 + (n * sxrx - sx * srx))
                // (2 * (n * sxrx - sx * srx)))
         END END) / 1e6, 6) + 0.0 AS gini_corr_xy,
       round((CASE WHEN (n * syry - sy * sry) > 0 THEN
         CASE WHEN (n * syrx - sy * srx) >= 0 THEN
           (2 * (n * syrx - sy * srx) * 1000000 + (n * syry - sy * sry))
             // (2 * (n * syry - sy * sry))
         ELSE -((2 * (-(n * syrx - sy * srx)) * 1000000
                 + (n * syry - sy * sry))
                // (2 * (n * syry - sy * sry)))
         END END) / 1e6, 6) + 0.0 AS gini_corr_yx
FROM m
"""

BANK_QUERIES["lineitem_qty_price_gini_correlation"] = (
    lineitem_qty_price_gini_correlation
)
BANK_ORACLES["lineitem_qty_price_gini_correlation"] = ORACLE_GINI_CORR


def events_type_cochran_q(spark, sf):
    """Cochran's Q test on per-user daily-activity agreement across
    the three busiest event types: each user is one BLOCK with k = 3
    paired binary outcomes (active in that type on ≥ 11 distinct
    days? — the corpus median, so both outcomes are populated), Q = k(k−1)·Σⱼ(Cⱼ − T/k)² / (k·T − ΣᵢRᵢ²) — the
    k-treatment generalization of the McNemar pair, completing the
    paired-binary family (marginal-homogeneity across ALL types at
    once, where the per-pair tests multiple-compare).

    Exactness: every cell/row/column total is an exact integer;
    Σ(k·Cⱼ − T)² folds the mean exactly (×k² scaling); ONE final
    double division.  Scale: one events pass to per-(user, type)
    day counts, then user-bounded flags."""
    ev = T(spark, sf, "events").select(
        "user_id", "event_type", F.expr("to_date(ts)").alias("d")
    )
    top3 = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("tc"))
        .select(
            "event_type",
            F.expr(
                "row_number() over (order by tc desc, event_type)"
            ).alias("rk"),
        )
        .filter("rk <= 3")
    )
    flags = (
        ev.join(F.broadcast(top3), "event_type")
        .groupBy("user_id", "rk")
        .agg(F.expr("cast(count(distinct d) >= 11 as int)").alias("x"))
    )
    rows = flags.groupBy("user_id").agg(
        F.sum("x").alias("r"),
        *[
            F.max(F.expr(f"case when rk = {j} then x else 0 end"))
            .alias(f"x{j}")
            for j in (1, 2, 3)
        ],
    )
    agg = rows.groupBy().agg(
        F.count("*").alias("n_users"),
        F.sum("r").alias("t"),
        F.sum(F.expr("r * r")).alias("r2"),
        *[F.sum(f"x{j}").alias(f"c{j}") for j in (1, 2, 3)],
    )
    return agg.selectExpr(
        "cast(n_users as bigint) AS n_users",
        "cast(c1 as bigint) AS c1", "cast(c2 as bigint) AS c2",
        "cast(c3 as bigint) AS c3",
        "case when 3 * t - r2 > 0 then"
        " round(cast(2 * ((3 * c1 - t) * (3 * c1 - t)"
        " + (3 * c2 - t) * (3 * c2 - t)"
        " + (3 * c3 - t) * (3 * c3 - t)) as double)"
        " / (3 * (3 * t - r2)), 6) + 0.0 end AS cochran_q",
    )


ORACLE_COCHRAN_Q = """
WITH ev AS (
  SELECT user_id, event_type, ts::DATE AS d FROM events),
top3 AS (
  SELECT event_type,
         row_number() OVER (ORDER BY count(*) DESC, event_type) AS rk
  FROM ev GROUP BY event_type QUALIFY rk <= 3),
flags AS (
  SELECT user_id, rk, (count(DISTINCT d) >= 11)::INT AS x
  FROM ev JOIN top3 USING (event_type) GROUP BY 1, 2),
rows_ AS (
  SELECT user_id, sum(x)::BIGINT AS r,
         max(CASE WHEN rk = 1 THEN x ELSE 0 END)::BIGINT AS x1,
         max(CASE WHEN rk = 2 THEN x ELSE 0 END)::BIGINT AS x2,
         max(CASE WHEN rk = 3 THEN x ELSE 0 END)::BIGINT AS x3
  FROM flags GROUP BY 1),
agg AS (
  SELECT count(*)::BIGINT AS n_users, sum(r)::BIGINT AS t,
         sum(r * r)::BIGINT AS r2,
         sum(x1)::BIGINT AS c1, sum(x2)::BIGINT AS c2,
         sum(x3)::BIGINT AS c3
  FROM rows_)
SELECT n_users, c1, c2, c3,
       CASE WHEN 3 * t - r2 > 0 THEN
         round((2 * ((3 * c1 - t) * (3 * c1 - t)
                     + (3 * c2 - t) * (3 * c2 - t)
                     + (3 * c3 - t) * (3 * c3 - t)))::DOUBLE
               / (3 * (3 * t - r2)), 6) + 0.0
       END AS cochran_q
FROM agg
"""

BANK_QUERIES["events_type_cochran_q"] = events_type_cochran_q
BANK_ORACLES["events_type_cochran_q"] = ORACLE_COCHRAN_Q
