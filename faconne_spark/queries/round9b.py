"""Round-9 analytics wave 3: rank statistics on the two-phase
distributed rank primitive, inequality decomposition, forecast
backtesting, dispersion tests, and corpus/embedding health gauges.

Same discipline as every wave: one DuckDB oracle per key, exact
integer arithmetic wherever a sum crosses rows (micro-units, the
per-cell ln-before-multiply rule, half-up integer division), final
statistics as single-expression doubles both engines derive from
identical integers.  The new `distributed_avg_ranks` primitive
(operators/relational.py) removes the partition-less window that a
naive rank statistic would introduce — rank arithmetic runs on the
distinct-value relation, two-phase like distributed_ntile."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from faconne_spark.queries import T

QUERIES: dict = {}
ORACLES: dict = {}

# ------------------------------------------ Theil-T revenue decomposition

def orders_revenue_theil_nation(spark, sf):
    """Theil-T decomposition of customer revenue concentration by
    nation (Theil 1967): the within-nation index T_g plus the
    between-nation log term — the decomposable companion to the Gini
    gauges (Gini cannot be split into between/within; Theil can, which
    is what a mixture planner needs: is concentration a nation-mix
    story or an inside-the-nation story?).

    Exactness: per-customer revenue is whole-dollar BIGINT (one
    HALF_UP per order); T_g uses the identity T = (1/S)·Σ x·ln(x·n/S),
    so the per-customer cell micro-rounds ONE ln of a ratio of exact
    BIGINTs and the weighted sum Σ x·l runs in DECIMAL(38,0) (x can
    reach 5·10⁵ dollars; BIGINT would overflow past sf1).  The
    within index is one half-up integer division; micro-rounding noise
    can push a near-uniform nation's sum a few micro below zero, so
    it clamps at 0 (Theil ≥ 0 by Jensen).  The between log term is a
    direct micro-round of ln(S_g·N/(S·n_g)) — exact BIGINT ratio.

    Scale: one orders shuffle to per-customer dollars, an equi-join to
    customer for the nation key (broadcast nation), then all windows
    vanish — per-nation aggregates only.  The tagged per-customer
    relation feeds three consumers (per-nation totals, the ln cells,
    the weighted sum), so it persists — the orders shuffle runs once
    (the r7 quantile-family lesson)."""
    from faconne_spark.operators.dedup import track_persist

    per_cust = (
        T(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "sum(cast(floor(o_totalprice + 0.5) as bigint))"
            ).alias("x")
        )
        .filter(F.col("x") > 0)
    )
    cust = T(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nat = T(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    tagged = track_persist(
        per_cust.join(cust, "o_custkey").join(F.broadcast(nat), "c_nationkey")
    )
    per_nat = tagged.groupBy("n_name").agg(
        F.count("*").alias("n_g"), F.sum("x").alias("s_g")
    )
    cells = tagged.join(F.broadcast(per_nat), "n_name").select(
        "n_name",
        "x",
        F.expr(
            "cast(floor(ln(cast(x as double) * n_g / s_g) * 1000000"
            " + 0.5) as bigint)"
        ).alias("l"),
    )
    wsum = cells.groupBy("n_name").agg(
        F.sum(
            F.col("x").cast("decimal(38,0)") * F.col("l").cast("decimal(38,0)")
        ).alias("w")
    )
    tot = per_nat.groupBy().agg(
        F.sum("n_g").alias("n_all"), F.sum("s_g").alias("s_all")
    )
    return (
        per_nat.join(wsum, "n_name")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_name").alias("nation"),
            F.col("n_g").cast("long").alias("n_customers"),
            F.col("s_g").cast("long").alias("revenue_total"),
            F.expr(
                "cast((2000000 * s_g + s_all) div (2 * s_all) as bigint)"
            ).alias("rev_share_micro"),
            F.expr(
                # the sum accumulates in DECIMAL (overflow headroom) but
                # the half-up division runs on BIGINTs: decimal `div`
                # rounds the scale-0 quotient in DuckDB where Spark
                # truncates — a one-micro portability trap.  The cast is
                # safe through sf1 (W_g ≤ ~10¹⁸); past that the micro
                # scale itself must drop first.
                "cast((2 * cast(greatest(w, cast(0 as decimal(38,0)))"
                " as bigint) + s_g) div (2 * s_g) as bigint)"
            ).alias("within_theil_micro"),
            F.expr(
                "cast(floor(ln(cast(s_g as double) * n_all"
                " / (cast(s_all as double) * n_g)) * 1000000 + 0.5)"
                " as bigint)"
            ).alias("between_ln_micro"),
        )
    )


ORACLE_THEIL = """
WITH per_cust AS (
  SELECT o_custkey, sum(floor(o_totalprice + 0.5)::BIGINT)::BIGINT AS x
  FROM orders GROUP BY 1 HAVING sum(floor(o_totalprice + 0.5)::BIGINT) > 0),
tagged AS (
  SELECT n.n_name, p.x
  FROM per_cust p
  JOIN customer c ON c.c_custkey = p.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey),
per_nat AS (
  SELECT n_name, count(*)::BIGINT AS n_g, sum(x)::BIGINT AS s_g
  FROM tagged GROUP BY 1),
cells AS (
  SELECT t.n_name, t.x,
         floor(ln(t.x::DOUBLE * p.n_g / p.s_g) * 1000000 + 0.5)::BIGINT AS l
  FROM tagged t JOIN per_nat p USING (n_name)),
wsum AS (
  SELECT n_name, sum(x::DECIMAL(38,0) * l::DECIMAL(38,0)) AS w
  FROM cells GROUP BY 1),
tot AS (SELECT sum(n_g)::BIGINT AS n_all, sum(s_g)::BIGINT AS s_all
        FROM per_nat)
SELECT p.n_name AS nation, p.n_g AS n_customers, p.s_g AS revenue_total,
       ((2000000 * p.s_g + t.s_all) // (2 * t.s_all))::BIGINT
         AS rev_share_micro,
       ((2 * greatest(w.w, 0::DECIMAL(38,0))::BIGINT + p.s_g)
        // (2 * p.s_g))::BIGINT AS within_theil_micro,
       floor(ln(p.s_g::DOUBLE * t.n_all / (t.s_all::DOUBLE * p.n_g))
             * 1000000 + 0.5)::BIGINT AS between_ln_micro
FROM per_nat p JOIN wsum w USING (n_name) CROSS JOIN tot t
"""

QUERIES["orders_revenue_theil_nation"] = orders_revenue_theil_nation
ORACLES["orders_revenue_theil_nation"] = ORACLE_THEIL


# ------------------------------------------------ Poisson overdispersion

def events_daily_overdispersion(spark, sf):
    """Daily-count overdispersion per event type: the variance-to-mean
    dispersion index D over ALL observed calendar days (a type absent
    on a day is a true zero — excluding zero days is the classic way
    to accidentally report underdispersion).  D ≈ 1 is Poisson;
    D ≫ 1 means bursty/contagious arrivals, and every capacity model
    that assumed Poisson is wrong (Cox & Lewis 1966).

    Exactness: with c_d the integer daily counts over D days,
    sample-var/mean = (D·Σc² − (Σc)²) / ((D−1)·Σc) — a ratio of exact
    BIGINTs, one half-up micro division; zero days contribute 0 to
    both Σc and Σc² so only the per-type present-day relation is ever
    materialized.

    Scale: one events pass to (type, day) counts, a day-spine scalar
    (countDistinct day), then ≤ types-row arithmetic."""
    ev = T(spark, sf, "events").select(
        F.expr("to_date(ts)").alias("d"), "event_type"
    )
    daily = ev.groupBy("event_type", "d").agg(F.count("*").alias("c"))
    spine = ev.agg(F.countDistinct("d").alias("n_days"))
    per_type = daily.groupBy("event_type").agg(
        F.count("*").alias("days_present"),
        F.sum("c").alias("sc"),
        F.sum(F.expr("c * c")).alias("sc2"),
    )
    return per_type.crossJoin(F.broadcast(spine)).select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("days_present").cast("long").alias("days_present"),
        F.col("sc").cast("long").alias("n_events"),
        F.expr(
            "cast((2000000 * sc + n_days) div (2 * n_days) as bigint)"
        ).alias("mean_daily_micro"),
        F.expr(
            "cast((2000000 * (n_days * sc2 - sc * sc)"
            " + (n_days - 1) * sc)"
            " div (2 * (n_days - 1) * sc) as bigint)"
        ).alias("dispersion_micro"),
    )


ORACLE_OVERDISPERSION = """
WITH ev AS (SELECT ts::DATE AS d, event_type FROM events),
daily AS (
  SELECT event_type, d, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
spine AS (SELECT count(DISTINCT d)::BIGINT AS n_days FROM ev),
per_type AS (
  SELECT event_type, count(*)::BIGINT AS days_present,
         sum(c)::BIGINT AS sc, sum(c * c)::BIGINT AS sc2
  FROM daily GROUP BY 1)
SELECT event_type, n_days, days_present, sc AS n_events,
       ((2000000 * sc + n_days) // (2 * n_days))::BIGINT
         AS mean_daily_micro,
       ((2000000 * (n_days * sc2 - sc * sc) + (n_days - 1) * sc)
        // (2 * (n_days - 1) * sc))::BIGINT AS dispersion_micro
FROM per_type CROSS JOIN spine
"""

QUERIES["events_daily_overdispersion"] = events_daily_overdispersion
ORACLES["events_daily_overdispersion"] = ORACLE_OVERDISPERSION


# ------------------------------------------------ Kruskal–Wallis H

def part_brand_price_kruskal(spark, sf):
    """Kruskal–Wallis H across brands on retail price (Kruskal &
    Wallis 1952) — the rank-based one-way test: does ANY brand price
    from a different distribution, with no normality assumption (the
    ANOVA family's F assumes it; prices are famously heavy-tailed)?
    Reports H, the tie-corrected H, and degrees of freedom.

    Ranks come from `distributed_avg_ranks` (average tie-ranks ×2 so
    they stay exact BIGINTs) — rank arithmetic runs two-phase on the
    DISTINCT-PRICE relation (bounded by the price domain, ~10³
    values at every SF), never a partition-less window over parts.
    With R_j = Σ avg-ranks per brand, H = 3·Σ(2R_j)²/n_j / (N(N+1))
    − 3(N+1); each brand's (2R_j)²/n_j cell rounds to ONE BIGINT
    ((2R)² ≤ (2N·n)² stays under 2⁵³ through sf1) and the tie term
    Σ(t³−t) is an exact per-row sum of (t²−1)."""
    from faconne_spark.operators.evalstats import kruskal_wallis

    return kruskal_wallis(
        T(spark, sf, "part"),
        "p_brand",
        "cast(floor(p_retailprice * 100 + 0.5) as bigint)",
    ).select(
        F.col("n_rows").alias("n_parts"),
        F.col("k_groups").alias("k_brands"),
        "df",
        "h_stat",
        "tie_correction",
        "h_adj",
    )


ORACLE_KRUSKAL = """
WITH ranked AS (
  SELECT p_brand,
         2 * rank() OVER (ORDER BY v)
           + count(*) OVER (PARTITION BY v) - 1 AS avg2_rank,
         count(*) OVER (PARTITION BY v) AS t
  FROM (SELECT p_brand,
               floor(p_retailprice * 100 + 0.5)::BIGINT AS v
        FROM part)),
per_brand AS (
  SELECT p_brand, count(*)::BIGINT AS n_j,
         sum(avg2_rank)::BIGINT AS s2_j
  FROM ranked GROUP BY 1),
cells AS (
  SELECT n_j,
         floor(s2_j::DOUBLE * s2_j::DOUBLE / n_j + 0.5)::BIGINT AS cell
  FROM per_brand),
ties AS (
  SELECT sum(t * t - 1)::BIGINT AS tie_sum, count(*)::BIGINT AS n
  FROM ranked)
SELECT min(n)::BIGINT AS n_parts, count(*)::BIGINT AS k_brands,
       (count(*) - 1)::BIGINT AS df,
       round(3.0 * sum(cell) / (min(n)::DOUBLE * (min(n) + 1))
             - 3.0 * (min(n) + 1), 6) + 0.0 AS h_stat,
       round(1.0 - min(tie_sum)::DOUBLE
             / (min(n)::DOUBLE * min(n) * min(n) - min(n)), 9) + 0.0
         AS tie_correction,
       CASE WHEN 1.0 - min(tie_sum)::DOUBLE
                  / (min(n)::DOUBLE * min(n) * min(n) - min(n)) > 0
            THEN round((3.0 * sum(cell)
                        / (min(n)::DOUBLE * (min(n) + 1))
                        - 3.0 * (min(n) + 1))
                       / (1.0 - min(tie_sum)::DOUBLE
                          / (min(n)::DOUBLE * min(n) * min(n) - min(n))),
                       6) + 0.0 END AS h_adj
FROM cells CROSS JOIN ties
"""

QUERIES["part_brand_price_kruskal"] = part_brand_price_kruskal
ORACLES["part_brand_price_kruskal"] = ORACLE_KRUSKAL

# ------------------------------------------------ Brown–Forsythe

def events_value_brownforsythe(spark, sf):
    """Brown–Forsythe test for variance homogeneity of event value
    across event types (Brown & Forsythe 1974): one-way ANOVA on the
    absolute deviations from each group's MEDIAN.  The ANOVA/Kruskal
    pair asks "do the centers differ?"; this asks "do the SPREADS
    differ?" — the hidden assumption under every pooled-variance test
    upstream, and a real drift alarm on its own (a type whose value
    variance doubled is news even at a stable mean).

    Exactness: value micro-rounds to BIGINT; 2×group-median is an
    exact integer (both engines interpolate the even-count median as
    the midpoint of two integers, so doubling restores exactness —
    percentile() and quantile_cont() agree bit-for-bit here); the
    deviation |2v − 2m| is then an exact BIGINT fed to
    evalstats.oneway_anova's integer-term discipline (micro=1: the
    deviations are already integers).

    Scale: one grouped percentile pass (≤ types rows, broadcast
    back), one ANOVA pass — no windows, no UDFs."""
    from faconne_spark.operators.evalstats import oneway_anova

    ev = T(spark, sf, "events").select(
        "event_type",
        F.expr("cast(floor(value * 1000000 + 0.5) as bigint)").alias("v"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("cast(floor(2 * percentile(v, 0.5) + 0.5) as bigint)").alias(
            "m2"
        )
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.expr("abs(2 * v - m2)").alias("z")
    )
    return oneway_anova(dev, "event_type", "z", micro=1)


ORACLE_BROWNFORSYTHE = """
WITH ev AS (
  SELECT event_type, floor(value * 1000000 + 0.5)::BIGINT AS v
  FROM events),
med AS (
  SELECT event_type,
         floor(2 * quantile_cont(v, 0.5) + 0.5)::BIGINT AS m2
  FROM ev GROUP BY 1),
dev AS (
  SELECT ev.event_type, abs(2 * ev.v - med.m2)::BIGINT AS z
  FROM ev JOIN med USING (event_type)),
g AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(round(z * 1)::BIGINT)::BIGINT AS s,
         sum(round(z * 1)::BIGINT::DECIMAL(38,0)
             * round(z * 1)::BIGINT::DECIMAL(38,0)) AS ss
  FROM dev WHERE z IS NOT NULL GROUP BY 1),
tot AS (
  SELECT sum(n)::BIGINT AS nt, sum(s)::BIGINT AS st,
         count(*)::BIGINT AS k
  FROM g),
terms AS (
  SELECT k, nt,
         round(n::DOUBLE * pow(s::DOUBLE / n::DOUBLE
                               - st::DOUBLE / nt::DOUBLE, 2)
               / 1000000.0, 0)::BIGINT AS b,
         round((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
               / 1000000.0, 0)::BIGINT AS w
  FROM g CROSS JOIN tot)
SELECT max(k)::BIGINT AS n_groups, max(nt)::BIGINT AS n_rows,
       sum(b)::BIGINT AS ssb_micro, sum(w)::BIGINT AS ssw_micro,
       CASE WHEN max(k) >= 2 AND max(nt) > max(k) AND sum(w) > 0 THEN
         round((sum(b)::DOUBLE / (max(k) - 1))
               / (sum(w)::DOUBLE / (max(nt) - max(k))), 6) + 0.0 END
         AS f_stat,
       CASE WHEN sum(b) + sum(w) > 0 THEN
         round(sum(b)::DOUBLE / (sum(b)::DOUBLE + sum(w)::DOUBLE), 6)
         + 0.0 END AS eta_sq
FROM terms
"""

QUERIES["events_value_brownforsythe"] = events_value_brownforsythe
ORACLES["events_value_brownforsythe"] = ORACLE_BROWNFORSYTHE


# ------------------------------------------------ seasonal-naive MASE

def orders_seasonal_naive_mase(spark, sf):
    """Forecast-backtest floor for monthly order volume and revenue:
    the seasonal-naive predictor (month m−12's figure) scored as MAE
    and as MASE against the naive lag-1 walk (Hyndman & Koehler
    2006).  MASE < 1 means last year's month beats last month — i.e.
    the series HAS exploitable seasonality and a real forecaster must
    clear this floor; MASE ≥ 1 says the yearly cycle is noise.

    Exactness: monthly counts and whole-dollar revenue are BIGINTs;
    both predictors are self-joins on calendar month (add_months — no
    window, no ordering), errors are integer |Δ|, and every reported
    ratio is one half-up micro division of two exact sums over the
    SAME eval months (months having both a lag-1 and lag-12
    neighbor — one consistent eval set, not per-metric windows).

    Scale: orders collapse to ≤ months rows in one pass; everything
    after is broadcast self-joins on a bounded calendar relation
    (persisted — three consumers, one orders shuffle)."""
    from faconne_spark.operators.dedup import track_persist

    monthly = track_persist(
        T(spark, sf, "orders")
        .groupBy(F.expr("trunc(to_date(o_orderdate), 'MM')").alias("m"))
        .agg(
            F.count("*").alias("cnt"),
            F.expr(
                "sum(cast(floor(o_totalprice + 0.5) as bigint))"
            ).alias("rev"),
        )
    )
    a = monthly.select(
        F.col("m"), F.col("cnt").alias("a_cnt"), F.col("rev").alias("a_rev")
    )
    s12 = monthly.select(
        F.expr("add_months(m, 12)").alias("m"),
        F.col("cnt").alias("s_cnt"),
        F.col("rev").alias("s_rev"),
    )
    n1 = monthly.select(
        F.expr("add_months(m, 1)").alias("m"),
        F.col("cnt").alias("n_cnt"),
        F.col("rev").alias("n_rev"),
    )
    ev = a.join(s12, "m").join(n1, "m")
    return ev.groupBy().agg(
        F.count("*").cast("long").alias("n_eval_months"),
        F.sum(F.expr("abs(a_cnt - s_cnt)")).cast("long").alias("sae_cnt"),
        F.sum(F.expr("abs(a_cnt - n_cnt)")).cast("long").alias("nae_cnt"),
        F.expr(
            "cast((2000000 * sum(abs(a_cnt - s_cnt)) + count(*))"
            " div (2 * count(*)) as bigint)"
        ).alias("mae_seasonal_cnt_micro"),
        F.expr(
            "case when sum(abs(a_cnt - n_cnt)) > 0 then"
            " cast((2000000 * sum(abs(a_cnt - s_cnt))"
            " + sum(abs(a_cnt - n_cnt)))"
            " div (2 * sum(abs(a_cnt - n_cnt))) as bigint) end"
        ).alias("mase_cnt_micro"),
        F.expr(
            "case when sum(abs(a_rev - n_rev)) > 0 then"
            " cast((2000000 * sum(abs(a_rev - s_rev))"
            " + sum(abs(a_rev - n_rev)))"
            " div (2 * sum(abs(a_rev - n_rev))) as bigint) end"
        ).alias("mase_rev_micro"),
    )


ORACLE_MASE = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate::DATE)::DATE AS m,
         count(*)::BIGINT AS cnt,
         sum(floor(o_totalprice + 0.5)::BIGINT)::BIGINT AS rev
  FROM orders GROUP BY 1),
ev AS (
  SELECT a.cnt AS a_cnt, a.rev AS a_rev,
         s.cnt AS s_cnt, s.rev AS s_rev,
         n.cnt AS n_cnt, n.rev AS n_rev
  FROM monthly a
  JOIN monthly s ON a.m = (s.m + INTERVAL 12 MONTH)::DATE
  JOIN monthly n ON a.m = (n.m + INTERVAL 1 MONTH)::DATE)
SELECT count(*)::BIGINT AS n_eval_months,
       sum(abs(a_cnt - s_cnt))::BIGINT AS sae_cnt,
       sum(abs(a_cnt - n_cnt))::BIGINT AS nae_cnt,
       ((2000000 * sum(abs(a_cnt - s_cnt)) + count(*))
        // (2 * count(*)))::BIGINT AS mae_seasonal_cnt_micro,
       CASE WHEN sum(abs(a_cnt - n_cnt)) > 0 THEN
         ((2000000 * sum(abs(a_cnt - s_cnt)) + sum(abs(a_cnt - n_cnt)))
          // (2 * sum(abs(a_cnt - n_cnt))))::BIGINT END AS mase_cnt_micro,
       CASE WHEN sum(abs(a_rev - n_rev)) > 0 THEN
         ((2000000 * sum(abs(a_rev - s_rev)) + sum(abs(a_rev - n_rev)))
          // (2 * sum(abs(a_rev - n_rev))))::BIGINT END AS mase_rev_micro
FROM ev
"""

QUERIES["orders_seasonal_naive_mase"] = orders_seasonal_naive_mase
ORACLES["orders_seasonal_naive_mase"] = ORACLE_MASE

# ------------------------------------------------ Gries' DP dispersion

def docs_word_dispersion_dp(spark, sf):
    """Deviation of Proportions (Gries 2008) for the corpus's top-20
    words: DP = ½·Σ_s |v_ws/f_w − C_s/C| — is a frequent word spread
    evenly across sources (DP → 0) or concentrated in one (DP → 1)?
    The word-level companion to docs_source_unigram_jsd's
    source-level matrix: JSD says WHICH sources differ, DP says WHICH
    WORDS carry the difference — the first thing to read before
    trusting a frequency-based quality score trained on one source.

    Exactness: each |·| cell is |v_ws·C − C_s·f_w| / (f_w·C) — an
    integer numerator over a per-word constant denominator, so the
    Σ_s is an exact BIGINT and DP is ONE double division of exact
    integers (≤ 2·f·C ≪ 2⁵³), rounded once.  Zero cells (word absent
    from a source) contribute exactly C_s·f_w via the left join's
    coalesce.

    Scale: one tokenize+count shuffle to (word, source) cells; the
    top-20 selection is a TakeOrderedAndProject (no global sort
    materializes); the DP matrix is 20 × |sources| — broadcast
    territory."""
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "spark")
    cnt = (
        T(spark, sf, "documents")
        .select("source", F.explode(F.expr(toks)).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("v"))
    )
    freq = cnt.groupBy("w").agg(F.sum("v").alias("f"))
    src = cnt.groupBy("source").agg(F.sum("v").alias("c_s"))
    tot = src.agg(F.sum("c_s").alias("c_tot"))
    top = freq.orderBy(F.desc("f"), F.asc("w")).limit(20)
    grid = top.crossJoin(F.broadcast(src)).join(
        cnt, ["w", "source"], "left"
    )
    cells = grid.crossJoin(F.broadcast(tot)).select(
        "w",
        "f",
        "c_tot",
        F.expr("abs(coalesce(v, 0) * c_tot - c_s * f)").alias("num"),
    )
    return cells.groupBy("w", "f", "c_tot").agg(
        F.count("*").cast("long").alias("n_sources"),
        F.expr(
            "round(cast(sum(num) as double)"
            " / (2.0 * min(f) * min(c_tot)), 6) + 0.0"
        ).alias("dp"),
    ).select(
        F.col("w").alias("word"),
        F.col("f").cast("long").alias("total_count"),
        "n_sources",
        "dp",
    )


def _oracle_word_dispersion() -> str:
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    return f"""
WITH cnt AS (
  SELECT source, w, count(*)::BIGINT AS v
  FROM (SELECT source, unnest({toks}) AS w FROM documents)
  GROUP BY 1, 2),
freq AS (SELECT w, sum(v)::BIGINT AS f FROM cnt GROUP BY 1),
src AS (SELECT source, sum(v)::BIGINT AS c_s FROM cnt GROUP BY 1),
tot AS (SELECT sum(c_s)::BIGINT AS c_tot FROM src),
top AS (SELECT w, f FROM freq ORDER BY f DESC, w ASC LIMIT 20),
cells AS (
  SELECT t.w, t.f, tot.c_tot,
         abs(coalesce(c.v, 0) * tot.c_tot - s.c_s * t.f)::BIGINT AS num
  FROM top t CROSS JOIN src s CROSS JOIN tot
  LEFT JOIN cnt c ON c.w = t.w AND c.source = s.source)
SELECT w AS word, f AS total_count, count(*)::BIGINT AS n_sources,
       round(sum(num)::DOUBLE / (2.0 * min(f) * min(c_tot)), 6) + 0.0 AS dp
FROM cells GROUP BY w, f, c_tot
"""


QUERIES["docs_word_dispersion_dp"] = docs_word_dispersion_dp
ORACLES["docs_word_dispersion_dp"] = _oracle_word_dispersion()


# ------------------------------------------- per-dimension variance map

def embed_dim_variance_concentration(spark, sf):
    """Per-dimension variance concentration of the embedding space:
    the top-8 dimensions by variance with each one's share and the
    cumulative share — the PCA-lite health check that needs no
    eigensolve (if 3 of 64 raw dimensions carry most of the variance,
    the encoder is wasting capacity, and any product-quantizer that
    splits dimensions uniformly is mis-budgeted; cf. the variance
    tails Jégou et al. 2011 correct with rotation).

    Exactness: coordinates micro-round to BIGINT; per-dim moments
    (n, S BIGINT, Q DECIMAL(38,0)); the variance numerator
    n·Q − S² is an exact DECIMAL both engines rank identically (ties
    break on dim), and shares divide two exact decimals in one
    rounded double expression.

    Scale: one posexplode pass map-side-combines to ≤ d rows;
    the rank window runs on that d-row relation (bounded by the
    embedding dimensionality, not the corpus) — everything after the
    first aggregation is effectively free."""
    dims = (
        T(spark, sf, "embeddings")
        .select(F.posexplode("embedding").alias("pos0", "x"))
        .select(
            (F.col("pos0") + 1).alias("dim"),
            F.expr(
                "cast(floor(cast(x as double) * 1000000 + 0.5) as bigint)"
            ).alias("us"),
        )
    )
    per_dim = dims.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("us").alias("s"),
        F.sum(
            F.col("us").cast("decimal(38,0)") * F.col("us").cast("decimal(38,0)")
        ).alias("q"),
    ).withColumn(
        "num",
        F.expr(
            "cast(n as decimal(38,0)) * q"
            " - cast(s as decimal(38,0)) * cast(s as decimal(38,0))"
        ),
    )
    tot = per_dim.agg(F.sum("num").alias("num_tot"))
    w = Window.orderBy(F.desc("num"), F.asc("dim"))
    ranked = (
        per_dim.withColumn("rnk", F.row_number().over(w))
        .withColumn(
            "cum_num",
            F.sum("num").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(F.col("rnk") <= 8)
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "rnk",
        "dim",
        F.col("n").cast("long").alias("n_vectors"),
        F.expr(
            "round(cast(num as double)"
            " / (cast(n as double) * cast(n as double)) / 1e12, 9) + 0.0"
        ).alias("variance"),
        F.expr(
            "round(cast(num as double) / cast(num_tot as double), 6) + 0.0"
        ).alias("share"),
        F.expr(
            "round(cast(cum_num as double) / cast(num_tot as double), 6)"
            " + 0.0"
        ).alias("cum_share"),
    )


ORACLE_DIM_VARIANCE = """
WITH dims AS (
  SELECT unnest(range(1, len(embedding) + 1)) AS dim,
         floor(unnest(embedding)::DOUBLE * 1000000 + 0.5)::BIGINT AS us
  FROM embeddings),
per_dim AS (
  SELECT dim, count(*)::BIGINT AS n, sum(us)::BIGINT AS s,
         sum(us::DECIMAL(38,0) * us::DECIMAL(38,0)) AS q
  FROM dims GROUP BY 1),
nums AS (
  SELECT dim, n, s, q,
         n::DECIMAL(38,0) * q - s::DECIMAL(38,0) * s::DECIMAL(38,0) AS num
  FROM per_dim),
tot AS (SELECT sum(num) AS num_tot FROM nums),
ranked AS (
  SELECT dim, n, num,
         row_number() OVER (ORDER BY num DESC, dim ASC) AS rnk,
         sum(num) OVER (ORDER BY num DESC, dim ASC
                        ROWS UNBOUNDED PRECEDING) AS cum_num
  FROM nums)
SELECT rnk, dim, n AS n_vectors,
       round(num::DOUBLE / (n::DOUBLE * n::DOUBLE) / 1e12, 9) + 0.0
         AS variance,
       round(num::DOUBLE / num_tot::DOUBLE, 6) + 0.0 AS share,
       round(cum_num::DOUBLE / num_tot::DOUBLE, 6) + 0.0 AS cum_share
FROM ranked CROSS JOIN tot
WHERE rnk <= 8
"""

QUERIES["embed_dim_variance_concentration"] = embed_dim_variance_concentration
ORACLES["embed_dim_variance_concentration"] = ORACLE_DIM_VARIANCE


# ------------------------------------------------ Wilcoxon signed-rank

def events_weekend_wilcoxon(spark, sf):
    """Wilcoxon signed-rank test (Wilcoxon 1945) on each user's
    weekend-vs-weekday TOTAL event value — the paired, rank-based
    answer to "does the same user spend differently on weekends?",
    immune to the heavy tails that sink the paired t-test and to the
    cross-user scale differences that sink unpaired comparisons
    (events_weekend_effect tests populations; this pairs WITHIN
    users).

    Exactness: per-user totals are exact micro BIGINTs (conditional
    sums, portable epoch-day weekend rule), the signed difference is
    their integer gap, and average tie-ranks of |d| come ×2 from
    `distributed_avg_ranks` — so W⁺, W⁻, and the tie term Σ(t³−t) are
    exact BIGINTs; the normal-approximation z is one final double
    expression with the standard tie-corrected variance
    n(n+1)(2n+1)/24 − Σ(t³−t)/48.

    Scale: events collapse to the user relation in one pass; rank
    arithmetic runs two-phase on the distinct-|d| relation — no
    partition-less window even though |d| is user-cardinality.  The
    per-user diff relation feeds the rank primitive's four reads
    (values, bounds, histogram, rank join), so it persists — the
    events shuffle runs once."""
    from faconne_spark.operators.dedup import track_persist
    from faconne_spark.operators.evalstats import wilcoxon_signed_rank

    per_user = track_persist(
        T(spark, sf, "events")
        .select(
            "user_id",
            F.expr(
                "cast(datediff(to_date(ts), DATE'1970-01-01') % 7 as int)"
                " in (2, 3)"
            ).alias("wknd"),
            F.expr("cast(floor(value * 1000000 + 0.5) as bigint)").alias(
                "us"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("if(wknd, us, 0)")).alias("s_we"),
            F.sum(F.expr("if(wknd, 0, us)")).alias("s_wd"),
        )
        .select(F.expr("s_we - s_wd").alias("d"))
    )
    return wilcoxon_signed_rank(per_user, "d").select(
        F.col("n_nonzero").alias("n_users_nonzero"),
        "w_plus_2x",
        "w_minus_2x",
        "tie_sum",
        "z_stat",
    )


ORACLE_WILCOXON = """
WITH per_user AS (
  SELECT user_id,
         sum(CASE WHEN (ts::DATE - DATE '1970-01-01') % 7 IN (2, 3)
                  THEN floor(value * 1000000 + 0.5)::BIGINT
                  ELSE 0 END)::BIGINT
         - sum(CASE WHEN (ts::DATE - DATE '1970-01-01') % 7 IN (2, 3)
                    THEN 0
                    ELSE floor(value * 1000000 + 0.5)::BIGINT
                    END)::BIGINT AS d
  FROM events GROUP BY 1),
nz AS (SELECT d FROM per_user WHERE d != 0),
ranked AS (
  SELECT d,
         2 * rank() OVER (ORDER BY abs(d))
           + count(*) OVER (PARTITION BY abs(d)) - 1 AS avg2_rank,
         count(*) OVER (PARTITION BY abs(d)) AS t
  FROM nz),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN d > 0 THEN avg2_rank ELSE 0 END)::BIGINT AS w2p,
         sum(CASE WHEN d < 0 THEN avg2_rank ELSE 0 END)::BIGINT AS w2m,
         sum(t * t - 1)::BIGINT AS tie_sum
  FROM ranked)
SELECT n AS n_users_nonzero, w2p AS w_plus_2x, w2m AS w_minus_2x,
       tie_sum,
       CASE WHEN n >= 2 AND n::DOUBLE * (n + 1) * (2 * n + 1) / 24.0
                            - tie_sum::DOUBLE / 48.0 > 0 THEN
         round((w2p::DOUBLE / 2.0 - n::DOUBLE * (n + 1) / 4.0)
               / sqrt(n::DOUBLE * (n + 1) * (2 * n + 1) / 24.0
                      - tie_sum::DOUBLE / 48.0), 6) + 0.0 END AS z_stat
FROM agg
"""

QUERIES["events_weekend_wilcoxon"] = events_weekend_wilcoxon
ORACLES["events_weekend_wilcoxon"] = ORACLE_WILCOXON

# =================================================================
# wave 4: ordinal association, profile correlation, extreme values,
# lexical richness, parametric fit — plus the GIF/silence multimodal
# pair (operators in operators/multimodal.py)
# =================================================================


# ------------------------------------------- Goodman–Kruskal gamma

def orders_priority_value_gamma(spark, sf):
    """Goodman–Kruskal γ between order priority (ordinal 1-URGENT …
    5-LOW) and order-value quintile — the ordinal↔ordinal association
    member of the family (χ² is order-blind; the Cochran–Armitage key
    tests ONE binary against an ordinal; γ asks whether two full
    orderings agree): γ = (C − D)/(C + D) over concordant/discordant
    pairs.

    Exactness: quintiles come from distributed_ntile on exact cents
    (no partition-less window; both engines' ntile semantics — first
    N mod k tiles get one extra row — agree by definition); C and D
    are exact BIGINT sums over the ≤ 25² cell-pair join of the
    contingency relation; γ is one rounded double division.

    Scale: one orders pass to cells (the ntile's bucket machinery is
    broadcast-sized); the pair join runs on ≤ 25 rows — the cell
    relation persists so both join sides read one materialization
    instead of re-running the ntile."""
    from faconne_spark.operators.dedup import track_persist
    from faconne_spark.operators.relational import distributed_ntile

    orders = T(spark, sf, "orders").select(
        F.expr("cast(substr(o_orderpriority, 1, 1) as int)").alias("pr"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias(
            "cents"
        ),
        "o_orderkey",
    )
    tiled = distributed_ntile(
        orders, "cents", (F.asc("cents"), F.asc("o_orderkey")), 5,
        tile_col="q",
    )
    cells = track_persist(
        tiled.groupBy("pr", "q").agg(F.count("*").alias("n"))
    )
    a = cells.select(
        F.col("pr").alias("pa"), F.col("q").alias("qa"), F.col("n").alias("na")
    )
    b = cells.select(
        F.col("pr").alias("pb"), F.col("q").alias("qb"), F.col("n").alias("nb")
    )
    pairs = a.join(F.broadcast(b), F.col("pa") < F.col("pb"))
    return pairs.groupBy().agg(
        F.expr("sum(na * nb)").cast("long").alias("n_cross_pairs"),
        F.sum(F.expr("if(qa < qb, na * nb, 0)")).cast("long").alias(
            "concordant"
        ),
        F.sum(F.expr("if(qa > qb, na * nb, 0)")).cast("long").alias(
            "discordant"
        ),
        F.expr(
            "case when sum(if(qa < qb, na * nb, 0))"
            " + sum(if(qa > qb, na * nb, 0)) > 0 then"
            " round(cast(sum(if(qa < qb, na * nb, 0))"
            " - sum(if(qa > qb, na * nb, 0)) as double)"
            " / (sum(if(qa < qb, na * nb, 0))"
            " + sum(if(qa > qb, na * nb, 0))), 6) + 0.0 end"
        ).alias("gamma"),
    )


ORACLE_PRIORITY_GAMMA = """
WITH o AS (
  SELECT substr(o_orderpriority, 1, 1)::INTEGER AS pr,
         floor(o_totalprice * 100 + 0.5)::BIGINT AS cents,
         o_orderkey
  FROM orders),
tiled AS (
  SELECT pr, ntile(5) OVER (ORDER BY cents, o_orderkey) AS q FROM o),
cells AS (
  SELECT pr, q, count(*)::BIGINT AS n FROM tiled GROUP BY 1, 2),
pairs AS (
  SELECT a.n AS na, b.n AS nb, a.q AS qa, b.q AS qb
  FROM cells a JOIN cells b ON a.pr < b.pr)
SELECT sum(na * nb)::BIGINT AS n_cross_pairs,
       sum(CASE WHEN qa < qb THEN na * nb ELSE 0 END)::BIGINT AS concordant,
       sum(CASE WHEN qa > qb THEN na * nb ELSE 0 END)::BIGINT AS discordant,
       CASE WHEN sum(CASE WHEN qa < qb THEN na * nb ELSE 0 END)
               + sum(CASE WHEN qa > qb THEN na * nb ELSE 0 END) > 0 THEN
         round((sum(CASE WHEN qa < qb THEN na * nb ELSE 0 END)
                - sum(CASE WHEN qa > qb THEN na * nb ELSE 0 END))::DOUBLE
               / (sum(CASE WHEN qa < qb THEN na * nb ELSE 0 END)
                  + sum(CASE WHEN qa > qb THEN na * nb ELSE 0 END)), 6)
         + 0.0 END AS gamma
FROM pairs
"""

QUERIES["orders_priority_value_gamma"] = orders_priority_value_gamma
ORACLES["orders_priority_value_gamma"] = ORACLE_PRIORITY_GAMMA


# -------------------------------------- hourly profile correlation

def events_hourly_profile_correlation(spark, sf):
    """Pairwise Pearson correlation between event types' 24-hour
    activity profiles (zero-filled — a type dark at 3 a.m. is a real
    zero, and dropping the hour would inflate every correlation):
    which behaviors share a daily rhythm, the first read before
    reusing one type's seasonal model for another.

    Exactness: all five moment sums over the FIXED 24-hour grid are
    integer counts (n = 24 a constant), so r is one final double
    expression from exact BIGINTs; NULL when either profile is
    constant.

    Scale: one events pass to (type, hour) counts; the grid build and
    the pair join run on ≤ types×24 rows — broadcast territory."""
    counts = (
        T(spark, sf, "events")
        .groupBy("event_type", F.expr("hour(ts)").alias("hr"))
        .agg(F.count("*").alias("c"))
    )
    grid = (
        counts.select("event_type")
        .distinct()
        .select("event_type", F.explode(F.expr("sequence(0, 23)")).alias("hr"))
        .join(counts, ["event_type", "hr"], "left")
        .select(
            "event_type", "hr", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    a = grid.select(
        F.col("event_type").alias("ta"), "hr", F.col("c").alias("ca")
    )
    b = grid.select(
        F.col("event_type").alias("tb"), "hr", F.col("c").alias("cb")
    )
    m = (
        a.join(b, "hr")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(
            F.sum("ca").alias("sx"),
            F.sum("cb").alias("sy"),
            F.sum(F.expr("ca * cb")).alias("sxy"),
            F.sum(F.expr("ca * ca")).alias("sxx"),
            F.sum(F.expr("cb * cb")).alias("syy"),
        )
    )
    num = "(24 * sxy - sx * sy)"
    vx = "(24 * sxx - sx * sx)"
    vy = "(24 * syy - sy * sy)"
    return m.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("sx").cast("long").alias("n_events_a"),
        F.col("sy").cast("long").alias("n_events_b"),
        F.expr(
            f"case when {vx} > 0 and {vy} > 0 then"
            f" round(cast({num} as double)"
            f" / sqrt(cast({vx} as double) * cast({vy} as double)), 6)"
            f" + 0.0 end"
        ).alias("pearson_r"),
    )


ORACLE_HOURLY_PROFILE_CORR = """
WITH counts AS (
  SELECT event_type, hour(ts) AS hr, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
grid AS (
  SELECT t.event_type, h.hr, coalesce(c.c, 0)::BIGINT AS c
  FROM (SELECT DISTINCT event_type FROM counts) t
  CROSS JOIN (SELECT unnest(range(0, 24)) AS hr) h
  LEFT JOIN counts c ON c.event_type = t.event_type AND c.hr = h.hr),
m AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         sum(a.c)::BIGINT AS sx, sum(b.c)::BIGINT AS sy,
         sum(a.c * b.c)::BIGINT AS sxy,
         sum(a.c * a.c)::BIGINT AS sxx,
         sum(b.c * b.c)::BIGINT AS syy
  FROM grid a JOIN grid b ON a.hr = b.hr AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT ta AS type_a, tb AS type_b, sx AS n_events_a, sy AS n_events_b,
       CASE WHEN 24 * sxx - sx * sx > 0 AND 24 * syy - sy * sy > 0 THEN
         round((24 * sxy - sx * sy)::DOUBLE
               / sqrt((24 * sxx - sx * sx)::DOUBLE
                      * (24 * syy - sy * sy)::DOUBLE), 6) + 0.0 END
         AS pearson_r
FROM m
"""

QUERIES["events_hourly_profile_correlation"] = events_hourly_profile_correlation
ORACLES["events_hourly_profile_correlation"] = ORACLE_HOURLY_PROFILE_CORR

# ------------------------------------------- monthly-max Gumbel fit

def events_monthly_max_gumbel(spark, sf):
    """Extreme-value readout per event type: the monthly block maxima
    of value, fit to a Gumbel distribution by the method of moments
    (β = s·√6/π, μ = m − γ·β with γ Euler–Mascheroni), plus the
    implied 12-month return level μ − β·ln(−ln(1 − 1/12)) — "the
    value you should see exceeded about once a year".  Means and
    percentiles describe the middle; capacity limits and fraud
    thresholds live in the tail, and block-maxima fitting is the
    classical way to read it (Gumbel 1958).

    Exactness: block maxima are exact micro BIGINTs (max of exact
    integers); the moment sums S, Q run in BIGINT/DECIMAL(38,0); μ, β
    and the return level are final-expression doubles both engines
    derive from identical integers, NULL when fewer than 2 months.

    Scale: one events pass to (type, month) maxima (map-side
    combine), then ≤ types×months arithmetic."""
    mx = (
        T(spark, sf, "events")
        .groupBy(
            "event_type", F.expr("trunc(to_date(ts), 'MM')").alias("m")
        )
        .agg(
            F.max(
                F.expr("cast(floor(value * 1000000 + 0.5) as bigint)")
            ).alias("mx")
        )
    )
    per_type = mx.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("mx").alias("s"),
        F.sum(
            F.col("mx").cast("decimal(38,0)") * F.col("mx").cast("decimal(38,0)")
        ).alias("q"),
    )
    mean = "(cast(s as double) / n / 1e6)"
    sd = (
        "sqrt((cast(n as double) * cast(q as double)"
        " - cast(s as double) * cast(s as double))"
        " / (cast(n as double) * (n - 1))) / 1e6"
    )
    beta = f"({sd} * sqrt(6.0) / pi())"
    mu = f"({mean} - 0.5772156649015329 * {beta})"
    return per_type.select(
        "event_type",
        F.col("n").cast("long").alias("n_months"),
        F.expr(
            f"case when n >= 2 then round({mu}, 6) + 0.0 end"
        ).alias("gumbel_mu"),
        F.expr(
            f"case when n >= 2 then round({beta}, 6) + 0.0 end"
        ).alias("gumbel_beta"),
        F.expr(
            f"case when n >= 2 then round({mu} - {beta}"
            f" * ln(-ln(cast(11 as double) / 12)), 6) + 0.0 end"
        ).alias("return_level_12m"),
    )


ORACLE_MONTHLY_MAX_GUMBEL = """
WITH mx AS (
  SELECT event_type, date_trunc('month', ts::DATE)::DATE AS m,
         max(floor(value * 1000000 + 0.5)::BIGINT) AS mx
  FROM events GROUP BY 1, 2),
per_type AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(mx)::BIGINT AS s,
         sum(mx::DECIMAL(38,0) * mx::DECIMAL(38,0)) AS q
  FROM mx GROUP BY 1)
SELECT event_type, n AS n_months,
       CASE WHEN n >= 2 THEN
         round(s::DOUBLE / n / 1e6
               - 0.5772156649015329
                 * (sqrt((n::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE)
                         / (n::DOUBLE * (n - 1))) / 1e6
                    * sqrt(6.0) / pi()), 6) + 0.0 END AS gumbel_mu,
       CASE WHEN n >= 2 THEN
         round(sqrt((n::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE)
                    / (n::DOUBLE * (n - 1))) / 1e6
               * sqrt(6.0) / pi(), 6) + 0.0 END AS gumbel_beta,
       CASE WHEN n >= 2 THEN
         round(s::DOUBLE / n / 1e6
               - 0.5772156649015329
                 * (sqrt((n::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE)
                         / (n::DOUBLE * (n - 1))) / 1e6
                    * sqrt(6.0) / pi())
               - (sqrt((n::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE)
                       / (n::DOUBLE * (n - 1))) / 1e6
                  * sqrt(6.0) / pi())
                 * ln(-ln(cast(11 as double) / 12)), 6) + 0.0 END
         AS return_level_12m
FROM per_type
"""

QUERIES["events_monthly_max_gumbel"] = events_monthly_max_gumbel
ORACLES["events_monthly_max_gumbel"] = ORACLE_MONTHLY_MAX_GUMBEL


# ------------------------------------------------------ hapax rate

def docs_hapax_rate(spark, sf):
    """Hapax legomena per source: vocabulary size, once-only word
    count, and the hapax share of the vocabulary — the lexical-
    richness tile between TTR (one ratio) and the Heaps curve (the
    whole trajectory).  Zipf's law pins the healthy share near 0.4-0.6
    (Baayen 2001); a source far BELOW is template/boilerplate text, a
    source far above is OCR noise or ID soup — both are curation
    signals before any frequency-trained model sees the source.

    Exactness: pure integer counting (word counts, count-of-counts);
    the share is one half-up micro division.

    Scale: one tokenize+count shuffle to (source, word) cells, then a
    per-source rollup — the docs_word_dispersion_dp relation reused
    at a different cut."""
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "spark")
    cnt = (
        T(spark, sf, "documents")
        .select("source", F.explode(F.expr(toks)).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    return cnt.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("vocab"),
        F.sum(F.expr("if(c = 1, 1, 0)")).cast("long").alias("hapax"),
        F.expr(
            "cast((2000000 * sum(if(c = 1, 1, 0)) + count(*))"
            " div (2 * count(*)) as bigint)"
        ).alias("hapax_vocab_share_micro"),
    )


def _oracle_hapax_rate() -> str:
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    return f"""
WITH cnt AS (
  SELECT source, w, count(*)::BIGINT AS c
  FROM (SELECT source, unnest({toks}) AS w FROM documents)
  GROUP BY 1, 2)
SELECT source, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
       sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax,
       ((2000000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) + count(*))
        // (2 * count(*)))::BIGINT AS hapax_vocab_share_micro
FROM cnt GROUP BY 1
"""


QUERIES["docs_hapax_rate"] = docs_hapax_rate
ORACLES["docs_hapax_rate"] = _oracle_hapax_rate()


# ------------------------------------------- lognormal length fit

def docs_length_lognormal_fit(spark, sf):
    """Lognormal fit of document length per source by ln-moments
    (μ̂, σ̂ of ln n_chars), with the fit's implied median exp(μ̂) next
    to the ACTUAL median — document lengths are canonically lognormal
    (a multiplicative growth process), and the gap between the two
    medians is the one-glance misfit check: a mixture of a short
    boilerplate mass and long articles splits them immediately, where
    a histogram needs binning choices to show it.

    Exactness: each document contributes ONE micro-rounded ln of its
    integer n_chars (the per-cell ln rule); S, Q moments in
    BIGINT/DECIMAL(38,0); μ̂ is a half-up integer micro; σ̂ and the
    predicted median are final-expression doubles; the actual median
    is the exact ×2-integer (both engines interpolate even-count
    medians as the midpoint of two integers).

    Scale: map-only ln cells, one per-source rollup + one grouped
    percentile — no windows."""
    cells = T(spark, sf, "documents").filter(F.col("n_chars") > 0).select(
        "source",
        "n_chars",
        F.expr(
            "cast(floor(ln(cast(n_chars as double)) * 1000000 + 0.5)"
            " as bigint)"
        ).alias("l"),
    )
    return cells.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr(
            "cast((2 * sum(l) + count(*)) div (2 * count(*)) as bigint)"
        ).alias("mu_micro"),
        F.expr(
            "case when count(*) >= 2 then"
            " round(sqrt((cast(count(*) as double)"
            " * cast(sum(cast(l as decimal(38,0))"
            " * cast(l as decimal(38,0))) as double)"
            " - cast(sum(l) as double) * cast(sum(l) as double))"
            " / (cast(count(*) as double) * (count(*) - 1))) / 1e6, 6)"
            " + 0.0 end"
        ).alias("sigma"),
        F.expr(
            "round(exp(cast(sum(l) as double) / count(*) / 1e6), 3) + 0.0"
        ).alias("median_pred"),
        F.expr(
            "cast(floor(2 * percentile(n_chars, 0.5) + 0.5) as bigint)"
        ).alias("median_actual_x2"),
    )


ORACLE_LOGNORMAL_FIT = """
WITH cells AS (
  SELECT source, n_chars,
         floor(ln(n_chars::DOUBLE) * 1000000 + 0.5)::BIGINT AS l
  FROM documents WHERE n_chars > 0)
SELECT source, count(*)::BIGINT AS n_docs,
       ((2 * sum(l) + count(*)) // (2 * count(*)))::BIGINT AS mu_micro,
       CASE WHEN count(*) >= 2 THEN
         round(sqrt((count(*)::DOUBLE
                     * sum(l::DECIMAL(38,0) * l::DECIMAL(38,0))::DOUBLE
                     - sum(l)::DOUBLE * sum(l)::DOUBLE)
                    / (count(*)::DOUBLE * (count(*) - 1))) / 1e6, 6)
         + 0.0 END AS sigma,
       round(exp(sum(l)::DOUBLE / count(*) / 1e6), 3) + 0.0 AS median_pred,
       floor(2 * quantile_cont(n_chars, 0.5) + 0.5)::BIGINT
         AS median_actual_x2
FROM cells GROUP BY 1
"""

QUERIES["docs_length_lognormal_fit"] = docs_length_lognormal_fit
ORACLES["docs_length_lognormal_fit"] = ORACLE_LOGNORMAL_FIT

# ---------------------------------------- GIF decode through the gate

def mm_gif_decode(spark, sf):
    """REAL GIF87a decode end-to-end through the gate: one grayscale
    GIF per document (identity-ramp palette, w/h up to 31 so the LZW
    dictionary crosses the 512 and 1024 code-width boundaries on most
    payloads), pixels = md5(text) tiled.  Every payload crosses the
    full container walk + sub-block reassembly + variable-width
    LSB-first LZW decode (operators/multimodal.py gif_encode /
    gif_pixels); the oracle replays the decoded pixel sum in closed
    form from the md5 hex digits — any bit-unpacking, width-bump
    sync, or dictionary slip shifts the sum.  GIF completes the
    lossless-image set next to BMP and PNG (and JPEG on the transform
    side): the four dominant legacy web-image containers all decode
    for real with zero dependencies."""
    from faconne_spark.operators import multimodal as MM

    docs = T(spark, sf, "documents")
    # optimization r13 (guide §4): fused single Arrow pass
    return MM.fused_media_stats(
        docs, MM.gif_payload_for_doc, MM.gif_pixel_stats_row,
        MM.PNG_STATS_SCHEMA,
    )


def _oracle_gif_decode() -> str:
    hexb = (
        "((strpos('0123456789abcdef', substr(md5(text), {p}, 1)) - 1) * 16"
        " + strpos('0123456789abcdef', substr(md5(text), {p1}, 1)) - 1)"
    )
    b = [hexb.format(p=2 * i + 1, p1=2 * i + 2) for i in range(16)]
    tile_sum = " + ".join(
        f"{b[i]} * (n // 16 + CASE WHEN {i} < n % 16 THEN 1 ELSE 0 END)"
        for i in range(16)
    )
    return f"""
WITH dims AS (
  SELECT doc_id,
         (8 + {b[0]} % 24) AS w,
         (8 + {b[1]} % 24) AS h,
         text
  FROM documents),
sized AS (
  SELECT doc_id, w, h, (w * h)::BIGINT AS n, text FROM dims)
SELECT doc_id, w::INTEGER AS width, h::INTEGER AS height,
       n AS n_px_bytes,
       ({tile_sum})::BIGINT AS pixel_sum
FROM sized
"""


QUERIES["mm_gif_decode"] = mm_gif_decode
ORACLES["mm_gif_decode"] = _oracle_gif_decode()


# ------------------------------------- WAV silence runs through the gate

def mm_audio_silence_runs(spark, sf):
    """Silence-run segmentation (VAD-lite) proven through the gate:
    synthesize_wav_segments plants an alternating silence/tone
    segment map derived from md5(text) inside a REAL RIFF/WAVE
    payload; extract_wav_silence_runs must recover the run structure
    from raw decoded PCM (threshold + run-length over int16 samples,
    numpy inside the Arrow batch) and the oracle replays the expected
    runs in closed form from the md5 hex digits — run count, longest
    run, and the half-up micro silence share all have to survive the
    container walk and the boundary detection exactly."""
    from faconne_spark.operators import multimodal as MM

    docs = T(spark, sf, "documents")
    return MM.extract_wav_silence_runs(MM.synthesize_wav_segments(docs))


def _oracle_silence_runs() -> str:
    hexb = (
        "((strpos('0123456789abcdef', substr(md5(text), {p}, 1)) - 1) * 16"
        " + strpos('0123456789abcdef', substr(md5(text), {p1}, 1)) - 1)"
    )
    b = [hexb.format(p=2 * i + 1, p1=2 * i + 2) for i in range(16)]
    # segment i (0..6): exists iff i < n_seg; length 8 + b[2+i] % 24;
    # silent iff (i + b[1]) even
    seg_len = [f"(8 + {b[2 + i]} % 24)" for i in range(7)]
    silent = [f"(({i} + {b[1]}) % 2 = 0)" for i in range(7)]
    exists = [f"({i} < n_seg)" for i in range(7)]
    total = " + ".join(
        f"CASE WHEN {exists[i]} THEN {seg_len[i]} ELSE 0 END"
        for i in range(7)
    )
    silent_total = " + ".join(
        f"CASE WHEN {exists[i]} AND {silent[i]} THEN {seg_len[i]} ELSE 0 END"
        for i in range(7)
    )
    n_runs = " + ".join(
        f"CASE WHEN {exists[i]} AND {silent[i]} THEN 1 ELSE 0 END"
        for i in range(7)
    )
    longest = "greatest(" + ", ".join(
        f"CASE WHEN {exists[i]} AND {silent[i]} THEN {seg_len[i]} ELSE 0 END"
        for i in range(7)
    ) + ")"
    return f"""
WITH segs AS (
  SELECT doc_id, (3 + {b[0]} % 4) AS n_seg, text FROM documents),
m AS (
  SELECT doc_id,
         ({total})::BIGINT AS n_samples,
         ({silent_total})::BIGINT AS silent_total,
         ({n_runs})::BIGINT AS n_silence_runs,
         ({longest})::BIGINT AS longest_silence_run
  FROM segs)
SELECT doc_id, n_samples, n_silence_runs, longest_silence_run,
       ((2 * 1000000 * silent_total + n_samples)
        // (2 * n_samples))::BIGINT AS silence_share_micro
FROM m
"""


QUERIES["mm_audio_silence_runs"] = mm_audio_silence_runs
ORACLES["mm_audio_silence_runs"] = _oracle_silence_runs()

# =================================================================
# wave 5: tail/shape statistics and robust trend — power-law MLE,
# rank-biased overlap, ICC, Jarque–Bera, negative-binomial fit,
# Theil–Sen slope
# =================================================================


# ------------------------------------------- discrete power-law MLE

def events_user_degree_powerlaw_mle(spark, sf):
    """Clauset–Shalizi–Newman MLE for the power-law exponent of the
    user activity distribution (events per user, tail k ≥ 5):
    α̂ = 1 + n / Σ ln(k/(k_min − ½)) with its standard error
    (α̂−1)/√n — the principled version of the log-log-regression
    slope everyone eyeballs, and the companion to the Hill estimator
    key (hill reads the continuous VALUE tail; this reads the
    discrete DEGREE tail).

    Exactness: per-user counts are integers; each tail user
    contributes ONE micro-rounded ln of the exact rational 2k/9; the
    sum is BIGINT and α̂ is one final double.

    Scale: one events pass to per-user counts, one filtered rollup."""
    per_user = (
        T(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") >= 5)
        .select(
            F.expr(
                "cast(floor(ln(cast(2 * k as double) / 9.0) * 1000000"
                " + 0.5) as bigint)"
            ).alias("l")
        )
    )
    return per_user.groupBy().agg(
        F.count("*").cast("long").alias("n_users_tail"),
        F.lit(5).cast("long").alias("k_min"),
        F.expr(
            "case when sum(l) > 0 then"
            " round(1.0 + cast(count(*) as double) * 1000000 / sum(l), 6)"
            " + 0.0 end"
        ).alias("alpha"),
        F.expr(
            "case when sum(l) > 0 and count(*) > 0 then"
            " round((cast(count(*) as double) * 1000000 / sum(l))"
            " / sqrt(cast(count(*) as double)), 6) + 0.0 end"
        ).alias("alpha_se"),
    )


ORACLE_POWERLAW_MLE = """
WITH per_user AS (
  SELECT floor(ln((2 * count(*))::DOUBLE / 9.0) * 1000000 + 0.5)::BIGINT
           AS l
  FROM events GROUP BY user_id HAVING count(*) >= 5)
SELECT count(*)::BIGINT AS n_users_tail, 5::BIGINT AS k_min,
       CASE WHEN sum(l) > 0 THEN
         round(1.0 + count(*)::DOUBLE * 1000000 / sum(l), 6) + 0.0 END
         AS alpha,
       CASE WHEN sum(l) > 0 AND count(*) > 0 THEN
         round((count(*)::DOUBLE * 1000000 / sum(l))
               / sqrt(count(*)::DOUBLE), 6) + 0.0 END AS alpha_se
FROM per_user
"""

QUERIES["events_user_degree_powerlaw_mle"] = events_user_degree_powerlaw_mle
ORACLES["events_user_degree_powerlaw_mle"] = ORACLE_POWERLAW_MLE


# --------------------------------------------- rank-biased overlap

# RBO_min tail weights (Webber 2010, p = 0.9, depth K = 50): a word
# whose WORSE rank across the two lists is m contributes
# W[m] = Σ_{d=m}^{K} p^(d−1)/d to Σ — precomputed here and injected
# into BOTH engines as integer micro literals, so the geometric
# series never runs as floating-point accumulation inside either.
_RBO_P, _RBO_K = 0.9, 50
_RBO_W = []
for _m in range(1, _RBO_K + 1):
    _RBO_W.append(
        int(
            round(
                sum(
                    _RBO_P ** (d - 1) / d for d in range(_m, _RBO_K + 1)
                )
                * 1_000_000
            )
        )
    )


def docs_source_topword_rbo(spark, sf):
    """Rank-biased overlap (RBO_min, Webber et al. 2010; p = 0.9,
    depth 50) between every two sources' top-50 word RANKINGS — the
    rank-aware companion to vocab-overlap (set-blind) and unigram-JSD
    (rank-blind): two sources can share every top word and still
    order them so differently that a frequency-tuned heuristic
    transfers badly.  Top-weighted by construction: agreement at rank
    1 counts ~10× rank 30.

    Exactness: per-source ranks come from a SOURCE-PARTITIONED window
    (count desc, word — deterministic ties); each shared top-50 word
    contributes the precomputed integer micro weight W[max(ra, rb)];
    the sum is BIGINT and the final ×(1−p) is one half-up division
    by 10.

    Scale: one tokenize+count shuffle; ranking and the pair join run
    on ≤ sources×50 rows."""
    from pyspark.sql import Window as W

    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "spark")
    cnt = (
        T(spark, sf, "documents")
        .select("source", F.explode(F.expr(toks)).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    win = W.partitionBy("source").orderBy(F.desc("c"), F.asc("w"))
    top = cnt.withColumn("r", F.row_number().over(win)).filter(
        F.col("r") <= _RBO_K
    )
    a = top.select(
        F.col("source").alias("sa"), "w", F.col("r").alias("ra")
    )
    b = top.select(
        F.col("source").alias("sb"), "w", F.col("r").alias("rb")
    )
    wcase = "case greatest(ra, rb) " + " ".join(
        f"when {m} then {_RBO_W[m - 1]}" for m in range(1, _RBO_K + 1)
    ) + " end"
    pairs = a.join(b, "w").filter(F.col("sa") < F.col("sb"))
    return pairs.groupBy("sa", "sb").agg(
        F.count("*").cast("long").alias("n_common_top50"),
        F.expr(
            f"cast((2 * sum({wcase}) + 10) div 20 as bigint)"
        ).alias("rbo_min_micro"),
    ).select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        "n_common_top50",
        "rbo_min_micro",
    )


def _oracle_topword_rbo() -> str:
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    wcase = "CASE greatest(a.r, b.r) " + " ".join(
        f"WHEN {m} THEN {_RBO_W[m - 1]}" for m in range(1, _RBO_K + 1)
    ) + " END"
    return f"""
WITH cnt AS (
  SELECT source, w, count(*)::BIGINT AS c
  FROM (SELECT source, unnest({toks}) AS w FROM documents)
  GROUP BY 1, 2),
top AS (
  SELECT source, w,
         row_number() OVER (PARTITION BY source ORDER BY c DESC, w ASC)
           AS r
  FROM cnt QUALIFY r <= {_RBO_K})
SELECT a.source AS source_a, b.source AS source_b,
       count(*)::BIGINT AS n_common_top50,
       ((2 * sum({wcase}) + 10) // 20)::BIGINT AS rbo_min_micro
FROM top a JOIN top b ON a.w = b.w AND a.source < b.source
GROUP BY 1, 2
"""


QUERIES["docs_source_topword_rbo"] = docs_source_topword_rbo
ORACLES["docs_source_topword_rbo"] = _oracle_topword_rbo()


# ------------------------------------------------ intraclass correlation

def customer_order_value_icc(spark, sf):
    """ICC(1) of order value within customers (one-way random
    effects, Shrout & Fleiss 1979): how much of order-value variance
    is BETWEEN customers vs noise within a customer — the
    repeatability number that says whether "customer value" is a
    stable trait worth segmenting on (ICC → 0: every order is a coin
    flip; ICC → 1: one order tells you the customer).  Uses the
    unbalanced-design group size k₀ = (N − Σn²/N)/(J−1).

    Exactness: oneway_anova's integer-term discipline inline (cents
    moments in BIGINT/DECIMAL(38,0), per-customer between/within
    cells micro-rounded to ONE BIGINT each before the sum), plus an
    exact Σn² BIGINT; ICC, k₀ and F are final-expression doubles.

    Scale: one orders shuffle to per-customer moments; everything
    after aggregates the customer relation."""
    g = (
        T(spark, sf, "orders")
        .select(
            "o_custkey",
            F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias(
                "v"
            ),
        )
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.sum(
                F.col("v").cast("decimal(38,0)") * F.col("v").cast("decimal(38,0)")
            ).alias("ss"),
        )
    )
    tot = g.agg(
        F.sum("n").alias("nt"),
        F.sum("s").alias("st"),
        F.count("*").alias("j"),
        F.sum(F.expr("n * n")).alias("sn2"),
    )
    terms = g.crossJoin(F.broadcast(tot)).select(
        "j",
        "nt",
        "sn2",
        F.expr(
            "cast(round(cast(n as double)"
            " * pow(cast(s as double) / cast(n as double)"
            "       - cast(st as double) / cast(nt as double), 2)"
            " / 1000000.0, 0) as bigint)"
        ).alias("b"),
        F.expr(
            "cast(round((cast(ss as double)"
            " - cast(s as double) * cast(s as double) / cast(n as double))"
            " / 1000000.0, 0) as bigint)"
        ).alias("w"),
    )
    msb = "(cast(sum(b) as double) / (max(j) - 1))"
    msw = "(cast(sum(w) as double) / (max(nt) - max(j)))"
    k0 = (
        "((cast(max(nt) as double)"
        " - cast(max(sn2) as double) / max(nt)) / (max(j) - 1))"
    )
    ok = "max(j) >= 2 and max(nt) > max(j) and sum(w) > 0"
    return terms.groupBy().agg(
        F.max("j").cast("long").alias("n_customers"),
        F.max("nt").cast("long").alias("n_orders"),
        F.expr(f"round({k0}, 6) + 0.0").alias("k0"),
        F.expr(
            f"case when {ok} then round({msb} / {msw}, 6) + 0.0 end"
        ).alias("f_stat"),
        F.expr(
            f"case when {ok} then round(({msb} - {msw})"
            f" / ({msb} + ({k0} - 1.0) * {msw}), 6) + 0.0 end"
        ).alias("icc1"),
    )


ORACLE_ORDER_VALUE_ICC = """
WITH g AS (
  SELECT o_custkey, count(*)::BIGINT AS n,
         sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS s,
         sum(floor(o_totalprice * 100 + 0.5)::BIGINT::DECIMAL(38,0)
             * floor(o_totalprice * 100 + 0.5)::BIGINT::DECIMAL(38,0))
           AS ss
  FROM orders GROUP BY 1),
tot AS (
  SELECT sum(n)::BIGINT AS nt, sum(s)::BIGINT AS st,
         count(*)::BIGINT AS j, sum(n * n)::BIGINT AS sn2
  FROM g),
terms AS (
  SELECT j, nt, sn2,
         round(n::DOUBLE * pow(s::DOUBLE / n::DOUBLE
                               - st::DOUBLE / nt::DOUBLE, 2)
               / 1000000.0, 0)::BIGINT AS b,
         round((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
               / 1000000.0, 0)::BIGINT AS w
  FROM g CROSS JOIN tot)
SELECT max(j)::BIGINT AS n_customers, max(nt)::BIGINT AS n_orders,
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
                      / (max(j) - 1)) - 1.0)
                    * (sum(w)::DOUBLE / (max(nt) - max(j)))), 6) + 0.0 END
         AS icc1
FROM terms
"""

QUERIES["customer_order_value_icc"] = customer_order_value_icc
ORACLES["customer_order_value_icc"] = ORACLE_ORDER_VALUE_ICC

# ------------------------------------------------ Jarque–Bera shape test

def events_value_jarque_bera(spark, sf):
    """Moment-based shape test per event type: skewness, excess
    kurtosis, and the Jarque–Bera statistic n·(S²/6 + K²/24) — the
    quantitative "is it even close to normal?" gate in front of every
    z-test and control chart upstream (a JB in the thousands says the
    Welch z's nominal coverage is fiction; use the rank keys).

    Exactness: four raw power sums over exact centi-unit integers
    (S₁ BIGINT, S₂-S₄ DECIMAL(38,0) — v⁴ ≈ 10¹⁶ per row keeps the sum
    inside 38 digits through sf10); central moments, skew, kurtosis
    and JB are final-expression doubles both engines derive from the
    identical integers.

    Scale: ONE map-side-combined aggregation pass; no joins, no
    windows."""
    ev = T(spark, sf, "events").select(
        "event_type",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("v"),
    )
    d = "cast({x} as double)"
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.expr("cast(v as decimal(38,0)) * v")).alias("s2"),
        F.sum(F.expr("cast(v as decimal(38,0)) * v * v")).alias("s3"),
        F.sum(F.expr("cast(v as decimal(38,0)) * v * v * v")).alias("s4"),
    )
    mean = f"({d.format(x='s1')} / n)"
    m2 = f"({d.format(x='s2')} / n - {mean} * {mean})"
    m3 = (
        f"({d.format(x='s3')} / n - 3 * {mean} * {d.format(x='s2')} / n"
        f" + 2 * {mean} * {mean} * {mean})"
    )
    m4 = (
        f"({d.format(x='s4')} / n - 4 * {mean} * {d.format(x='s3')} / n"
        f" + 6 * {mean} * {mean} * {d.format(x='s2')} / n"
        f" - 3 * {mean} * {mean} * {mean} * {mean})"
    )
    skew = f"({m3} / pow({m2}, 1.5))"
    kurt = f"({m4} / ({m2} * {m2}) - 3.0)"
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.expr(f"round({mean} / 100.0, 6) + 0.0").alias("mean_value"),
        F.expr(
            f"case when {m2} > 0 then round({skew}, 6) + 0.0 end"
        ).alias("skewness"),
        F.expr(
            f"case when {m2} > 0 then round({kurt}, 6) + 0.0 end"
        ).alias("ex_kurtosis"),
        F.expr(
            f"case when {m2} > 0 then"
            f" round(n * ({skew} * {skew} / 6.0"
            f" + {kurt} * {kurt} / 24.0), 6) + 0.0 end"
        ).alias("jarque_bera"),
    )


def _oracle_jarque_bera() -> str:
    mean = "(s1::DOUBLE / n)"
    m2 = f"(s2::DOUBLE / n - {mean} * {mean})"
    m3 = (
        f"(s3::DOUBLE / n - 3 * {mean} * s2::DOUBLE / n"
        f" + 2 * {mean} * {mean} * {mean})"
    )
    m4 = (
        f"(s4::DOUBLE / n - 4 * {mean} * s3::DOUBLE / n"
        f" + 6 * {mean} * {mean} * s2::DOUBLE / n"
        f" - 3 * {mean} * {mean} * {mean} * {mean})"
    )
    skew = f"({m3} / pow({m2}, 1.5))"
    kurt = f"({m4} / ({m2} * {m2}) - 3.0)"
    return f"""
WITH ev AS (
  SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS v FROM events),
m AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(v)::BIGINT AS s1,
         sum(v::DECIMAL(38,0) * v) AS s2,
         sum(v::DECIMAL(38,0) * v * v) AS s3,
         sum(v::DECIMAL(38,0) * v * v * v) AS s4
  FROM ev GROUP BY 1)
SELECT event_type, n AS n_events,
       round({mean} / 100.0, 6) + 0.0 AS mean_value,
       CASE WHEN {m2} > 0 THEN round({skew}, 6) + 0.0 END AS skewness,
       CASE WHEN {m2} > 0 THEN round({kurt}, 6) + 0.0 END AS ex_kurtosis,
       CASE WHEN {m2} > 0 THEN
         round(n * ({skew} * {skew} / 6.0 + {kurt} * {kurt} / 24.0), 6)
         + 0.0 END AS jarque_bera
FROM m
"""


QUERIES["events_value_jarque_bera"] = events_value_jarque_bera
ORACLES["events_value_jarque_bera"] = _oracle_jarque_bera()


# --------------------------------------------- negative-binomial fit

def events_user_count_nbd_fit(spark, sf):
    """Negative-binomial fit of per-user event counts by moments
    (p̂ = m/s², r̂ = m²/(s² − m)) — the workhorse count model when the
    Poisson overdispersion key says D ≫ 1 (Ehrenberg's NBD tradition:
    user activity is gamma-heterogeneous Poisson, and r̂ is the
    heterogeneity read-out a frequency planner actually uses).  NULL
    fit when the data is NOT overdispersed (s² ≤ m) — the honest
    refusal, not a clamped number.

    Exactness: per-user counts and their power sums are exact
    BIGINTs; m, s², p̂, r̂ are final-expression doubles.

    Scale: one events pass to per-user counts, one rollup."""
    per_user = (
        T(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("k"))
    )
    m = per_user.groupBy().agg(
        F.count("*").alias("n"),
        F.sum("k").alias("s1"),
        F.sum(F.expr("k * k")).alias("s2"),
    )
    mean = "(cast(s1 as double) / n)"
    var = (
        "((cast(n as double) * s2 - cast(s1 as double) * s1)"
        " / (cast(n as double) * (n - 1)))"
    )
    over = f"{var} > {mean}"
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("s1").cast("long").alias("n_events"),
        F.expr(f"round({mean}, 6) + 0.0").alias("mean_per_user"),
        F.expr(f"round({var}, 6) + 0.0").alias("var_per_user"),
        F.expr(
            f"case when {over} then round({mean} / {var}, 6) + 0.0 end"
        ).alias("p_hat"),
        F.expr(
            f"case when {over} then round({mean} * {mean}"
            f" / ({var} - {mean}), 6) + 0.0 end"
        ).alias("r_hat"),
    )


ORACLE_NBD_FIT = """
WITH per_user AS (
  SELECT count(*)::BIGINT AS k FROM events GROUP BY user_id),
m AS (
  SELECT count(*)::BIGINT AS n, sum(k)::BIGINT AS s1,
         sum(k * k)::BIGINT AS s2
  FROM per_user)
SELECT n AS n_users, s1 AS n_events,
       round(s1::DOUBLE / n, 6) + 0.0 AS mean_per_user,
       round((n::DOUBLE * s2 - s1::DOUBLE * s1)
             / (n::DOUBLE * (n - 1)), 6) + 0.0 AS var_per_user,
       CASE WHEN (n::DOUBLE * s2 - s1::DOUBLE * s1)
                 / (n::DOUBLE * (n - 1)) > s1::DOUBLE / n THEN
         round((s1::DOUBLE / n)
               / ((n::DOUBLE * s2 - s1::DOUBLE * s1)
                  / (n::DOUBLE * (n - 1))), 6) + 0.0 END AS p_hat,
       CASE WHEN (n::DOUBLE * s2 - s1::DOUBLE * s1)
                 / (n::DOUBLE * (n - 1)) > s1::DOUBLE / n THEN
         round((s1::DOUBLE / n) * (s1::DOUBLE / n)
               / ((n::DOUBLE * s2 - s1::DOUBLE * s1)
                  / (n::DOUBLE * (n - 1)) - s1::DOUBLE / n), 6)
         + 0.0 END AS r_hat
FROM m
"""

QUERIES["events_user_count_nbd_fit"] = events_user_count_nbd_fit
ORACLES["events_user_count_nbd_fit"] = ORACLE_NBD_FIT


# --------------------------------------------------- Theil–Sen slope

def orders_monthly_theil_sen(spark, sf):
    """Theil–Sen robust trend of monthly order volume: the median of
    all pairwise month-to-month slopes — the estimator that shrugs
    off the outlier months that wreck an OLS trend line, and the
    magnitude companion to the Mann–Kendall direction test already in
    the registry (MK says "is there a trend?"; Theil–Sen says "how
    steep?").

    Exactness: the month relation is bounded (~80 rows), so the pair
    set (~3 000 slopes) is identical in both engines; each slope is
    one double division of exact integers, and the median is the
    midpoint interpolation both engines apply to the same sorted
    doubles.

    Scale: orders collapse to the month relation in one pass; the
    triangular pair join and the percentile run on a bounded calendar
    relation (persisted — one orders shuffle)."""
    from faconne_spark.operators.dedup import track_persist

    monthly = track_persist(
        T(spark, sf, "orders")
        .groupBy(F.expr("trunc(to_date(o_orderdate), 'MM')").alias("m"))
        .agg(F.count("*").alias("c"))
        .select(
            F.expr("year(m) * 12 + month(m)").alias("idx"), "c"
        )
    )
    a = monthly.select(F.col("idx").alias("ia"), F.col("c").alias("ca"))
    b = monthly.select(F.col("idx").alias("ib"), F.col("c").alias("cb"))
    slopes = a.join(F.broadcast(b), F.col("ia") < F.col("ib")).select(
        F.expr("cast(cb - ca as double) / (ib - ia)").alias("slope")
    )
    return slopes.groupBy().agg(
        F.expr("cast(count(*) as bigint)").alias("n_pairs"),
        F.expr("round(percentile(slope, 0.5), 6) + 0.0").alias(
            "theil_sen_slope"
        ),
    )


ORACLE_THEIL_SEN = """
WITH monthly AS (
  SELECT year(m) * 12 + month(m) AS idx, c
  FROM (SELECT date_trunc('month', o_orderdate::DATE)::DATE AS m,
               count(*)::BIGINT AS c
        FROM orders GROUP BY 1)),
slopes AS (
  SELECT (b.c - a.c)::DOUBLE / (b.idx - a.idx) AS slope
  FROM monthly a JOIN monthly b ON a.idx < b.idx)
SELECT count(*)::BIGINT AS n_pairs,
       round(quantile_cont(slope, 0.5), 6) + 0.0 AS theil_sen_slope
FROM slopes
"""

QUERIES["orders_monthly_theil_sen"] = orders_monthly_theil_sen
ORACLES["orders_monthly_theil_sen"] = ORACLE_THEIL_SEN

# =================================================================
# wave 6: circular statistics, embedding-norm leakage, forensic
# second digit, calendar-structure MI
# =================================================================

# cos/sin of the 24 hour angles (2π·h/24), precomputed as integer
# micro literals injected into BOTH engines — the circular moments
# are then exact BIGINT weighted sums over the hour-count relation,
# never a floating-point trig accumulation inside either engine
import math as _math

_HOUR_COS = [
    int(round(_math.cos(2 * _math.pi * h / 24) * 1_000_000))
    for h in range(24)
]
_HOUR_SIN = [
    int(round(_math.sin(2 * _math.pi * h / 24) * 1_000_000))
    for h in range(24)
]


def events_hour_circular_stats(spark, sf):
    """Circular statistics of event timing on the 24-hour clock per
    type (Fisher 1993): mean direction (peak hour) and the resultant
    length R̄ ∈ [0, 1] — the CORRECT way to average hours (the
    arithmetic mean of 23:00 and 01:00 is noon; the circular mean is
    midnight), and R̄ is the concentration gauge: 0 = activity spread
    uniformly around the clock, 1 = a single spike.

    Exactness: the 24 cos/sin values are precomputed integer micro
    literals; S_c, S_s are exact BIGINT weighted sums over the hour-
    count relation; the mean angle, peak hour and R̄ are
    final-expression doubles (atan2 of two exact integers).

    Scale: one events pass to (type, hour) counts; everything after
    is ≤ types×24 arithmetic."""
    cos_case = "case hr " + " ".join(
        f"when {h} then {_HOUR_COS[h]}" for h in range(24)
    ) + " end"
    sin_case = "case hr " + " ".join(
        f"when {h} then {_HOUR_SIN[h]}" for h in range(24)
    ) + " end"
    counts = (
        T(spark, sf, "events")
        .groupBy("event_type", F.expr("hour(ts)").alias("hr"))
        .agg(F.count("*").alias("c"))
    )
    m = counts.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.sum(F.expr(f"c * ({cos_case})")).alias("sc"),
        F.sum(F.expr(f"c * ({sin_case})")).alias("ss"),
    )
    ang = "atan2(cast(ss as double), cast(sc as double))"
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.expr(
            f"round((({ang}) / (2 * pi()) * 24 + 24) % 24, 6) + 0.0"
        ).alias("peak_hour"),
        F.expr(
            "round(sqrt(cast(sc as double) * sc + cast(ss as double) * ss)"
            " / (cast(n as double) * 1000000), 6) + 0.0"
        ).alias("resultant_length"),
    )


def _oracle_hour_circular() -> str:
    cos_case = "CASE hr " + " ".join(
        f"WHEN {h} THEN {_HOUR_COS[h]}" for h in range(24)
    ) + " END"
    sin_case = "CASE hr " + " ".join(
        f"WHEN {h} THEN {_HOUR_SIN[h]}" for h in range(24)
    ) + " END"
    return f"""
WITH counts AS (
  SELECT event_type, hour(ts) AS hr, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type, sum(c)::BIGINT AS n,
         sum(c * ({cos_case}))::BIGINT AS sc,
         sum(c * ({sin_case}))::BIGINT AS ss
  FROM counts GROUP BY 1)
SELECT event_type, n AS n_events,
       round((atan2(ss::DOUBLE, sc::DOUBLE) / (2 * pi()) * 24 + 24)
             % 24, 6) + 0.0 AS peak_hour,
       round(sqrt(sc::DOUBLE * sc + ss::DOUBLE * ss)
             / (n::DOUBLE * 1000000), 6) + 0.0 AS resultant_length
FROM m
"""


QUERIES["events_hour_circular_stats"] = events_hour_circular_stats
ORACLES["events_hour_circular_stats"] = _oracle_hour_circular()


# ------------------------------------------ embedding-norm leakage

def embed_norm_label_anova(spark, sf):
    """One-way ANOVA of the L2 norm across labels — the norm-leakage
    audit: encoders routinely leak class information into vector
    MAGNITUDE (common-token frequency, caption length), and any
    cosine-based downstream silently discards it while any
    dot-product index silently exploits it.  A large F here says the
    two retrieval modes will DISAGREE on this corpus — decide
    deliberately, before the index is built.

    Exactness: the norm is the same left-to-right fold both engines
    run identically (the embed_norm contract); oneway_anova
    micro-rounds it once and applies the integer-term discipline.

    Scale: map-only norms, one grouped ANOVA pass."""
    from faconne_spark.operators.evalstats import oneway_anova

    emb = T(spark, sf, "embeddings").select(
        "label",
        F.expr(
            "sqrt(aggregate(embedding, cast(0.0 as double),"
            " (a, v) -> a + cast(v as double) * cast(v as double)))"
        ).alias("l2_norm"),
    )
    return oneway_anova(emb, "label", "l2_norm")


ORACLE_NORM_LABEL_ANOVA = """
WITH emb AS (
  SELECT label,
         sqrt(list_sum(list_transform(embedding,
              x -> x::DOUBLE * x::DOUBLE))) AS l2_norm
  FROM embeddings),
g AS (
  SELECT label, count(*)::BIGINT AS n,
         sum(round(l2_norm * 1000000)::BIGINT)::BIGINT AS s,
         sum(round(l2_norm * 1000000)::BIGINT::DECIMAL(38,0)
             * round(l2_norm * 1000000)::BIGINT::DECIMAL(38,0)) AS ss
  FROM emb WHERE l2_norm IS NOT NULL GROUP BY 1),
tot AS (
  SELECT sum(n)::BIGINT AS nt, sum(s)::BIGINT AS st,
         count(*)::BIGINT AS k
  FROM g),
terms AS (
  SELECT k, nt,
         round(n::DOUBLE * pow(s::DOUBLE / n::DOUBLE
                               - st::DOUBLE / nt::DOUBLE, 2)
               / 1000000.0, 0)::BIGINT AS b,
         round((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
               / 1000000.0, 0)::BIGINT AS w
  FROM g CROSS JOIN tot)
SELECT max(k)::BIGINT AS n_groups, max(nt)::BIGINT AS n_rows,
       sum(b)::BIGINT AS ssb_micro, sum(w)::BIGINT AS ssw_micro,
       CASE WHEN max(k) >= 2 AND max(nt) > max(k) AND sum(w) > 0 THEN
         round((sum(b)::DOUBLE / (max(k) - 1))
               / (sum(w)::DOUBLE / (max(nt) - max(k))), 6) + 0.0 END
         AS f_stat,
       CASE WHEN sum(b) + sum(w) > 0 THEN
         round(sum(b)::DOUBLE / (sum(b)::DOUBLE + sum(w)::DOUBLE), 6)
         + 0.0 END AS eta_sq
FROM terms
"""

QUERIES["embed_norm_label_anova"] = embed_norm_label_anova
ORACLES["embed_norm_label_anova"] = ORACLE_NORM_LABEL_ANOVA


# ------------------------------------------- second-digit Benford

# P(second digit = d) = Σ_{k=1..9} log10(1 + 1/(10k + d)) — the
# Newcomb–Benford second-digit law, precomputed as micro literals
_BENFORD2 = [
    int(
        round(
            sum(_math.log10(1 + 1.0 / (10 * k + d)) for k in range(1, 10))
            * 1_000_000
        )
    )
    for d in range(10)
]


def events_benford_second_digit(spark, sf):
    """Second-digit Benford screen on event values per type — the
    forensic refinement auditors reach for after the first digit
    passes (fabricators who learn the first-digit law still tend to
    smooth the second; Nigrini 2012).  Reports the χ² against the
    exact second-digit law over d ∈ 0..9.

    Exactness: digit extraction on exact integer cents (values
    ≥ 10 cents so a second digit exists); expected probabilities are
    precomputed integer micro literals; the per-digit χ² term
    micro-rounds once (the chi2_type_dow term discipline) and the
    statistic sums BIGINTs.

    Scale: one events pass to (type, digit) counts; the 10-digit
    grid join is broadcast-sized."""
    probs = "case digit " + " ".join(
        f"when {d} then {_BENFORD2[d]}" for d in range(10)
    ) + " end"
    digits = (
        T(spark, sf, "events")
        .select(
            "event_type",
            F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("c"),
        )
        .filter(F.col("c") >= 10)
        .select(
            "event_type",
            F.expr("cast(substr(cast(c as string), 2, 1) as int)").alias(
                "digit"
            ),
        )
        .groupBy("event_type", "digit")
        .agg(F.count("*").alias("n_d"))
    )
    from faconne_spark.operators.dedup import track_persist

    digits = track_persist(digits)
    grid = (
        digits.select("event_type")
        .distinct()
        .select(
            "event_type", F.explode(F.expr("sequence(0, 9)")).alias("digit")
        )
        .join(digits, ["event_type", "digit"], "left")
        .select(
            "event_type",
            "digit",
            F.coalesce("n_d", F.lit(0)).alias("n_d"),
        )
    )
    tot = grid.groupBy("event_type").agg(F.sum("n_d").alias("n"))
    cells = grid.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "n",
        F.expr(
            # χ² term (obs − exp)²/exp with exp = n·p (p in micro):
            # micro-round ONE double per cell from exact integers
            f"cast(round(pow(n_d - cast(n as double) * ({probs}) / 1e6, 2)"
            f" / (cast(n as double) * ({probs}) / 1e6) * 1000000, 0)"
            f" as bigint)"
        ).alias("term"),
    )
    return cells.groupBy("event_type").agg(
        F.min("n").cast("long").alias("n_values"),
        F.expr("round(cast(sum(term) as double) / 1e6, 6) + 0.0").alias(
            "chi2_stat"
        ),
        F.lit(9).cast("long").alias("df"),
    )


def _oracle_benford_second() -> str:
    probs = "CASE digit " + " ".join(
        f"WHEN {d} THEN {_BENFORD2[d]}" for d in range(10)
    ) + " END"
    return f"""
WITH digits AS (
  SELECT event_type,
         substr(floor(value * 100 + 0.5)::BIGINT::VARCHAR, 2, 1)::INT
           AS digit
  FROM events WHERE floor(value * 100 + 0.5)::BIGINT >= 10),
obs AS (
  SELECT event_type, digit, count(*)::BIGINT AS n_d
  FROM digits GROUP BY 1, 2),
grid AS (
  SELECT t.event_type, d.digit, coalesce(o.n_d, 0)::BIGINT AS n_d
  FROM (SELECT DISTINCT event_type FROM obs) t
  CROSS JOIN (SELECT unnest(range(0, 10))::INT AS digit) d
  LEFT JOIN obs o ON o.event_type = t.event_type AND o.digit = d.digit),
tot AS (SELECT event_type, sum(n_d)::BIGINT AS n FROM grid GROUP BY 1),
cells AS (
  SELECT grid.event_type, n,
         round(pow(n_d - n::DOUBLE * ({probs}) / 1e6, 2)
               / (n::DOUBLE * ({probs}) / 1e6) * 1000000, 0)::BIGINT
           AS term
  FROM grid JOIN tot USING (event_type))
SELECT event_type, min(n)::BIGINT AS n_values,
       round(sum(term)::DOUBLE / 1e6, 6) + 0.0 AS chi2_stat,
       9::BIGINT AS df
FROM cells GROUP BY 1
"""


QUERIES["events_benford_second_digit"] = events_benford_second_digit
ORACLES["events_benford_second_digit"] = _oracle_benford_second()


# -------------------------------------------- DOW × hour-of-day MI

def events_dow_hour_mi(spark, sf):
    """Mutual information between day-of-week and hour-of-day of
    events — is the daily rhythm weekday-dependent?  MI = 0 means one
    24-hour profile serves the whole week; large MI says weekday and
    weekend (or Monday and Friday) need separate seasonal models —
    the model-free version of fitting and comparing per-day profiles.

    Exactness: the part_brand_type_mi discipline — each of the ≤ 168
    cells micro-rounds ONE ln of the exact BIGINT ratio
    c_xy·N/(r_x·c_y); the weighted sum is BIGINT and the final MI is
    one half-up micro division by N.

    Scale: one events pass to the bounded 7×24 cell relation."""
    cells = (
        T(spark, sf, "events")
        .select(
            F.expr(
                "cast(datediff(to_date(ts), DATE'1970-01-01') % 7 as int)"
            ).alias("dw"),
            F.expr("hour(ts)").alias("hr"),
        )
        .groupBy("dw", "hr")
        .agg(F.count("*").alias("c"))
    )
    from faconne_spark.operators.dedup import track_persist

    cells = track_persist(cells)
    rows = cells.groupBy("dw").agg(F.sum("c").alias("rx"))
    cols = cells.groupBy("hr").agg(F.sum("c").alias("cy"))
    tot = cells.groupBy().agg(F.sum("c").alias("n"))
    terms = (
        cells.join(F.broadcast(rows), "dw")
        .join(F.broadcast(cols), "hr")
        .crossJoin(F.broadcast(tot))
        .select(
            "c",
            "n",
            F.expr(
                "cast(floor(ln(cast(c as double) * n"
                " / (cast(rx as double) * cy)) * 1000000 + 0.5)"
                " as bigint)"
            ).alias("l"),
        )
    )
    return terms.groupBy().agg(
        F.count("*").cast("long").alias("n_cells"),
        F.min("n").cast("long").alias("n_events"),
        # MI >= 0 by definition, but per-cell rounding can push the
        # signed PMI sum a hair below zero when the true MI ~ 0 —
        # where Spark div (truncate) and DuckDB // (floor) disagree
        # by one; the clamp keeps the half-up idiom in its valid
        # non-negative domain (r10 engine-wide div audit)
        F.expr(
            "cast(greatest(2 * sum(c * l) + min(n), 0)"
            " div (2 * min(n)) as bigint)"
        ).alias("mi_micro"),
    )


ORACLE_DOW_HOUR_MI = """
WITH cells AS (
  SELECT (ts::DATE - DATE '1970-01-01') % 7 AS dw, hour(ts) AS hr,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
rows_ AS (SELECT dw, sum(c)::BIGINT AS rx FROM cells GROUP BY 1),
cols_ AS (SELECT hr, sum(c)::BIGINT AS cy FROM cells GROUP BY 1),
tot AS (SELECT sum(c)::BIGINT AS n FROM cells),
terms AS (
  SELECT c, n,
         floor(ln(c::DOUBLE * n / (rx::DOUBLE * cy)) * 1000000
               + 0.5)::BIGINT AS l
  FROM cells JOIN rows_ USING (dw) JOIN cols_ USING (hr) CROSS JOIN tot)
SELECT count(*)::BIGINT AS n_cells, min(n)::BIGINT AS n_events,
       (greatest(2 * sum(c * l) + min(n), 0)
        // (2 * min(n)))::BIGINT AS mi_micro
FROM terms
"""

QUERIES["events_dow_hour_mi"] = events_dow_hour_mi
ORACLES["events_dow_hour_mi"] = ORACLE_DOW_HOUR_MI
