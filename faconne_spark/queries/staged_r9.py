"""Round-9 staging bank: query/oracle pairs built and cross-engine
proven at three SFs in round 8 AFTER the driver window closed at
49/50 — the bank discipline (operator + oracle + driver-style test +
partitioning sweep) so round 9 opens with free green rows.
tests/test_staged_r9.py carries the proofs; registration is the r9
opening move (add the QUERIES/ORACLES aliases + _merged() import +
window entries + snapshots + bench + SURVEY rows + SCALING).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from faconne_spark.queries import T

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}


# ------------------------------------------- dow volume ANOVA

def events_dow_volume_anova(spark, sf):
    """One-way ANOVA of DAILY EVENT VOLUME across day-of-week — the
    seasonality-STRENGTH scalar (η² is the share of daily-volume
    variance the weekday explains; the hourly χ² says 'non-uniform',
    this says how much of the week's rhythm is structural).  Reuses
    evalstats.oneway_anova on the bounded daily rollup; dow is
    epoch-days mod 7 (the cross-engine convention)."""
    from faconne_spark.operators.evalstats import oneway_anova

    daily = (
        T(spark, sf, "events")
        .groupBy(F.expr("to_date(ts)").alias("day"))
        .agg(F.count("*").alias("c"))
        .select(
            F.expr(
                "cast(datediff(day, DATE'1970-01-01') % 7 as int)"
            ).alias("dw"),
            F.expr("cast(c as double)").alias("v"),
        )
    )
    return oneway_anova(daily, "dw", "v")


ORACLE_DOW_VOLUME_ANOVA = """
WITH daily AS (
  SELECT (ts::DATE - DATE '1970-01-01') % 7 AS dw,
         count(*)::DOUBLE AS v
  FROM events GROUP BY ts::DATE),
g AS (
  SELECT dw, count(*)::BIGINT AS n,
         sum(round(v * 1000000)::BIGINT)::BIGINT AS s,
         sum(round(v * 1000000)::BIGINT::DECIMAL(38,0)
             * round(v * 1000000)::BIGINT::DECIMAL(38,0)) AS ss
  FROM daily GROUP BY 1),
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

BANK_QUERIES["events_dow_volume_anova"] = events_dow_volume_anova
BANK_ORACLES["events_dow_volume_anova"] = ORACLE_DOW_VOLUME_ANOVA


# ------------------------------------------- order value CV

def orders_value_cv_by_segment(spark, sf):
    """Per-market-segment coefficient of variation of order totals —
    the spend-dispersion fingerprint (cv ≫ 1 segments mix whales with
    minnows; pricing and CI-width decisions differ).  Exact
    DECIMAL(38,0) cents moments via one broadcast dimension join;
    mean/sd/cv final-expression doubles, NULL-guarded."""
    o = T(spark, sf, "orders").select(
        "o_custkey",
        F.expr(
            "cast(round(o_totalprice * 100) as decimal(38,0))"
        ).alias("cents"),
    )
    c = T(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    m = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("s"),
            F.sum(F.expr("cents * cents")).alias("ss"),
        )
    )
    var = (
        "(cast(n as double) * cast(ss as double)"
        " - cast(s as double) * cast(s as double))"
        " / (cast(n as double) * (cast(n as double) - 1))"
    )
    return m.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n_orders"),
        F.expr(
            "round(cast(s as double) / cast(n as double) / 100.0, 6)"
            " + 0.0"
        ).alias("mean_value"),
        F.expr(
            f"case when n >= 2 and s > 0 then"
            f" round(sqrt({var}) / (cast(s as double)"
            f" / cast(n as double)), 6) + 0.0 end"
        ).alias("cv"),
    )


ORACLE_VALUE_CV = """
WITH m AS (
  SELECT c_mktsegment, count(*)::BIGINT AS n,
         sum(round(o_totalprice * 100)::BIGINT::DECIMAL(38,0)) AS s,
         sum(round(o_totalprice * 100)::BIGINT::DECIMAL(38,0)
             * round(o_totalprice * 100)::BIGINT::DECIMAL(38,0)) AS ss
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1)
SELECT c_mktsegment, n AS n_orders,
       round(s::DOUBLE / n::DOUBLE / 100.0, 6) + 0.0 AS mean_value,
       CASE WHEN n >= 2 AND s > 0 THEN
         round(sqrt((n::DOUBLE * ss::DOUBLE - s::DOUBLE * s::DOUBLE)
                    / (n::DOUBLE * (n::DOUBLE - 1)))
               / (s::DOUBLE / n::DOUBLE), 6) + 0.0 END AS cv
FROM m
"""

BANK_QUERIES["orders_value_cv_by_segment"] = orders_value_cv_by_segment
BANK_ORACLES["orders_value_cv_by_segment"] = ORACLE_VALUE_CV


# ------------------------------------------- type co-occurrence PMI

def events_type_cooccurrence_pmi(spark, sf):
    """Pointwise mutual information between event-type PAIRS at the
    USER level (does a user who ever checks out also browse
    categories?) — the basket-lift idea applied to behavioral types,
    in the repo's integer micro-nats discipline: PMI_micro =
    round(10⁶·ln(n_ab·N / (n_a·n_b))), exact BIGINTs everywhere else.

    Scale: one distinct (user, type) reduction, a within-user
    type-pair self-join (≤ types² per user — types are low-cardinality
    by contract), marginals broadcast back."""
    ut = (
        T(spark, sf, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    n_users = ut.select("user_id").distinct().agg(
        F.count("*").alias("n_users")
    )
    marg = ut.groupBy("event_type").agg(F.count("*").alias("n_t"))
    pairs = (
        ut.select("user_id", F.col("event_type").alias("ta"))
        .join(
            ut.select("user_id", F.col("event_type").alias("tb")),
            "user_id",
        )
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(
                marg.select(
                    F.col("event_type").alias("ta"),
                    F.col("n_t").alias("n_a"),
                )
            ),
            "ta",
        )
        .join(
            F.broadcast(
                marg.select(
                    F.col("event_type").alias("tb"),
                    F.col("n_t").alias("n_b"),
                )
            ),
            "tb",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "ta",
            "tb",
            "n_both",
            "n_a",
            "n_b",
            F.col("n_users").cast("long").alias("n_users"),
            F.expr(
                "cast(round(ln((cast(n_both as double) * n_users)"
                " / (cast(n_a as double) * n_b)) * 1000000, 0)"
                " as bigint)"
            ).alias("pmi_micro"),
        )
    )


ORACLE_TYPE_PMI = """
WITH ut AS MATERIALIZED (
  SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM ut),
marg AS (SELECT event_type, count(*)::BIGINT AS n_t FROM ut GROUP BY 1),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         count(*)::BIGINT AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT ta, tb, n_both, ma.n_t AS n_a, mb.n_t AS n_b, n_users,
       round(ln((n_both::DOUBLE * n_users) / (ma.n_t::DOUBLE * mb.n_t))
             * 1000000, 0)::BIGINT AS pmi_micro
FROM pairs
JOIN marg ma ON ma.event_type = ta
JOIN marg mb ON mb.event_type = tb
CROSS JOIN nu
"""

BANK_QUERIES["events_type_cooccurrence_pmi"] = events_type_cooccurrence_pmi
BANK_ORACLES["events_type_cooccurrence_pmi"] = ORACLE_TYPE_PMI


# --------------------------------- char bigram conditional entropy

def docs_char_bigram_cond_entropy(spark, sf):
    """Per-language conditional entropy H(next char | char) over the
    lowercased character stream, in exact integer micro-nats — the
    sequence-predictability companion to docs_char_entropy_by_lang's
    marginal entropy (near-zero = templated/repetitive text; natural
    prose sits in a stable per-language band).  Same integer
    discipline as events_markov_cond_entropy: per-cell ln micro-rounds
    BEFORE the count multiply; output is the exact h_micro integer.

    Scale: the bigram explode is map-only and linear in corpus chars;
    everything after the (lang, c1, c2) groupBy runs on the bounded
    alphabet² relation."""
    chars = "filter(split(lower(text), ''), x -> x != '')"
    bigrams = (
        "zip_with(slice(cs, 1, size(cs) - 1), slice(cs, 2, size(cs) - 1),"
        " (a, b) -> struct(a as c1, b as c2))"
    )
    pairs = (
        T(spark, sf, "documents")
        .select("lang", F.expr(chars).alias("cs"))
        .filter(F.expr("size(cs) >= 2"))
        .select("lang", F.explode(F.expr(bigrams)).alias("p"))
        .groupBy("lang", F.col("p.c1").alias("c1"), F.col("p.c2").alias("c2"))
        .agg(F.count("*").alias("n_st"))
    )
    rows = pairs.groupBy("lang", "c1").agg(F.sum("n_st").alias("n_s"))
    cells = pairs.join(rows, ["lang", "c1"]).withColumn(
        "__l",
        F.expr(
            "cast(round(ln(cast(n_st as double) / n_s) * 1000000, 0)"
            " as bigint)"
        ),
    )
    return cells.groupBy("lang").agg(
        F.sum("n_st").alias("n_pairs"),
        F.count("*").alias("n_cells"),
        (-F.sum(F.col("n_st") * F.col("__l"))).alias("h_micro"),
    )


ORACLE_CHAR_BIGRAM_H = """
WITH cs AS (
  SELECT lang, string_split(lower(text), '') AS c FROM documents),
pairs AS (
  SELECT lang, p.c1 AS c1, p.c2 AS c2, count(*)::BIGINT AS n_st
  FROM (
    SELECT lang,
           unnest(list_transform(range(1, len(c)),
                  i -> {'c1': c[i], 'c2': c[i + 1]})) AS p
    FROM cs WHERE len(c) >= 2)
  GROUP BY 1, 2, 3),
rows_ AS (
  SELECT lang, c1, sum(n_st)::BIGINT AS n_s FROM pairs GROUP BY 1, 2),
cells AS (
  SELECT p.lang, p.n_st,
         round(ln(p.n_st::DOUBLE / r.n_s) * 1000000, 0)::BIGINT AS l
  FROM pairs p JOIN rows_ r ON r.lang = p.lang AND r.c1 = p.c1)
SELECT lang, sum(n_st)::BIGINT AS n_pairs, count(*)::BIGINT AS n_cells,
       (-sum(n_st * l))::BIGINT AS h_micro
FROM cells GROUP BY lang
"""

BANK_QUERIES["docs_char_bigram_cond_entropy"] = docs_char_bigram_cond_entropy
BANK_ORACLES["docs_char_bigram_cond_entropy"] = ORACLE_CHAR_BIGRAM_H


# --------------------------------------- daily value Spearman trend

def events_value_spearman_daily(spark, sf):
    """Spearman rank correlation between the day index and the day's
    MEAN event value — the monotone VALUE-trend tile next to the
    count/DAU Mann–Kendall pair (volume can be flat while value per
    event drifts).  Everything runs on the bounded daily relation:
    exact integer day/value ranks (row_number over ≤ days rows, value
    ties broken by day for a deterministic total order), then
    Spearman's ρ = 1 − 6·Σd²/(n(n²−1)) — one exact BIGINT Σd², one
    final double division.  Daily means are exact micro integers
    (half-up of the µs sum) so the value ranking is identical
    cross-engine."""
    daily = (
        T(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.expr("to_date(ts)").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.expr("cast(floor(value * 1000000 + 0.5) as bigint)")
            ).alias("s"),
        )
        .select(
            "day",
            F.expr("cast((2 * s + n) div (2 * n) as bigint)").alias(
                "mean_micro"
            ),
        )
    )
    wd = Window.orderBy("day")
    wv = Window.orderBy("mean_micro", "day")
    ranked = daily.withColumn(
        "rd", F.row_number().over(wd).cast("long")
    ).withColumn("rv", F.row_number().over(wv).cast("long"))
    return ranked.agg(
        F.count("*").alias("n_days"),
        F.sum(F.expr("(rd - rv) * (rd - rv)")).alias("sum_d2"),
    ).select(
        F.col("n_days").cast("long").alias("n_days"),
        "sum_d2",
        F.expr(
            "case when n_days >= 2 then round(1.0 - cast(6 * sum_d2"
            " as double) / (cast(n_days as double)"
            " * (cast(n_days as double) * n_days - 1)), 6) + 0.0 end"
        ).alias("spearman_rho"),
    )


ORACLE_VALUE_SPEARMAN = """
WITH daily AS (
  SELECT ts::DATE AS day,
         (2 * sum(floor(value * 1000000 + 0.5)::BIGINT) + count(*))
           // (2 * count(*)) AS mean_micro
  FROM events WHERE value IS NOT NULL GROUP BY 1),
ranked AS (
  SELECT row_number() OVER (ORDER BY day)::BIGINT AS rd,
         row_number() OVER (ORDER BY mean_micro, day)::BIGINT AS rv
  FROM daily),
agg AS (
  SELECT count(*)::BIGINT AS n_days,
         sum((rd - rv) * (rd - rv))::BIGINT AS sum_d2
  FROM ranked)
SELECT n_days, sum_d2,
       CASE WHEN n_days >= 2 THEN
         round(1.0 - (6 * sum_d2)::DOUBLE
               / (n_days::DOUBLE * (n_days::DOUBLE * n_days - 1)), 6)
         + 0.0 END AS spearman_rho
FROM agg
"""

BANK_QUERIES["events_value_spearman_daily"] = events_value_spearman_daily
BANK_ORACLES["events_value_spearman_daily"] = ORACLE_VALUE_SPEARMAN


# --------------------------------------------- Heaps vocab growth

HEAPS_BUCKETS = 10


def docs_vocab_growth_heaps(spark, sf):
    """Heaps'-law vocabulary growth curve: distinct vocabulary size
    after each 10% slice of the corpus (hash order — deterministic,
    order-free) — the gauge that says whether more data still buys
    new vocabulary or the corpus has saturated (flattening curve =
    diminishing token novelty; the macro complement of
    docs_ngram_novelty's per-doc view).

    ONE pass trick: per word, the MINIMUM bucket in which it appears
    (groupBy word — corpus-sized but map-side combined), then the
    cumulative count over the ≤ B first-seen tallies IS the distinct
    vocabulary at each prefix — no per-prefix distinct scans (B scans
    of the corpus would be the naive shape)."""
    from faconne_spark.functions import phash60, tokens_ws

    toks = tokens_ws("lower(text)", "spark")
    h = phash60("concat('hp:', cast(doc_id as string))", "spark")
    B = HEAPS_BUCKETS
    words = (
        T(spark, sf, "documents")
        .select(
            F.expr(f"({h}) % {B}").alias("bucket"),
            F.explode(F.expr(toks)).alias("word"),
        )
        .groupBy("word")
        .agg(F.min("bucket").alias("first_bucket"))
    )
    tallies = words.groupBy("first_bucket").agg(
        F.count("*").alias("new_words")
    )
    wc = Window.orderBy("first_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return tallies.withColumn(
        "vocab_size", F.sum("new_words").over(wc).cast("long")
    ).select(
        F.col("first_bucket").cast("int").alias("bucket"),
        F.col("new_words").cast("long").alias("new_words"),
        "vocab_size",
    )


def _oracle_heaps() -> str:
    from faconne_spark.functions import phash60, tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    h = phash60("('hp:' || doc_id::VARCHAR)", "duckdb")
    return f"""
WITH words AS (
  SELECT word, min(bucket)::BIGINT AS first_bucket FROM (
    SELECT ({h}) % {HEAPS_BUCKETS} AS bucket,
           unnest({toks}) AS word
    FROM documents)
  GROUP BY word),
tallies AS (
  SELECT first_bucket, count(*)::BIGINT AS new_words
  FROM words GROUP BY 1)
SELECT first_bucket::INT AS bucket, new_words,
       sum(new_words) OVER (ORDER BY first_bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         AS vocab_size
FROM tallies
"""


BANK_QUERIES["docs_vocab_growth_heaps"] = docs_vocab_growth_heaps
BANK_ORACLES["docs_vocab_growth_heaps"] = _oracle_heaps()


# registered in round 9 (the staged proofs became driver-gated keys)
QUERIES = BANK_QUERIES
ORACLES = BANK_ORACLES
