"""Round-12 staging bank: query/oracle pairs built and cross-engine
proven at three SFs in round 11 (the bank discipline — operator +
oracle + driver-style test + partitioning sweep + plain-Python
replays in tests/test_bank_r12.py), deliberately UNREGISTERED so the
r11 driver window stays within budget.  Registration is the round-12
opening move (QUERIES/ORACLES aliases + _merged() import + window
entries + snapshots stamped at registration + bench + SURVEY rows +
SCALING)."""

from __future__ import annotations

from pyspark.sql import functions as F

from faconne_spark.queries import T

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}


# ------------------------------------------------ Theil index per type

def events_value_theil_by_type(spark, sf):
    """Theil T inequality index of event value per type:
    T = (1/n)·Σ (vᵢ/μ)·ln(vᵢ/μ) — the DECOMPOSABLE inequality gauge
    beside the Gini (Theil splits exactly into between/within-group
    terms, which is why the nation-revenue key used it; this is its
    per-ticket twin and the second consumer of the discipline).
    Zero-value rows contribute 0 (lim x·ln x = 0).

    Exactness: the per-cell ln rule on the DISTINCT-VALUE relation —
    each distinct micro value v with count c contributes
    c·v·ln(n·v/Σv); ln of the exact double ratio micro-rounds ONCE
    per distinct value, the weighted terms integer-sum in
    DECIMAL(38,0), and T is one final double."""
    ev = T(spark, sf, "events").select(
        "event_type",
        F.expr("cast(floor(value * 1000000 + 0.5) as bigint)").alias("v"),
    )
    dist = ev.groupBy("event_type", "v").agg(
        F.count("*").cast("long").alias("c")
    )
    tot = dist.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("v").cast("decimal(38,0)")
        ).alias("sv"),
    )
    terms = dist.join(F.broadcast(tot), "event_type").filter(
        "v > 0"
    ).select(
        "event_type", "n", "sv",
        F.expr(
            "cast(c as decimal(38,0)) * cast(v as decimal(38,0))"
            " * cast(round(ln(cast(n as double) * v / cast(sv as double))"
            " * 1000000, 0) as bigint)"
        ).alias("t"),
    )
    return terms.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        F.expr(
            "round(cast(sum(t) as double) / (1000000.0"
            " * cast(max(sv) as double)), 6) + 0.0"
        ).alias("theil_t"),
    )


ORACLE_THEIL_TYPE = """
WITH ev AS (
  SELECT event_type, floor(value * 1000000 + 0.5)::BIGINT AS v
  FROM events),
dist AS (
  SELECT event_type, v, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
tot AS (
  SELECT event_type, sum(c)::BIGINT AS n,
         sum(c::DECIMAL(38,0) * v::DECIMAL(38,0)) AS sv
  FROM dist GROUP BY 1),
terms AS (
  SELECT d.event_type, n, sv,
         c::DECIMAL(38,0) * v::DECIMAL(38,0)
           * round(ln(n::DOUBLE * v / sv::DOUBLE) * 1000000, 0)::BIGINT
           AS t
  FROM dist d JOIN tot USING (event_type) WHERE v > 0)
SELECT event_type, max(n)::BIGINT AS n_events,
       round(sum(t)::DOUBLE / (1000000.0 * max(sv)::DOUBLE), 6) + 0.0
         AS theil_t
FROM terms GROUP BY event_type
"""

BANK_QUERIES["events_value_theil_by_type"] = events_value_theil_by_type
BANK_ORACLES["events_value_theil_by_type"] = ORACLE_THEIL_TYPE


# --------------------------------------------- hourly KL vs uniform

def events_hour_kl_uniform(spark, sf):
    """KL divergence of each type's hourly profile from uniform(24) —
    the one-scalar 'how peaked is this type's clock' gauge the hourly
    seasonality and circular-stats keys spread across 24 cells
    (KL(p‖u) = ln 24 − H(p), so it is also the entropy deficit).

    Exactness: per-cell ln of the exact BIGINT ratio 24·cₕ/n
    micro-rounds once per (type, hour); weighted integer sum; one
    final division."""
    ev = T(spark, sf, "events").select(
        "event_type", F.expr("cast(hour(ts) as int)").alias("h")
    )
    cells = ev.groupBy("event_type", "h").agg(
        F.count("*").cast("long").alias("c")
    )
    tot = cells.groupBy("event_type").agg(F.sum("c").alias("n"))
    terms = cells.join(F.broadcast(tot), "event_type").select(
        "event_type", "n",
        F.expr(
            "cast(c as decimal(38,0))"
            " * cast(round(ln(24.0 * c / cast(n as double)) * 1000000,"
            " 0) as bigint)"
        ).alias("t"),
    )
    return terms.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        F.expr(
            "round(cast(sum(t) as double) / (1000000.0"
            " * cast(max(n) as double)), 6) + 0.0"
        ).alias("kl_uniform_nats"),
    )


ORACLE_HOUR_KL = """
WITH ev AS (
  SELECT event_type, extract(hour FROM ts)::INT AS h FROM events),
cells AS (
  SELECT event_type, h, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
tot AS (
  SELECT event_type, sum(c)::BIGINT AS n FROM cells GROUP BY 1),
terms AS (
  SELECT c0.event_type, n,
         c::DECIMAL(38,0)
           * round(ln(24.0 * c / n::DOUBLE) * 1000000, 0)::BIGINT AS t
  FROM cells c0 JOIN tot USING (event_type))
SELECT event_type, max(n)::BIGINT AS n_events,
       round(sum(t)::DOUBLE / (1000000.0 * max(n)::DOUBLE), 6) + 0.0
         AS kl_uniform_nats
FROM terms GROUP BY event_type
"""

BANK_QUERIES["events_hour_kl_uniform"] = events_hour_kl_uniform
BANK_ORACLES["events_hour_kl_uniform"] = ORACLE_HOUR_KL


# -------------------------------------- per-type inter-event gap median

def events_type_gap_median(spark, sf):
    """Median (and p90) inter-event gap in seconds per event type,
    within user streams — the per-TYPE pacing profile under the
    session keys (a type whose median gap collapses is becoming a
    polling/automation signal, which changes dedup and rate-limit
    curation).

    Exactness: epoch-MICROSECOND gaps are exact integers (the ts
    column carries sub-second precision — truncating to seconds was
    the staging bug this replay bank exists to catch); ×2 median and
    ×10 p90 are exact; scale: the lag window partitions by
    (user, type)."""
    from pyspark.sql import Window as W

    ev = T(spark, sf, "events").select(
        "user_id", "event_type",
        F.expr("unix_micros(ts)").alias("t"),
    )
    g = ev.withColumn(
        "gap",
        F.col("t")
        - F.lag("t").over(
            W.partitionBy("user_id", "event_type").orderBy("t", "user_id")
        ),
    ).filter(F.col("gap").isNotNull())
    return g.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.expr(
            "cast(floor(2 * percentile(gap, 0.5) + 0.5) as bigint)"
        ).alias("med_gap_us_x2"),
        F.expr(
            "cast(floor(10 * percentile(gap, 0.9) + 0.5) as bigint)"
        ).alias("p90_gap_us_x10"),
        F.max("gap").cast("long").alias("max_gap_us"),
    )


ORACLE_TYPE_GAP = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts)::BIGINT AS t FROM events),
g AS (
  SELECT event_type,
         t - lag(t) OVER (PARTITION BY user_id, event_type
                          ORDER BY t, user_id) AS gap
  FROM ev)
SELECT event_type, count(*)::BIGINT AS n_gaps,
       floor(2 * quantile_cont(gap, 0.5) + 0.5)::BIGINT
         AS med_gap_us_x2,
       floor(10 * quantile_cont(gap, 0.9) + 0.5)::BIGINT
         AS p90_gap_us_x10,
       max(gap)::BIGINT AS max_gap_us
FROM g WHERE gap IS NOT NULL GROUP BY event_type
"""

BANK_QUERIES["events_type_gap_median"] = events_type_gap_median
BANK_ORACLES["events_type_gap_median"] = ORACLE_TYPE_GAP


# ---------------------------------- Filliben normality (decile PPCC)

# Φ⁻¹ at the deciles 0.1 … 0.9, in micro units — shared literals
# injected into BOTH engines (the trig/Benford constant-table idiom)
_NORM_SCORE_MICRO = [
    -1281552, -841621, -524401, -253347, 0,
    253347, 524401, 841621, 1281552,
]


def events_value_filliben_normality(spark, sf):
    """Decile probability-plot correlation (Filliben 1975) of event
    value vs the normal, per type: Pearson r between the nine exact
    sample deciles and Φ⁻¹(i/10) — the cheap monotone normality probe
    beside Jarque–Bera's moment test (JB is blind to some symmetric
    non-normal shapes; the PPCC is not).

    Exactness: ×10-exact deciles (integer interpolation fractions);
    normal scores are shared micro literals; r is one final double
    from exact integer moments (the normal-score moments are compile-
    time constants)."""
    ev = T(spark, sf, "events").select(
        "event_type",
        F.expr("cast(floor(value * 1000000 + 0.5) as bigint)").alias("v"),
    )
    dec = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        *[
            F.expr(
                f"cast(floor(10 * percentile(v, 0.{i}) + 0.5) as bigint)"
            ).alias(f"q{i}_x10")
            for i in range(1, 10)
        ],
    )
    # Pearson over the 9 (q, s) points: Σs = 0 and Σs² is a constant,
    # so r = Σ q·s / sqrt((9·Σq² − (Σq)²)/9 · Σs²) … keep the full
    # 5-moment form for clarity; all sums are exact integers
    s = _NORM_SCORE_MICRO
    sq = " + ".join(f"q{i}_x10" for i in range(1, 10))
    sqq = " + ".join(
        f"cast(q{i}_x10 as decimal(38,0)) * cast(q{i}_x10 as decimal(38,0))"
        for i in range(1, 10)
    )
    sqs = " + ".join(
        f"cast(q{i}_x10 as decimal(38,0)) * ({s[i - 1]})"
        for i in range(1, 10)
    )
    ss2 = sum(x * x for x in s)
    return dec.selectExpr(
        "event_type", "n_events",
        f"case when 9 * ({sqq}) - cast({sq} as decimal(38,0))"
        f" * cast({sq} as decimal(38,0)) > 0 then"
        f" round(9.0 * cast({sqs} as double)"
        f" / sqrt((9.0 * cast({sqq} as double)"
        f" - cast({sq} as double) * cast({sq} as double))"
        f" * 9.0 * {ss2}.0), 6) + 0.0 end AS filliben_r",
    )


def _oracle_filliben() -> str:
    s = _NORM_SCORE_MICRO
    decs = ",\n         ".join(
        f"floor(10 * quantile_cont(v, 0.{i}) + 0.5)::BIGINT AS q{i}_x10"
        for i in range(1, 10)
    )
    sq = " + ".join(f"q{i}_x10" for i in range(1, 10))
    sqq = " + ".join(
        f"q{i}_x10::DECIMAL(38,0) * q{i}_x10::DECIMAL(38,0)"
        for i in range(1, 10)
    )
    sqs = " + ".join(
        f"q{i}_x10::DECIMAL(38,0) * ({s[i - 1]})" for i in range(1, 10)
    )
    ss2 = sum(x * x for x in s)
    return f"""
WITH ev AS (
  SELECT event_type, floor(value * 1000000 + 0.5)::BIGINT AS v
  FROM events),
dec AS (
  SELECT event_type, count(*)::BIGINT AS n_events,
         {decs}
  FROM ev GROUP BY 1)
SELECT event_type, n_events,
       CASE WHEN 9 * ({sqq}) - ({sq})::DECIMAL(38,0)
                 * ({sq})::DECIMAL(38,0) > 0 THEN
         round(9.0 * ({sqs})::DOUBLE
               / sqrt((9.0 * ({sqq})::DOUBLE
                       - ({sq})::DOUBLE * ({sq})::DOUBLE)
                      * 9.0 * {ss2}.0), 6) + 0.0 END AS filliben_r
FROM dec
"""


BANK_QUERIES["events_value_filliben_normality"] = (
    events_value_filliben_normality
)
BANK_ORACLES["events_value_filliben_normality"] = _oracle_filliben()


# --------------------------------------- Lorenz deciles of token mass

def docs_token_lorenz_deciles(spark, sf):
    """Lorenz curve points of token mass across the vocabulary per
    source: the share of total tokens held by the bottom k/10 of
    word types (ranked by count asc, word tiebreak) for k = 1…9 —
    the CURVE whose scalar is docs_vocab_gini (two sources with equal
    Gini can still cross; the curve says where).

    Exactness: ranks and cumulative sums are exact integers; the
    bottom-decile membership test 10·r ≤ k·V is integer; shares are
    half-up micro divisions.  Scale: rank window on the vocabulary
    relation, partitioned by source."""
    from pyspark.sql import Window as W

    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "spark")
    cnt = (
        T(spark, sf, "documents")
        .select("source", F.explode(F.expr(toks)).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    r = cnt.withColumn(
        "r",
        F.row_number()
        .over(W.partitionBy("source").orderBy("c", "w"))
        .cast("long"),
    )
    v = r.groupBy("source").agg(
        F.count("*").alias("vv"), F.sum("c").alias("s")
    )
    j = r.join(F.broadcast(v), "source")
    aggs = [
        F.sum(
            F.expr(f"if(10 * r <= {k} * vv, cast(c as bigint), 0)")
        ).alias(f"cum{k}")
        for k in range(1, 10)
    ]
    g = j.groupBy("source").agg(
        F.max("vv").cast("long").alias("vocab"),
        F.max("s").cast("long").alias("n_tokens"),
        *aggs,
    )
    shares = [
        f"cast((2 * 1000000 * cum{k} + n_tokens) div (2 * n_tokens)"
        f" as bigint) AS share{k}_micro"
        for k in range(1, 10)
    ]
    return g.selectExpr("source", "vocab", "n_tokens", *shares)


def _oracle_lorenz() -> str:
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    cums = ",\n         ".join(
        f"sum(CASE WHEN 10 * r <= {k} * vv THEN c ELSE 0 END)::BIGINT"
        f" AS cum{k}"
        for k in range(1, 10)
    )
    shares = ",\n       ".join(
        f"((2 * 1000000 * cum{k} + n_tokens) // (2 * n_tokens))::BIGINT"
        f" AS share{k}_micro"
        for k in range(1, 10)
    )
    return f"""
WITH cnt AS (
  SELECT source, w, count(*)::BIGINT AS c
  FROM (SELECT source, unnest({toks}) AS w FROM documents)
  GROUP BY 1, 2),
r AS (
  SELECT source, c,
         row_number() OVER (PARTITION BY source ORDER BY c, w)::BIGINT
           AS r,
         count(*) OVER (PARTITION BY source)::BIGINT AS vv,
         sum(c) OVER (PARTITION BY source)::BIGINT AS s
  FROM cnt),
g AS (
  SELECT source, max(vv)::BIGINT AS vocab, max(s)::BIGINT AS n_tokens,
         {cums}
  FROM r GROUP BY 1)
SELECT source, vocab, n_tokens,
       {shares}
FROM g
"""


BANK_QUERIES["docs_token_lorenz_deciles"] = docs_token_lorenz_deciles
BANK_ORACLES["docs_token_lorenz_deciles"] = _oracle_lorenz()


# ------------------------------------ word length by frequency decile

def docs_len_by_freq_decile(spark, sf):
    """Mean word LENGTH per corpus-frequency decile — the law-of-
    abbreviation CURVE whose scalar is docs_length_freq_spearman
    (decile 10 = most frequent types; natural text slopes down; a
    flat or rising curve marks ID/synthetic vocabularies).

    Exactness: decile = 1 + (10·(r−1)) div V on the deterministic
    (count, word) total order — pure integer math, identical in both
    engines (no ntile tie ambiguity); mean length is the half-up
    micro idiom."""
    from pyspark.sql import Window as W

    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "spark")
    cnt = (
        T(spark, sf, "documents")
        .select(F.explode(F.expr(toks)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    r = cnt.withColumn(
        "r", F.row_number().over(W.orderBy("c", "w")).cast("long")
    )
    v = r.groupBy().agg(F.count("*").alias("vv"))
    d = r.crossJoin(F.broadcast(v)).select(
        F.expr("cast(1 + (10 * (r - 1)) div vv as int)").alias("decile"),
        F.expr("cast(length(w) as bigint)").alias("len"),
        "c",
    )
    return d.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.expr(
            "cast((2 * 1000000 * sum(len) + count(*))"
            " div (2 * count(*)) as bigint)"
        ).alias("mean_len_micro"),
    )


def _oracle_len_decile() -> str:
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    return f"""
WITH cnt AS (
  SELECT w, count(*)::BIGINT AS c
  FROM (SELECT unnest({toks}) AS w FROM documents) GROUP BY 1),
r AS (
  SELECT w, c, row_number() OVER (ORDER BY c, w)::BIGINT AS r,
         count(*) OVER ()::BIGINT AS vv
  FROM cnt),
d AS (
  SELECT (1 + (10 * (r - 1)) // vv)::INT AS decile,
         length(w)::BIGINT AS len, c
  FROM r)
SELECT decile, count(*)::BIGINT AS n_words, sum(c)::BIGINT AS n_tokens,
       ((2 * 1000000 * sum(len) + count(*)) // (2 * count(*)))::BIGINT
         AS mean_len_micro
FROM d GROUP BY decile
"""


BANK_QUERIES["docs_len_by_freq_decile"] = docs_len_by_freq_decile
BANK_ORACLES["docs_len_by_freq_decile"] = _oracle_len_decile()


# --------------------------------- source homogeneity χ² on top words

TOPK_CHI2_K = 100


def docs_source_topk_chi2(spark, sf):
    """Homogeneity χ² of the sources × top-100 corpus words
    contingency table — ARE the sources drawing from one word
    distribution?  The formal test under the unigram-JSD and
    vocab-overlap descriptive keys (χ² comes with df =
    (sources−1)(words−1), so drift is testable, not just rankable).

    Exactness: the top-100 word set is deterministic ((count, word)
    total order); per-cell terms follow the grid discipline — zero
    cells enter via the margins grid, each term micro-rounds once
    from identical BIGINTs, integer sum."""
    from pyspark.sql import Window as W

    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "spark")
    sw = (
        T(spark, sf, "documents")
        .select("source", F.explode(F.expr(toks)).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("o"))
    )
    top = (
        sw.groupBy("w")
        .agg(F.sum("o").alias("cw"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.orderBy(F.col("cw").desc(), F.col("w").asc())
            ),
        )
        .filter(F.col("rk") <= TOPK_CHI2_K)
        .select("w")
    )
    obs = sw.join(F.broadcast(top), "w")
    rows_ = obs.groupBy("source").agg(F.sum("o").alias("rs"))
    cols_ = obs.groupBy("w").agg(F.sum("o").alias("cs"))
    tot = obs.groupBy().agg(F.sum("o").alias("n"))
    grid = rows_.crossJoin(F.broadcast(cols_)).crossJoin(F.broadcast(tot))
    cells = (
        grid.join(obs, ["source", "w"], "left")
        .withColumn("o", F.coalesce("o", F.lit(0)))
        .withColumn(
            "term_micro",
            F.expr(
                "cast(round(1000000 *"
                " (cast(o as double) * cast(n as double)"
                "  - cast(rs as double) * cast(cs as double))"
                " * (cast(o as double) * cast(n as double)"
                "    - cast(rs as double) * cast(cs as double))"
                " / (cast(n as double) * cast(rs as double)"
                "    * cast(cs as double)), 0) as bigint)"
            ),
        )
    )
    return cells.groupBy().agg(
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("w").cast("long").alias("n_words"),
        F.max("n").cast("long").alias("n_tokens_in_grid"),
        F.sum("term_micro").alias("chi2_micro"),
    )


def _oracle_topk_chi2() -> str:
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    return f"""
WITH sw AS (
  SELECT source, w, count(*)::BIGINT AS o
  FROM (SELECT source, unnest({toks}) AS w FROM documents)
  GROUP BY 1, 2),
top AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY sum(o) DESC, w ASC) AS rk
    FROM sw GROUP BY w) WHERE rk <= {TOPK_CHI2_K}),
obs AS (SELECT sw.* FROM sw JOIN top USING (w)),
rs AS (SELECT source, sum(o)::BIGINT AS rs FROM obs GROUP BY 1),
cs AS (SELECT w, sum(o)::BIGINT AS cs FROM obs GROUP BY 1),
tot AS (SELECT sum(o)::BIGINT AS n FROM obs),
cells AS (
  SELECT r.rs, c.cs, t.n, coalesce(obs.o, 0)::BIGINT AS o
  FROM rs r CROSS JOIN cs c CROSS JOIN tot t
  LEFT JOIN obs ON obs.source = r.source AND obs.w = c.w),
terms AS (
  SELECT n,
         round(1000000 *
               (o::DOUBLE * n::DOUBLE - rs::DOUBLE * cs::DOUBLE)
               * (o::DOUBLE * n::DOUBLE - rs::DOUBLE * cs::DOUBLE)
               / (n::DOUBLE * rs::DOUBLE * cs::DOUBLE), 0)::BIGINT
           AS term_micro
  FROM cells)
SELECT (SELECT count(*) FROM rs)::BIGINT AS n_sources,
       (SELECT count(*) FROM cs)::BIGINT AS n_words,
       max(n)::BIGINT AS n_tokens_in_grid,
       sum(term_micro)::BIGINT AS chi2_micro
FROM terms
"""


BANK_QUERIES["docs_source_topk_chi2"] = docs_source_topk_chi2
BANK_ORACLES["docs_source_topk_chi2"] = _oracle_topk_chi2()


# ----------------------------------- unit-price IQR outliers by brand

def lineitem_unitprice_iqr_outliers(spark, sf):
    """Tukey-fence outlier counts of UNIT price (extendedprice /
    quantity) per brand — the pricing-anomaly screen (a brand whose
    high fence trips often has bundling/entry errors; the one-sided
    asymmetry says which direction).  Joins part for the brand label.

    Exactness: the unit price micro-rounds ONCE per row (double
    division, deterministic both engines); quartiles of those micros
    are ×4-exact; the fences 2·(4Q₁) − 3·IQR₄ are exact ×8 integers
    and membership is an integer compare."""
    from faconne_spark.session import spread

    # optimization r13 (guide §2.5): the exact-percentile partial
    # aggregate buffers every u per brand on the MAP side — off the
    # ~3-split lineitem scan that ran on 3 cores (and the flag pass
    # re-scans); spread() is a no-op at cluster scale
    li = spread(T(spark, sf, "lineitem")).select(
        "l_partkey",
        F.expr(
            "cast(round(cast(l_extendedprice as double) / l_quantity"
            " * 1000000, 0) as bigint)"
        ).alias("u"),
    )
    p = T(spark, sf, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_brand").alias("brand"),
    )
    j = li.join(p, "l_partkey")
    q = j.groupBy("brand").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.expr(
            "cast(floor(4 * percentile(u, 0.25) + 0.5) as bigint)"
        ).alias("q1_x4"),
        F.expr(
            "cast(floor(4 * percentile(u, 0.75) + 0.5) as bigint)"
        ).alias("q3_x4"),
    )
    f = j.join(F.broadcast(q), "brand").select(
        "brand", "n_lines", "q1_x4", "q3_x4",
        F.expr(
            "if(8 * u < 2 * q1_x4 - 3 * (q3_x4 - q1_x4), 1, 0)"
        ).alias("lo"),
        F.expr(
            "if(8 * u > 2 * q3_x4 + 3 * (q3_x4 - q1_x4), 1, 0)"
        ).alias("hi"),
    )
    return f.groupBy("brand", "n_lines", "q1_x4", "q3_x4").agg(
        F.sum("lo").cast("long").alias("n_low_outliers"),
        F.sum("hi").cast("long").alias("n_high_outliers"),
    )


ORACLE_UNITPRICE_IQR = """
WITH li AS (
  SELECT l_partkey,
         round(l_extendedprice::DOUBLE / l_quantity * 1000000,
               0)::BIGINT AS u
  FROM lineitem),
j AS (
  SELECT p_brand AS brand, u
  FROM li JOIN part ON l_partkey = p_partkey),
q AS (
  SELECT brand, count(*)::BIGINT AS n_lines,
         floor(4 * quantile_cont(u, 0.25) + 0.5)::BIGINT AS q1_x4,
         floor(4 * quantile_cont(u, 0.75) + 0.5)::BIGINT AS q3_x4
  FROM j GROUP BY 1)
SELECT brand, n_lines, q1_x4, q3_x4,
       sum(CASE WHEN 8 * u < 2 * q1_x4 - 3 * (q3_x4 - q1_x4)
                THEN 1 ELSE 0 END)::BIGINT AS n_low_outliers,
       sum(CASE WHEN 8 * u > 2 * q3_x4 + 3 * (q3_x4 - q1_x4)
                THEN 1 ELSE 0 END)::BIGINT AS n_high_outliers
FROM j JOIN q USING (brand)
GROUP BY brand, n_lines, q1_x4, q3_x4
"""

BANK_QUERIES["lineitem_unitprice_iqr_outliers"] = (
    lineitem_unitprice_iqr_outliers
)
BANK_ORACLES["lineitem_unitprice_iqr_outliers"] = ORACLE_UNITPRICE_IQR


# ---------------------------------- nation balance Kruskal–Wallis

def customer_nation_balance_kruskal(spark, sf):
    """Kruskal–Wallis H across NATIONS on customer account balance —
    third consumer of evalstats.kruskal_wallis (brands/prices,
    weekdays/values, now geographies/balances): does any nation's
    balance distribution sit elsewhere, with no normality assumption
    and full sign-safety (balances go negative; ranks don't care).

    Scale: average tie-ranks two-phase on the distinct-balance
    relation (centi domain ≤ ~1.1M values), no partition-less window;
    per-nation cells round once to BIGINT."""
    from faconne_spark.operators.evalstats import kruskal_wallis

    return kruskal_wallis(
        T(spark, sf, "customer"),
        "c_nationkey",
        "cast(floor(c_acctbal * 100 + 0.5) as bigint)",
    ).selectExpr(
        "n_rows AS n_customers", "k_groups AS k_nations", "df",
        "h_stat", "tie_correction", "h_adj",
    )


ORACLE_NATION_KRUSKAL = """
WITH ranked AS (
  SELECT c_nationkey,
         2 * rank() OVER (ORDER BY v)
           + count(*) OVER (PARTITION BY v) - 1 AS avg2_rank,
         count(*) OVER (PARTITION BY v) AS t
  FROM (SELECT c_nationkey,
               floor(c_acctbal * 100 + 0.5)::BIGINT AS v
        FROM customer)),
per_g AS (
  SELECT c_nationkey, count(*)::BIGINT AS n_j,
         sum(avg2_rank)::BIGINT AS s2_j
  FROM ranked GROUP BY 1),
cells AS (
  SELECT n_j,
         floor(s2_j::DOUBLE * s2_j::DOUBLE / n_j + 0.5)::BIGINT AS cell
  FROM per_g),
ties AS (
  SELECT sum(t * t - 1)::BIGINT AS tie_sum, count(*)::BIGINT AS n
  FROM ranked)
SELECT min(n)::BIGINT AS n_customers, count(*)::BIGINT AS k_nations,
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

BANK_QUERIES["customer_nation_balance_kruskal"] = (
    customer_nation_balance_kruskal
)
BANK_ORACLES["customer_nation_balance_kruskal"] = ORACLE_NATION_KRUSKAL


# ------------------------------------- per-dimension sign balance

def embed_dim_sign_balance(spark, sf):
    """Top-8 embedding dimensions by |binomial sign-balance z| —
    does any coordinate lean systematically positive/negative
    (z = (2·n_pos − m)/√m over nonzero entries)?  The cheap mean-
    direction audit beside per-dim kurtosis (tails) and anisotropy
    (global mean cosine): a handful of strongly signed dims is the
    classic rogue-dimension signature that skews every cosine.

    Exactness: n_pos and m are exact integers; the ranking key
    |z| micro-rounds once (ties on dim); z itself is a final double."""
    from pyspark.sql import Window as W

    dims = (
        T(spark, sf, "embeddings")
        .select(F.posexplode("embedding").alias("dim", "x"))
        .filter("x != 0.0")
        .groupBy("dim")
        .agg(
            F.count("*").cast("long").alias("m_nonzero"),
            F.sum(F.expr("if(x > 0.0, 1, 0)")).cast("long").alias(
                "n_pos"
            ),
        )
    )
    scored = dims.select(
        "dim", "m_nonzero", "n_pos",
        F.expr(
            "cast(round(abs(2.0 * n_pos - m_nonzero)"
            " / sqrt(cast(m_nonzero as double)) * 1000000, 0) as bigint)"
        ).alias("absz_micro"),
        F.expr(
            "round((2.0 * n_pos - m_nonzero)"
            " / sqrt(cast(m_nonzero as double)), 6) + 0.0"
        ).alias("sign_z"),
    )
    r = scored.withColumn(
        "rk",
        F.row_number().over(
            W.orderBy(F.col("absz_micro").desc(), F.col("dim").asc())
        ),
    )
    return r.filter(F.col("rk") <= 8).select(
        F.col("dim").cast("long"), "m_nonzero", "n_pos", "sign_z",
        F.col("rk").cast("long"),
    )


ORACLE_SIGN_BALANCE = """
WITH dims AS (
  SELECT dim, count(*)::BIGINT AS m_nonzero,
         sum(CASE WHEN x > 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_pos
  FROM (SELECT u.x AS x, u.dim AS dim
        FROM embeddings,
             unnest(list_transform(embedding,
                    (x, i) -> {'x': x, 'dim': i - 1})) AS t(u))
  WHERE x != 0.0 GROUP BY dim),
scored AS (
  SELECT dim, m_nonzero, n_pos,
         round(abs(2.0 * n_pos - m_nonzero)
               / sqrt(m_nonzero::DOUBLE) * 1000000, 0)::BIGINT
           AS absz_micro,
         round((2.0 * n_pos - m_nonzero)
               / sqrt(m_nonzero::DOUBLE), 6) + 0.0 AS sign_z
  FROM dims),
r AS (
  SELECT dim, m_nonzero, n_pos, sign_z,
         row_number() OVER (ORDER BY absz_micro DESC, dim ASC) AS rk
  FROM scored)
SELECT dim::BIGINT AS dim, m_nonzero, n_pos, sign_z, rk::BIGINT AS rk
FROM r WHERE rk <= 8
"""

BANK_QUERIES["embed_dim_sign_balance"] = embed_dim_sign_balance
BANK_ORACLES["embed_dim_sign_balance"] = ORACLE_SIGN_BALANCE


# --------------------------------- Weibull ventile fit on order totals

# y_j = ln(−ln(1 − j/20)) for j = 1…19, in micro units — shared
# literals injected into BOTH engines (the Φ⁻¹/trig constant idiom)
_WEIBULL_Y_MICRO = [
    -2970195, -2250367, -1816961, -1499940, -1245899, -1030930,
    -842151, -671727, -514437, -366513, -225011, -87422, 48621,
    185627, 326634, 475885, 640337, 834032, 1097189,
]


def orders_totalprice_weibull_ventiles(spark, sf):
    """Weibull plot fit of ORDER TOTALS from nineteen exact ventiles:
    OLS of y = ln(−ln(1−p)) on x = ln(q_p) — second consumer of the
    Weibull-regression discipline after the activity-gap fit, on a
    bounded QUANTILE ladder instead of a distinct-value ECDF (totals
    are near-continuous, so per-point ranks would be a row-scale
    sort; nineteen ×20-exact ventiles carry the same plot).  Shape
    k̂ < 1 = heavy decreasing-hazard totals; k̂ ≈ 1 exponential-like.

    Exactness: ventiles of integer cents are ×20-exact BIGINTs; each
    x micro-rounds ONE ln per point; y are shared micro literals; OLS
    moments are exact integers; slope/intercept final doubles."""
    cents = T(spark, sf, "orders").select(
        F.expr(
            "cast(floor(o_totalprice * 100 + 0.5) as bigint)"
        ).alias("v")
    )
    # ONE percentile(array) aggregate, not nineteen scalar percentile()
    # calls: each scalar call buffers the whole column independently
    # (19× memory and sort work — measured 7× superlinear on the
    # sf0.01→sf0.1 step before the rewrite, 1.11 after)
    fracs = ", ".join(str(j / 20) for j in range(1, 20))
    q = cents.groupBy().agg(
        F.count("*").cast("long").alias("n_orders"),
        F.expr(f"percentile(v, array({fracs}))").alias("qs"),
    ).selectExpr(
        "n_orders",
        *[
            f"cast(floor(20 * qs[{j - 1}] + 0.5) as bigint) AS q{j}_x20"
            for j in range(1, 20)
        ],
    )
    xs = [
        f"cast(round(ln(cast(q{j}_x20 as double) / 20.0) * 1000000, 0)"
        f" as bigint) AS x{j}"
        for j in range(1, 20)
    ]
    pts = q.selectExpr("n_orders", *xs)
    y = _WEIBULL_Y_MICRO
    sx = " + ".join(f"x{j}" for j in range(1, 20))
    sy = sum(y)
    sxx = " + ".join(
        f"cast(x{j} as decimal(38,0)) * cast(x{j} as decimal(38,0))"
        for j in range(1, 20)
    )
    sxy = " + ".join(
        f"cast(x{j} as decimal(38,0)) * ({y[j - 1]})" for j in range(1, 20)
    )
    return pts.selectExpr(
        "n_orders",
        f"case when 19 * ({sxx}) - cast({sx} as decimal(38,0))"
        f" * cast({sx} as decimal(38,0)) != 0 then"
        f" round((19.0 * cast({sxy} as double)"
        f" - cast({sx} as double) * ({sy}.0))"
        f" / (19.0 * cast({sxx} as double)"
        f" - cast({sx} as double) * cast({sx} as double)), 6) + 0.0 end"
        " AS shape_k",
        f"round((({sy}.0) - (19.0 * cast({sxy} as double)"
        f" - cast({sx} as double) * ({sy}.0))"
        f" / (19.0 * cast({sxx} as double)"
        f" - cast({sx} as double) * cast({sx} as double))"
        f" * cast({sx} as double)) / (19.0 * 1000000.0), 6) + 0.0"
        " AS intercept_nats",
    )


def _oracle_weibull_ventiles() -> str:
    y = _WEIBULL_Y_MICRO
    decs = ",\n         ".join(
        f"floor(20 * quantile_cont(v, {j / 20}) + 0.5)::BIGINT"
        f" AS q{j}_x20"
        for j in range(1, 20)
    )
    xs = ",\n       ".join(
        f"round(ln(q{j}_x20::DOUBLE / 20.0) * 1000000, 0)::BIGINT AS x{j}"
        for j in range(1, 20)
    )
    sx = " + ".join(f"x{j}" for j in range(1, 20))
    sy = sum(y)
    sxx = " + ".join(
        f"x{j}::DECIMAL(38,0) * x{j}::DECIMAL(38,0)" for j in range(1, 20)
    )
    sxy = " + ".join(
        f"x{j}::DECIMAL(38,0) * ({y[j - 1]})" for j in range(1, 20)
    )
    return f"""
WITH cents AS (
  SELECT floor(o_totalprice * 100 + 0.5)::BIGINT AS v FROM orders),
q AS (
  SELECT count(*)::BIGINT AS n_orders,
         {decs}
  FROM cents),
pts AS (
  SELECT n_orders,
       {xs}
  FROM q)
SELECT n_orders,
       CASE WHEN 19 * ({sxx}) - ({sx})::DECIMAL(38,0)
                 * ({sx})::DECIMAL(38,0) != 0 THEN
         round((19.0 * ({sxy})::DOUBLE - ({sx})::DOUBLE * ({sy}.0))
               / (19.0 * ({sxx})::DOUBLE
                  - ({sx})::DOUBLE * ({sx})::DOUBLE), 6) + 0.0 END
         AS shape_k,
       round((({sy}.0) - (19.0 * ({sxy})::DOUBLE
                          - ({sx})::DOUBLE * ({sy}.0))
              / (19.0 * ({sxx})::DOUBLE
                 - ({sx})::DOUBLE * ({sx})::DOUBLE)
              * ({sx})::DOUBLE) / (19.0 * 1000000.0), 6) + 0.0
         AS intercept_nats
FROM pts
"""


BANK_QUERIES["orders_totalprice_weibull_ventiles"] = (
    orders_totalprice_weibull_ventiles
)
BANK_ORACLES["orders_totalprice_weibull_ventiles"] = (
    _oracle_weibull_ventiles()
)


# ---------------------------------------- CUSUM changepoint strength

def events_daily_cusum_max(spark, sf):
    """Maximum CUSUM deviation of the daily event-count series:
    max_t |D·S_t − t·S| (the exactly-scaled form of
    max|S_t − (t/D)·S|) with its argmax day — the changepoint
    STRENGTH-AND-LOCATION scalar beside events_changepoint_binary's
    split decision and the EWMA/drift monitors.  Normalized by
    D·√(Σ(D·x−S)²/D) so rounds compare across SFs.

    Exactness: running sums and the max statistic are exact BIGINTs
    (running-sum window over the bounded day relation, earliest-day
    tie rule); the normalized ratio is one final double."""
    from pyspark.sql import Window as W

    daily = (
        T(spark, sf, "events")
        .groupBy(F.expr("to_date(ts)").alias("d"))
        .agg(F.count("*").alias("c"))
    )
    tot = daily.groupBy().agg(
        F.count("*").alias("nd"), F.sum("c").alias("s"),
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    m = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn("t", F.row_number().over(W.orderBy("d")).cast("long"))
        .withColumn("st", F.sum("c").over(w))
        .select(
            "d", "nd", "s",
            F.expr("abs(nd * st - t * s)").alias("absm"),
            F.expr("cast(nd as bigint) * c - s").alias("y"),
        )
    )
    best = m.withColumn(
        "rk",
        F.row_number().over(
            W.orderBy(F.col("absm").desc(), F.col("d").asc())
        ),
    )
    var = m.groupBy().agg(
        F.sum(
            F.expr(
                "cast(y as decimal(38,0)) * cast(y as decimal(38,0))"
            )
        ).alias("yy")
    )
    return (
        best.filter("rk = 1")
        .crossJoin(F.broadcast(var))
        .selectExpr(
            "cast(nd as bigint) AS n_days",
            "cast(d as string) AS cusum_day",
            "cast(absm as bigint) AS max_abs_m",
            "case when yy > 0 then round(cast(absm as double)"
            " / (cast(nd as double)"
            " * sqrt(cast(yy as double) / nd)), 6) + 0.0 end"
            " AS cusum_ratio",
        )
    )


ORACLE_CUSUM = """
WITH daily AS (
  SELECT ts::DATE AS d, count(*)::BIGINT AS c FROM events GROUP BY 1),
tot AS (
  SELECT count(*)::BIGINT AS nd, sum(c)::BIGINT AS s FROM daily),
m AS (
  SELECT d, nd, s,
         abs(nd * sum(c) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - (row_number() OVER (ORDER BY d)) * s)::BIGINT AS absm,
         (nd * c - s)::DECIMAL(38,0) AS y
  FROM daily CROSS JOIN tot),
var AS (SELECT sum(y * y) AS yy FROM m),
best AS (
  SELECT d, nd, absm,
         row_number() OVER (ORDER BY absm DESC, d ASC) AS rk
  FROM m)
SELECT nd::BIGINT AS n_days, d::VARCHAR AS cusum_day,
       absm::BIGINT AS max_abs_m,
       CASE WHEN yy > 0 THEN
         round(absm::DOUBLE / (nd::DOUBLE * sqrt(yy::DOUBLE / nd)), 6)
           + 0.0 END AS cusum_ratio
FROM best CROSS JOIN var WHERE rk = 1
"""

BANK_QUERIES["events_daily_cusum_max"] = events_daily_cusum_max
BANK_ORACLES["events_daily_cusum_max"] = ORACLE_CUSUM


# ----------------------------------- pairwise KS matrix across types

def events_type_value_ks_matrix(spark, sf):
    """Pairwise two-sample KS between EVERY two event types' value
    distributions on the shared fixed bin grid — the full drift
    MATRIX where the registered KS keys read one-vs-rest and the QQ
    ladder reads deciles (the matrix is what a mixture-planning pass
    actually consumes: which type pairs are interchangeable).

    Exactness: per-(type, bin) counts are exact; the max gap is
    max |c_a·n_b − c_b·n_a| over the densified grid (exact BIGINT
    cross products); D is one final double.  Scale: one events pass
    to the types × 64 grid; the pair frame is ≤ types² × 64."""
    from pyspark.sql import Window as W

    from faconne_spark.operators.evalstats import ks_binned
    from faconne_spark.queries.bank_r6 import KS_BINS, KS_LO, KS_WIDTH

    binned = ks_binned(
        T(spark, sf, "events"), "event_type", "value",
        KS_LO, KS_WIDTH, KS_BINS,
    )
    # densify: every (type, grid-bin) cell, zeros included — the
    # cumulative walk needs aligned bins on both sides
    grid = (
        binned.select("grp").distinct()
        .crossJoin(
            F.broadcast(
                binned.sparkSession.range(KS_BINS).selectExpr(
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
        F.col("grp").alias("type_a"), "bin",
        F.col("cc").alias("ca"), F.col("n").alias("na"),
    )
    b = cum.select(
        F.col("grp").alias("type_b"), "bin",
        F.col("cc").alias("cb"), F.col("n").alias("nb"),
    )
    pairs = a.join(b, "bin").filter(F.col("type_a") < F.col("type_b"))
    return (
        pairs.groupBy("type_a", "type_b")
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
            "type_a", "type_b", "n_a", "n_b",
            "round(cast(gap as double)"
            " / (cast(n_a as double) * cast(n_b as double)), 6) + 0.0"
            " AS ks_d",
        )
    )


def _oracle_ks_matrix() -> str:
    from faconne_spark.queries.bank_r6 import KS_BINS, KS_LO, KS_WIDTH

    return f"""
WITH binned AS (
  SELECT event_type AS grp,
         least(greatest(floor((value - {KS_LO!r}) / {KS_WIDTH!r}),
           0), {KS_BINS - 1})::INT AS bin,
         count(*)::BIGINT AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
grid AS (
  SELECT grp, r.range::INT AS bin
  FROM (SELECT DISTINCT grp FROM binned), range(0, {KS_BINS}) r),
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
SELECT a.grp AS type_a, b.grp AS type_b,
       max(a.n)::BIGINT AS n_a, max(b.n)::BIGINT AS n_b,
       round(max(abs(a.cc::DECIMAL(38,0) * b.n
                     - b.cc::DECIMAL(38,0) * a.n))::DOUBLE
             / (max(a.n)::DOUBLE * max(b.n)::DOUBLE), 6) + 0.0 AS ks_d
FROM cum a JOIN cum b ON a.bin = b.bin AND a.grp < b.grp
GROUP BY a.grp, b.grp
"""


BANK_QUERIES["events_type_value_ks_matrix"] = events_type_value_ks_matrix
BANK_ORACLES["events_type_value_ks_matrix"] = _oracle_ks_matrix()


# --------------------------------- negative-balance share, Wilson CI

def customer_neg_balance_share(spark, sf):
    """Share of customers in arrears (negative account balance) per
    market segment, with Wilson 95 % bounds — the binomial-rate
    version of the balance location tests (Welch/ANOVA compare means;
    risk teams cap SEGMENTS by their arrears RATE, which needs an
    error bar that respects [0, 1] at small n).  Third consumer of
    the shared wilson_bounds_sql text."""
    from faconne_spark.operators.relational import wilson_bounds_sql

    m = T(spark, sf, "customer").groupBy(
        F.col("c_mktsegment").alias("seg")
    ).agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum(F.expr("if(c_acctbal < 0, 1, 0)")).cast("long").alias(
            "n_negative"
        ),
    )
    lo, hi = wilson_bounds_sql("n_negative", "n_customers")
    return m.selectExpr(
        "seg", "n_customers", "n_negative",
        "cast((2 * 1000000 * n_negative + n_customers)"
        " div (2 * n_customers) as bigint) AS share_micro",
        f"round({lo}, 6) + 0.0 AS wilson_lo",
        f"round({hi}, 6) + 0.0 AS wilson_hi",
    )


def _oracle_neg_balance() -> str:
    from faconne_spark.operators.relational import wilson_bounds_sql

    lo, hi = wilson_bounds_sql("n_negative", "n_customers")
    return f"""
WITH m AS (
  SELECT c_mktsegment AS seg, count(*)::BIGINT AS n_customers,
         sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)::BIGINT
           AS n_negative
  FROM customer GROUP BY 1)
SELECT seg, n_customers, n_negative,
       ((2 * 1000000 * n_negative + n_customers)
        // (2 * n_customers))::BIGINT AS share_micro,
       round({lo}, 6) + 0.0 AS wilson_lo,
       round({hi}, 6) + 0.0 AS wilson_hi
FROM m
"""


BANK_QUERIES["customer_neg_balance_share"] = customer_neg_balance_share
BANK_ORACLES["customer_neg_balance_share"] = _oracle_neg_balance()


# ------------------------------------------ tax × discount Pearson

def lineitem_tax_discount_corr(spark, sf):
    """Pearson correlation between line tax and discount rates — the
    pricing-policy coupling check (a nonzero r means the two levers
    are applied together, so margin models can't treat them as
    independent).  Kendall already reads the MONOTONE version from
    the contingency table; this is the linear-moment twin on the
    same bounded centi domains.

    Exactness: both rates are exact centi integers; the five moment
    sums run in BIGINT/DECIMAL(38,0); r is one final double."""
    li = T(spark, sf, "lineitem").select(
        F.expr("cast(floor(l_tax * 100 + 0.5) as bigint)").alias("x"),
        F.expr("cast(floor(l_discount * 100 + 0.5) as bigint)").alias(
            "y"
        ),
    )
    m = li.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(
            F.col("x").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)")
        ).alias("sxy"),
        F.sum(
            F.col("x").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)")
        ).alias("sxx"),
        F.sum(
            F.col("y").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)")
        ).alias("syy"),
    )
    return m.selectExpr(
        "n AS n_lines",
        "case when cast(n as double) * cast(sxx as double)"
        " - cast(sx as double) * cast(sx as double) > 0"
        " and cast(n as double) * cast(syy as double)"
        " - cast(sy as double) * cast(sy as double) > 0 then"
        " round((cast(n as double) * cast(sxy as double)"
        " - cast(sx as double) * cast(sy as double))"
        " / sqrt((cast(n as double) * cast(sxx as double)"
        " - cast(sx as double) * cast(sx as double))"
        " * (cast(n as double) * cast(syy as double)"
        " - cast(sy as double) * cast(sy as double))), 6) + 0.0 end"
        " AS pearson_r",
    )


ORACLE_TAX_DISCOUNT = """
WITH li AS (
  SELECT floor(l_tax * 100 + 0.5)::BIGINT AS x,
         floor(l_discount * 100 + 0.5)::BIGINT AS y
  FROM lineitem),
m AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy,
         sum(x::DECIMAL(38,0) * y::DECIMAL(38,0)) AS sxy,
         sum(x::DECIMAL(38,0) * x::DECIMAL(38,0)) AS sxx,
         sum(y::DECIMAL(38,0) * y::DECIMAL(38,0)) AS syy
  FROM li)
SELECT n AS n_lines,
       CASE WHEN n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0
             AND n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE > 0
       THEN round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                  / sqrt((n::DOUBLE * sxx::DOUBLE
                          - sx::DOUBLE * sx::DOUBLE)
                         * (n::DOUBLE * syy::DOUBLE
                            - sy::DOUBLE * sy::DOUBLE)), 6) + 0.0 END
         AS pearson_r
FROM m
"""

BANK_QUERIES["lineitem_tax_discount_corr"] = lineitem_tax_discount_corr
BANK_ORACLES["lineitem_tax_discount_corr"] = ORACLE_TAX_DISCOUNT


# ------------------------------------- gap serial correlation (lag 1)

def events_user_gap_autocorr(spark, sf):
    """Lag-1 serial correlation of successive inter-event gaps within
    user streams — does a short gap predict another short gap?  The
    micro-level clustering gauge the DAILY Ljung–Box cannot see
    (bursts inside one day are invisible to day-grain ACF; positive
    gap autocorrelation is the signature of sessions/automation,
    feeding the session-gap threshold choice).

    Exactness: gaps are exact µs integers (the sub-second lesson);
    (gap, next-gap) pairs come from a second lag over the same
    user-partitioned window; Pearson from exact DECIMAL moments, one
    final double."""
    from pyspark.sql import Window as W

    ev = T(spark, sf, "events").select(
        "user_id", F.expr("unix_micros(ts)").alias("t")
    )
    w = W.partitionBy("user_id").orderBy("t")
    g = ev.withColumn("gap", F.col("t") - F.lag("t").over(w)).withColumn(
        "prev_gap", F.lag(F.col("t") - F.lag("t").over(w)).over(w)
    ).filter("gap is not null and prev_gap is not null")
    m = g.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.sum("gap").alias("sx"), F.sum("prev_gap").alias("sy"),
        F.sum(
            F.col("gap").cast("decimal(38,0)")
            * F.col("prev_gap").cast("decimal(38,0)")
        ).alias("sxy"),
        F.sum(
            F.col("gap").cast("decimal(38,0)")
            * F.col("gap").cast("decimal(38,0)")
        ).alias("sxx"),
        F.sum(
            F.col("prev_gap").cast("decimal(38,0)")
            * F.col("prev_gap").cast("decimal(38,0)")
        ).alias("syy"),
    )
    return m.selectExpr(
        "n AS n_gap_pairs",
        "case when cast(n as double) * cast(sxx as double)"
        " - cast(sx as double) * cast(sx as double) > 0"
        " and cast(n as double) * cast(syy as double)"
        " - cast(sy as double) * cast(sy as double) > 0 then"
        " round((cast(n as double) * cast(sxy as double)"
        " - cast(sx as double) * cast(sy as double))"
        " / sqrt((cast(n as double) * cast(sxx as double)"
        " - cast(sx as double) * cast(sx as double))"
        " * (cast(n as double) * cast(syy as double)"
        " - cast(sy as double) * cast(sy as double))), 6) + 0.0 end"
        " AS gap_autocorr",
    )


ORACLE_GAP_AUTOCORR = """
WITH ev AS (
  SELECT user_id, epoch_us(ts)::BIGINT AS t FROM events),
g0 AS (
  SELECT user_id, t,
         t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
  FROM ev),
g AS (
  SELECT gap,
         lag(gap) OVER (PARTITION BY user_id ORDER BY t) AS prev_gap
  FROM g0),
p AS (SELECT gap, prev_gap FROM g
      WHERE gap IS NOT NULL AND prev_gap IS NOT NULL),
m AS (
  SELECT count(*)::BIGINT AS n, sum(gap)::BIGINT AS sx,
         sum(prev_gap)::BIGINT AS sy,
         sum(gap::DECIMAL(38,0) * prev_gap::DECIMAL(38,0)) AS sxy,
         sum(gap::DECIMAL(38,0) * gap::DECIMAL(38,0)) AS sxx,
         sum(prev_gap::DECIMAL(38,0) * prev_gap::DECIMAL(38,0)) AS syy
  FROM p)
SELECT n AS n_gap_pairs,
       CASE WHEN n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0
             AND n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE > 0
       THEN round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                  / sqrt((n::DOUBLE * sxx::DOUBLE
                          - sx::DOUBLE * sx::DOUBLE)
                         * (n::DOUBLE * syy::DOUBLE
                            - sy::DOUBLE * sy::DOUBLE)), 6) + 0.0 END
         AS gap_autocorr
FROM m
"""

BANK_QUERIES["events_user_gap_autocorr"] = events_user_gap_autocorr
BANK_ORACLES["events_user_gap_autocorr"] = ORACLE_GAP_AUTOCORR


# ------------------------------------- hourly peak/trough per type

def events_hourly_peak_trough(spark, sf):
    """Peak and trough hour of day per event type with their share
    ratio — the capacity-planning read-off the 24-cell profile keys
    compute but don't summarize (the KL key says HOW peaked; this
    says WHEN, and the peak/trough ratio is the overprovisioning
    factor a flat fleet pays).

    Exactness: counts are exact; peak/trough pick deterministic
    (count DESC/ASC, hour ASC tiebreak); the ratio is a half-up
    micro division of exact integers."""
    from pyspark.sql import Window as W

    cells = (
        T(spark, sf, "events")
        .select("event_type", F.expr("cast(hour(ts) as int)").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count("*").cast("long").alias("c"))
    )
    pk = cells.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(
                F.col("c").desc(), F.col("h").asc()
            )
        ),
    ).filter("rk = 1").select(
        "event_type", F.col("h").alias("peak_hour"),
        F.col("c").alias("peak_n"),
    )
    tr = cells.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(
                F.col("c").asc(), F.col("h").asc()
            )
        ),
    ).filter("rk = 1").select(
        "event_type", F.col("h").alias("trough_hour"),
        F.col("c").alias("trough_n"),
    )
    return pk.join(tr, "event_type").selectExpr(
        "event_type", "peak_hour", "peak_n", "trough_hour", "trough_n",
        "cast((2 * 1000000 * peak_n + trough_n) div (2 * trough_n)"
        " as bigint) AS peak_trough_ratio_micro",
    )


ORACLE_PEAK_TROUGH = """
WITH cells AS (
  SELECT event_type, extract(hour FROM ts)::INT AS h,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
pk AS (
  SELECT event_type, h AS peak_hour, c AS peak_n FROM (
    SELECT event_type, h, c,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY c DESC, h ASC) AS rk
    FROM cells) WHERE rk = 1),
tr AS (
  SELECT event_type, h AS trough_hour, c AS trough_n FROM (
    SELECT event_type, h, c,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY c ASC, h ASC) AS rk
    FROM cells) WHERE rk = 1)
SELECT event_type, peak_hour, peak_n, trough_hour, trough_n,
       ((2 * 1000000 * peak_n + trough_n) // (2 * trough_n))::BIGINT
         AS peak_trough_ratio_micro
FROM pk JOIN tr USING (event_type)
"""

BANK_QUERIES["events_hourly_peak_trough"] = events_hourly_peak_trough
BANK_ORACLES["events_hourly_peak_trough"] = ORACLE_PEAK_TROUGH


# --------------------------------- frequency-spectrum shares (n1/n2/n3)

def docs_freq_spectrum_shares(spark, sf):
    """Word-frequency spectrum head per source: hapax/dis/tris
    legomena counts and their vocabulary shares, plus Sichel's
    dis-legomena proportion — the per-source spectrum shape whose
    corpus-level tail feeds Chao1/Good–Turing (two sources with equal
    TTR can still have very different n1/n2 balance, which is what
    smoothing and unseen-mass estimates actually consume).

    Exactness: spectrum counts are exact integers off the
    (source, count) count-of-counts relation; shares are half-up
    micro divisions."""
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "spark")
    cnt = (
        T(spark, sf, "documents")
        .select("source", F.explode(F.expr(toks)).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    return cnt.groupBy("source").agg(
        F.count("*").cast("long").alias("vocab"),
        F.sum(F.expr("if(c = 1, 1, 0)")).cast("long").alias("n1"),
        F.sum(F.expr("if(c = 2, 1, 0)")).cast("long").alias("n2"),
        F.sum(F.expr("if(c = 3, 1, 0)")).cast("long").alias("n3"),
    ).selectExpr(
        "source", "vocab", "n1", "n2", "n3",
        "cast((2 * 1000000 * n1 + vocab) div (2 * vocab) as bigint)"
        " AS hapax_share_micro",
        "cast((2 * 1000000 * n2 + vocab) div (2 * vocab) as bigint)"
        " AS dis_share_micro",
        "cast((2 * 1000000 * n3 + vocab) div (2 * vocab) as bigint)"
        " AS tris_share_micro",
    )


def _oracle_spectrum_shares() -> str:
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    return f"""
WITH cnt AS (
  SELECT source, w, count(*)::BIGINT AS c
  FROM (SELECT source, unnest({toks}) AS w FROM documents)
  GROUP BY 1, 2),
g AS (
  SELECT source, count(*)::BIGINT AS vocab,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
         sum(CASE WHEN c = 3 THEN 1 ELSE 0 END)::BIGINT AS n3
  FROM cnt GROUP BY 1)
SELECT source, vocab, n1, n2, n3,
       ((2 * 1000000 * n1 + vocab) // (2 * vocab))::BIGINT
         AS hapax_share_micro,
       ((2 * 1000000 * n2 + vocab) // (2 * vocab))::BIGINT
         AS dis_share_micro,
       ((2 * 1000000 * n3 + vocab) // (2 * vocab))::BIGINT
         AS tris_share_micro
FROM g
"""


BANK_QUERIES["docs_freq_spectrum_shares"] = docs_freq_spectrum_shares
BANK_ORACLES["docs_freq_spectrum_shares"] = _oracle_spectrum_shares()


# ------------------------------- two-sample Anderson–Darling (binned)

def events_weekend_anderson_darling(spark, sf):
    """Binned two-sample Anderson–Darling statistic, weekend vs
    weekday values — completes the drift family's weighting spectrum
    (KS: worst single gap; CvM: every gap equally; ENERGY: gaps
    weighted by distance; AD: gaps weighted by 1/(F(1−F)), i.e. the
    TAILS — a divergence confined to the extreme values that CvM
    averages away is exactly what AD amplifies).  Discrete Pettitt
    (1976) form on the shared 256-bin grid: A² = (1/(n₁n₂)) Σ
    b·(N·F₁ − n₁·B)²/(B·(N−B)) over bins with 0 < B < N (same
    grouped-data convention as the banked CvM).

    Exactness: all counts exact integers; each bin's term micro-
    rounds ONE double expression (per-cell rule), integer sum, the
    statistic is one final division."""
    from pyspark.sql import Window as W

    from faconne_spark.queries.bank_r11 import (
        CVM_BINS, CVM_LO, CVM_WIDTH,
    )

    ev = T(spark, sf, "events").select(
        F.expr(
            "cast(datediff(to_date(ts), DATE'1970-01-01') % 7 in (2, 3)"
            " as int)"
        ).alias("we"),
        F.expr(
            f"cast(least(greatest(floor((value - {CVM_LO!r})"
            f" / {CVM_WIDTH!r}), 0), {CVM_BINS - 1}) as int)"
        ).alias("bin"),
    )
    binned = ev.groupBy("bin").agg(
        F.sum("we").alias("c1b"),
        F.sum(F.expr("1 - we")).alias("c2b"),
    )
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    full = W.orderBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = binned.select(
        "bin",
        F.sum("c1b").over(w).alias("f1"),
        (F.sum("c1b").over(w) + F.sum("c2b").over(w)).alias("bb"),
        F.sum("c1b").over(full).alias("n1"),
        F.sum("c2b").over(full).alias("n2"),
        (F.col("c1b") + F.col("c2b")).alias("wgt"),
    )
    terms = cum.filter("bb > 0 and bb < n1 + n2").select(
        "n1", "n2",
        F.expr(
            "cast(round(cast(wgt as double)"
            " * (cast(f1 as double) * (n1 + n2)"
            "    - cast(n1 as double) * bb)"
            " * (cast(f1 as double) * (n1 + n2)"
            "    - cast(n1 as double) * bb)"
            " / (cast(bb as double) * (n1 + n2 - bb))"
            " / (cast(n1 as double) * n2) * 1000000, 0) as bigint)"
        ).alias("term_micro"),
    )
    return terms.groupBy().agg(
        F.min("n1").cast("long").alias("n_weekend"),
        F.min("n2").cast("long").alias("n_weekday"),
        F.sum("term_micro").alias("ad_sum_micro"),
        F.expr(
            "round(cast(sum(term_micro) as double) / 1e6, 6) + 0.0"
        ).alias("ad_stat"),
    )


def _oracle_weekend_ad() -> str:
    from faconne_spark.queries.bank_r11 import (
        CVM_BINS, CVM_LO, CVM_WIDTH,
    )

    return f"""
WITH ev AS (
  SELECT ((ts::DATE - DATE '1970-01-01') % 7 IN (2, 3))::INT AS we,
         least(greatest(floor((value - {CVM_LO!r}) / {CVM_WIDTH!r}), 0),
               {CVM_BINS - 1})::INT AS bin
  FROM events),
binned AS (
  SELECT bin, sum(we)::BIGINT AS c1b, sum(1 - we)::BIGINT AS c2b
  FROM ev GROUP BY 1),
cum AS (
  SELECT bin,
         sum(c1b) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
         sum(c1b + c2b) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bb,
         sum(c1b) OVER () AS n1, sum(c2b) OVER () AS n2,
         (c1b + c2b) AS wgt
  FROM binned),
terms AS (
  SELECT n1, n2,
         round(wgt::DOUBLE
           * (f1::DOUBLE * (n1 + n2) - n1::DOUBLE * bb)
           * (f1::DOUBLE * (n1 + n2) - n1::DOUBLE * bb)
           / (bb::DOUBLE * (n1 + n2 - bb))
           / (n1::DOUBLE * n2) * 1000000, 0)::BIGINT AS term_micro
  FROM cum WHERE bb > 0 AND bb < n1 + n2)
SELECT min(n1)::BIGINT AS n_weekend, min(n2)::BIGINT AS n_weekday,
       sum(term_micro)::BIGINT AS ad_sum_micro,
       round(sum(term_micro)::DOUBLE / 1e6, 6) + 0.0 AS ad_stat
FROM terms
"""


BANK_QUERIES["events_weekend_anderson_darling"] = (
    events_weekend_anderson_darling
)
BANK_ORACLES["events_weekend_anderson_darling"] = _oracle_weekend_ad()


# ------------------------------------ language mix entropy per source

def docs_lang_mix_entropy(spark, sf):
    """Shannon entropy (exact micro-nats) of each source's language
    mix, with the dominant language and its share — the one-scalar
    'is this source monolingual' gauge beside the source↔corpus KL
    key (routing text through language-specific quality models needs
    the per-source verdict, not the corpus comparison).

    Exactness: per-cell ln of the exact BIGINT ratio n/c_l
    micro-rounds once per (source, lang); weighted integer sum;
    dominant-language pick deterministic (count DESC, lang ASC)."""
    from pyspark.sql import Window as W

    cells = (
        T(spark, sf, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = cells.groupBy("source").agg(F.sum("c").alias("n"))
    terms = cells.join(F.broadcast(tot), "source").select(
        "source", "n",
        F.expr(
            "cast(c as decimal(38,0))"
            " * cast(round(ln(cast(n as double) / c) * 1000000, 0)"
            " as bigint)"
        ).alias("t"),
    )
    ent = terms.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        # sum(t) is DECIMAL — cast to BIGINT BEFORE the half-up div:
        # DuckDB's // on DECIMAL is true division (the r11 probe), so
        # the idiom is only portable on integer types
        F.expr(
            "cast((2 * cast(sum(t) as bigint) + max(n))"
            " div (2 * max(n)) as bigint)"
        ).alias("entropy_micro_nats"),
    )
    dom = cells.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("source").orderBy(
                F.col("c").desc(), F.col("lang").asc()
            )
        ),
    ).filter("rk = 1").select(
        "source", F.col("lang").alias("top_lang"),
        F.col("c").alias("top_lang_docs"),
    )
    return ent.join(dom, "source").selectExpr(
        "source", "n_docs", "entropy_micro_nats", "top_lang",
        "cast((2 * 1000000 * top_lang_docs + n_docs)"
        " div (2 * n_docs) as bigint) AS top_lang_share_micro",
    )


ORACLE_LANG_MIX = """
WITH cells AS (
  SELECT source, lang, count(*)::BIGINT AS c
  FROM documents GROUP BY 1, 2),
tot AS (SELECT source, sum(c)::BIGINT AS n FROM cells GROUP BY 1),
terms AS (
  SELECT c0.source, n,
         c::DECIMAL(38,0)
           * round(ln(n::DOUBLE / c) * 1000000, 0)::BIGINT AS t
  FROM cells c0 JOIN tot USING (source)),
ent AS (
  SELECT source, max(n)::BIGINT AS n_docs,
         ((2 * sum(t)::BIGINT + max(n)) // (2 * max(n)))::BIGINT
           AS entropy_micro_nats
  FROM terms GROUP BY 1),
dom AS (
  SELECT source, lang AS top_lang, c AS top_lang_docs FROM (
    SELECT source, lang, c,
           row_number() OVER (PARTITION BY source
                              ORDER BY c DESC, lang ASC) AS rk
    FROM cells) WHERE rk = 1)
SELECT source, n_docs, entropy_micro_nats, top_lang,
       ((2 * 1000000 * top_lang_docs + n_docs)
        // (2 * n_docs))::BIGINT AS top_lang_share_micro
FROM ent JOIN dom USING (source)
"""

BANK_QUERIES["docs_lang_mix_entropy"] = docs_lang_mix_entropy
BANK_ORACLES["docs_lang_mix_entropy"] = ORACLE_LANG_MIX


# --------------------------------------- hourly VALUE median profile

def events_hour_value_median_profile(spark, sf):
    """×2-exact median event value per hour of day (24 rows) with
    volume — the VALUE clock beside the count-based hourly keys (a
    peak-traffic hour with a LOW median ticket and a quiet hour with
    whales are opposite capacity/fraud stories the count profile
    cannot tell apart)."""
    ev = T(spark, sf, "events").select(
        F.expr("cast(hour(ts) as int)").alias("h"),
        F.expr("cast(floor(value * 1000000 + 0.5) as bigint)").alias("v"),
    )
    return ev.groupBy("h").agg(
        F.count("*").cast("long").alias("n_events"),
        F.expr(
            "cast(floor(2 * percentile(v, 0.5) + 0.5) as bigint)"
        ).alias("med_value_x2"),
        F.expr(
            "cast(floor(4 * percentile(v, 0.75) + 0.5) as bigint)"
        ).alias("q3_value_x4"),
    )


ORACLE_HOUR_VALUE_MEDIAN = """
SELECT extract(hour FROM ts)::INT AS h, count(*)::BIGINT AS n_events,
       floor(2 * quantile_cont(floor(value * 1000000 + 0.5)::BIGINT,
                               0.5) + 0.5)::BIGINT AS med_value_x2,
       floor(4 * quantile_cont(floor(value * 1000000 + 0.5)::BIGINT,
                               0.75) + 0.5)::BIGINT AS q3_value_x4
FROM events GROUP BY 1
"""

BANK_QUERIES["events_hour_value_median_profile"] = (
    events_hour_value_median_profile
)
BANK_ORACLES["events_hour_value_median_profile"] = (
    ORACLE_HOUR_VALUE_MEDIAN
)


# ------------------------------------------- per-doc TTR distribution

def docs_ttr_quantiles(spark, sf):
    """Quartiles of the PER-DOCUMENT type-token ratio per source —
    the ttr-by-source key reports one pooled mean; gate THRESHOLDS
    need the distribution (where does the repetitive tail start, and
    how wide is the spread a cutoff must tolerate).

    Exactness: each document's TTR micro-rounds ONCE (distinct/total
    integer ratio, half-up); the ×4 quartiles of those micro integers
    are exact BIGINTs.  Map-only per-doc fold, one groupBy."""
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "spark")
    per_doc = T(spark, sf, "documents").select(
        "source",
        F.expr(
            f"cast((2 * 1000000 * size(array_distinct({toks}))"
            f" + size({toks})) div (2 * size({toks})) as bigint)"
        ).alias("ttr_micro"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr(
            "cast(floor(4 * percentile(ttr_micro, 0.25) + 0.5) as bigint)"
        ).alias("q1_x4"),
        F.expr(
            "cast(floor(4 * percentile(ttr_micro, 0.5) + 0.5) as bigint)"
        ).alias("q2_x4"),
        F.expr(
            "cast(floor(4 * percentile(ttr_micro, 0.75) + 0.5) as bigint)"
        ).alias("q3_x4"),
    )


def _oracle_ttr_quantiles() -> str:
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    return f"""
WITH per_doc AS (
  SELECT source,
         ((2 * 1000000 * len(list_distinct({toks}))
           + len({toks})) // (2 * len({toks})))::BIGINT AS ttr_micro
  FROM documents)
SELECT source, count(*)::BIGINT AS n_docs,
       floor(4 * quantile_cont(ttr_micro, 0.25) + 0.5)::BIGINT AS q1_x4,
       floor(4 * quantile_cont(ttr_micro, 0.5) + 0.5)::BIGINT AS q2_x4,
       floor(4 * quantile_cont(ttr_micro, 0.75) + 0.5)::BIGINT AS q3_x4
FROM per_doc GROUP BY source
"""


BANK_QUERIES["docs_ttr_quantiles"] = docs_ttr_quantiles
BANK_ORACLES["docs_ttr_quantiles"] = _oracle_ttr_quantiles()


# Registered at the round-12 open (judge r11 ask #1): _merged() reads
# these module-level aliases, the window block in queries/__init__.py
# front-loads all twenty-two keys for the driver's correctness gate.
QUERIES = BANK_QUERIES
ORACLES = BANK_ORACLES
