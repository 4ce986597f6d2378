"""Round-9 wave-3 hardening: the distributed rank primitive proven
against a naive window rank on constructed tie-heavy data, plus the
partitioning-invariance sweep over the eight new registry keys (rank
sums, tie counts, and DECIMAL weighted sums are the partition-
sensitive shapes this wave adds).

The cross-engine value proof itself lives in tests/test_oracle.py once
the keys are registered (every registry key runs Spark-vs-DuckDB
there); this file covers what the oracle gate cannot: the primitive's
contract on hostile inputs and shuffle-layout independence."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE3 = [
    "orders_revenue_theil_nation", "events_daily_overdispersion",
    "part_brand_price_kruskal", "events_value_brownforsythe",
    "orders_seasonal_naive_mase", "docs_word_dispersion_dp",
    "embed_dim_variance_concentration", "events_weekend_wilcoxon",
]


def test_distributed_avg_ranks_matches_naive_window(spark):
    """avg2 = 2·rank() + ties − 1 from a partition-less window is the
    textbook definition; the two-phase operator must reproduce it
    bit-for-bit on tie-heavy data spanning several buckets (values
    repeat 1-40 times over a wide range, including negatives and the
    min/max edge bins)."""
    from pyspark.sql import functions as F

    from faconne_spark.operators.relational import distributed_avg_ranks

    rows = []
    v = -1000
    for i in range(200):
        v += (i * 7919) % 97  # irregular gaps, deterministic
        for _ in range((i % 40) + 1):
            rows.append((len(rows), v))
    df = spark.createDataFrame(rows, "id long, v long")

    got = {
        r["id"]: (r["avg2_rank"], r["t"])
        for r in distributed_avg_ranks(
            df, "v", n_buckets=16, ties_col="t"
        ).collect()
    }
    naive = {
        r["id"]: (r["a2"], r["t"])
        for r in df.selectExpr(
            "id",
            "2 * rank() OVER (ORDER BY v)"
            " + count(*) OVER (PARTITION BY v) - 1 AS a2",
            "count(*) OVER (PARTITION BY v) AS t",
        ).collect()
    }
    assert got == naive
    # rank-sum identity: Σ avg ranks = n(n+1)/2  ⇒  Σ avg2 = n(n+1)
    n = len(rows)
    assert sum(a for a, _ in got.values()) == n * (n + 1)


def test_distributed_avg_ranks_single_value(spark):
    """Degenerate all-ties input: every row gets the midrank
    (n+1)/2 — avg2 = n + 1 — and the bucket machinery must not
    divide by a zero value range."""
    from faconne_spark.operators.relational import distributed_avg_ranks

    df = spark.createDataFrame([(i, 42) for i in range(7)], "id long, v long")
    out = distributed_avg_ranks(df, "v").collect()
    assert len(out) == 7
    assert all(r["avg2_rank"] == 8 for r in out)


def test_wave3_partitioning_invariant(spark, sf_dir):
    """Identical results at 5 vs 32 shuffle partitions for all eight
    wave-3 keys — different partial-agg groupings must not move a
    single micro (the registry determinism claim)."""
    from faconne_spark.queries import all_queries

    qs = all_queries()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for k in WAVE3:
                rows = sorted(
                    tuple(map(str, r)) for r in qs[k](spark, sf_dir).collect()
                )
                results.setdefault(k, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for k, (a, b) in results.items():
        assert a == b, f"{k} differs across partitioning"
        assert len(a) > 0, f"{k} vacuous at the test SF"


WAVE4 = [
    "orders_priority_value_gamma", "events_hourly_profile_correlation",
    "events_monthly_max_gumbel", "docs_hapax_rate",
    "docs_length_lognormal_fit", "mm_gif_decode", "mm_audio_silence_runs",
]


def test_lzw_known_vector():
    """Hand-derived bitstream for data [0,0,0] at min code size 2:
    codes clear(4), 0, 6, end(5) at width 3, LSB-first → 0x84 0x0B.
    Pins the bit-packing convention and the clear/end framing against
    the GIF87a spec, independent of the decoder (a symmetric
    encoder/decoder bug cannot cancel here)."""
    from faconne_spark.operators.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    assert _lzw_compress(bytes([0, 0, 0]), 2) == b"\x84\x0b"
    assert _lzw_decompress(b"\x84\x0b", 2) == bytes([0, 0, 0])


def test_lzw_width_boundary_roundtrip():
    """Round-trips across the 512 and 1024 code-width boundaries —
    the encoder/decoder width-bump sync (encoder bumps after
    EXCEEDING 2^width, the lagging decoder after REACHING it) breaks
    visibly here if either side is off by one code."""
    import random

    from faconne_spark.operators.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    rng = random.Random(7)
    for n in (255, 300, 961, 2000, 5000):
        high = bytes(rng.randrange(256) for _ in range(n))
        assert _lzw_decompress(_lzw_compress(high)) == high
        low = bytes((i // 7) % 4 for i in range(n))
        assert _lzw_decompress(_lzw_compress(low)) == low


def test_gif_container_roundtrip():
    """Full GIF87a container round-trip at every synthesized
    geometry, plus dims parsing and the interlace refusal."""
    import hashlib

    from faconne_spark.operators.multimodal import (
        gif_dims,
        gif_encode,
        gif_pixels,
    )

    for seed in range(25):
        d = hashlib.md5(str(seed).encode()).digest()
        w, h = 8 + d[0] % 24, 8 + d[1] % 24
        px = (d * (w * h // 16 + 1))[: w * h]
        g = gif_encode(w, h, px)
        assert g[:6] == b"GIF87a" and g[-1] == 0x3B
        assert gif_dims(g) == (w, h)
        w2, h2, ch, out = gif_pixels(g)
        assert (w2, h2, ch, out) == (w, h, 1, px)


def test_gif_pixels_skips_extensions():
    """A GIF89a-style extension block before the image descriptor
    must be walked over, not choked on (crawled GIFs carry graphic
    control extensions)."""
    from faconne_spark.operators.multimodal import gif_encode, gif_pixels

    g = gif_encode(8, 8, bytes(range(64)))
    # splice a graphic control extension after the global color table
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = g[: 13 + 768] + ext + g[13 + 768 :]
    w, h, ch, px = gif_pixels(spliced)
    assert (w, h, px) == (8, 8, bytes(range(64)))


def test_wav_silence_runs_constructed():
    """Constructed PCM with known runs: [silence×10, tone×5,
    silence×3] → 2 runs, longest 10, share 13/18."""
    import struct

    from faconne_spark.operators.multimodal import (
        SILENCE_THRESHOLD,
        wav_encode,
        wav_pcm,
    )
    import numpy as np

    pcm = b"\x00\x00" * 10 + struct.pack("<h", 4000) * 5 + b"\x00\x00" * 3
    payload = wav_encode(pcm)
    s = np.frombuffer(wav_pcm(payload), dtype="<i2")
    silent = np.abs(s.astype(np.int32)) <= SILENCE_THRESHOLD
    assert silent.sum() == 13 and len(s) == 18
    starts = np.flatnonzero(silent & ~np.concatenate(([False], silent[:-1])))
    assert len(starts) == 2


def test_wave4_partitioning_invariant(spark, sf_dir):
    from faconne_spark.queries import all_queries

    qs = all_queries()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for k in WAVE4:
                rows = sorted(
                    tuple(map(str, r)) for r in qs[k](spark, sf_dir).collect()
                )
                results.setdefault(k, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for k, (a, b) in results.items():
        assert a == b, f"{k} differs across partitioning"
        assert len(a) > 0, f"{k} vacuous at the test SF"


WAVE5 = [
    "events_user_degree_powerlaw_mle", "docs_source_topword_rbo",
    "customer_order_value_icc", "events_value_jarque_bera",
    "events_user_count_nbd_fit", "orders_monthly_theil_sen",
]


def test_rbo_weight_table_identities():
    """The injected RBO_min weight table must satisfy the paper's
    identities: W is strictly decreasing in the worse rank, W[K] is
    exactly p^(K−1)/K, and (1−p)·W[1] < 1 (RBO of identical lists at
    infinite depth is 1; truncation at K keeps it strictly below)."""
    from faconne_spark.queries.round9b import _RBO_K, _RBO_P, _RBO_W

    assert len(_RBO_W) == _RBO_K
    assert all(_RBO_W[i] > _RBO_W[i + 1] for i in range(_RBO_K - 1))
    want_last = round(_RBO_P ** (_RBO_K - 1) / _RBO_K * 1_000_000)
    assert _RBO_W[-1] == want_last
    assert 0.1 * _RBO_W[0] < 1_000_000


def test_rbo_identical_lists_hit_closed_form(spark, sf_dir):
    """Any source paired with itself would score Σ_{d} (1−p)p^(d−1) —
    the truncated geometric mass.  The pair join excludes self-pairs,
    so pin the identity directly on the weight table instead: a word
    at the same rank m in both lists contributes W[m], and summing
    W[m] for m = 1..K equals Σ_{d≤K} p^(d−1)·(overlap d)/d with full
    overlap — i.e. (1−p)·Σ W[m] = RBO_min(identical) within
    micro-rounding."""
    from faconne_spark.queries.round9b import _RBO_K, _RBO_P, _RBO_W

    total = sum(_RBO_W) / 1_000_000
    want = sum(
        _RBO_P ** (d - 1) / d * d for d in range(1, _RBO_K + 1)
    )  # Σ_d p^(d-1)/d · |intersection at d| with |∩| = d
    assert abs(total * 1.0 - want) < 1e-3
    assert abs(0.1 * want - (1 - _RBO_P ** _RBO_K)) < 1e-12


def test_wave5_partitioning_invariant(spark, sf_dir):
    from faconne_spark.queries import all_queries

    qs = all_queries()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for k in WAVE5:
                rows = sorted(
                    tuple(map(str, r)) for r in qs[k](spark, sf_dir).collect()
                )
                results.setdefault(k, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for k, (a, b) in results.items():
        assert a == b, f"{k} differs across partitioning"
        assert len(a) > 0, f"{k} vacuous at the test SF"


WAVE6 = [
    "events_hour_circular_stats", "embed_norm_label_anova",
    "events_benford_second_digit", "events_dow_hour_mi",
]


def test_circular_literal_tables():
    """The injected cos/sin micro tables must satisfy the circle
    identities: cos²+sin² = 1 within micro rounding at every hour,
    hour 0 is exactly (1, 0), and hour 6 is exactly (0, 1)."""
    from faconne_spark.queries.round9b import _HOUR_COS, _HOUR_SIN

    assert (_HOUR_COS[0], _HOUR_SIN[0]) == (1_000_000, 0)
    assert (_HOUR_COS[6], _HOUR_SIN[6]) == (0, 1_000_000)
    for h in range(24):
        r2 = _HOUR_COS[h] ** 2 + _HOUR_SIN[h] ** 2
        assert abs(r2 - 10 ** 12) < 3 * 10 ** 6, h


def test_benford_second_digit_law_sums_to_one():
    """The injected second-digit probabilities must sum to exactly
    1 within micro rounding and be monotonically decreasing in d
    (the law's shape)."""
    from faconne_spark.queries.round9b import _BENFORD2

    assert abs(sum(_BENFORD2) - 1_000_000) <= 5
    assert all(_BENFORD2[d] > _BENFORD2[d + 1] for d in range(9))


def test_wave6_partitioning_invariant(spark, sf_dir):
    from faconne_spark.queries import all_queries

    qs = all_queries()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for k in WAVE6:
                rows = sorted(
                    tuple(map(str, r)) for r in qs[k](spark, sf_dir).collect()
                )
                results.setdefault(k, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for k, (a, b) in results.items():
        assert a == b, f"{k} differs across partitioning"
        assert len(a) > 0, f"{k} vacuous at the test SF"


# ----------------------- textbook pins for the promoted operators


def test_kruskal_wallis_textbook_value(spark):
    """Hand-computed: groups A={1,2}, B={3,4} → ranks 1..4, R_A=3,
    R_B=7, H = 12/20·(9/2+49/2) − 15 = 2.4, no ties (C=1).  Pins the
    operator against the literature, independent of any oracle."""
    from faconne_spark.operators.evalstats import kruskal_wallis

    df = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 3), ("B", 4)], "g string, v long"
    )
    row = kruskal_wallis(df, "g", "v").collect()[0]
    assert row["n_rows"] == 4 and row["k_groups"] == 2 and row["df"] == 1
    assert row["h_stat"] == 2.4
    assert row["tie_correction"] == 1.0
    assert row["h_adj"] == 2.4


def test_wilcoxon_signed_rank_textbook_value(spark):
    """Hand-computed: d = [1,−2,3,−4,5] → |d| ranks 1..5,
    W⁺ = 1+3+5 = 9, W⁻ = 6, z = (9 − 7.5)/√13.75 = 0.404520."""
    from faconne_spark.operators.evalstats import wilcoxon_signed_rank

    df = spark.createDataFrame(
        [(1,), (-2,), (3,), (-4,), (5,)], "d long"
    )
    row = wilcoxon_signed_rank(df, "d").collect()[0]
    assert row["n_nonzero"] == 5
    assert row["w_plus_2x"] == 18 and row["w_minus_2x"] == 12
    assert row["tie_sum"] == 0
    assert row["z_stat"] == 0.40452


def test_spearman_rho_perfect_and_reversed(spark):
    """ρ = +1 on a monotone pair, −1 on the reversal, and the
    all-ties column refuses with NULL."""
    from faconne_spark.operators.evalstats import spearman_rho

    up = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 35)], "x long, y long"
    )
    assert spearman_rho(up, "x", "y").collect()[0]["spearman_rho"] == 1.0
    down = spark.createDataFrame(
        [(1, 35), (2, 20), (3, 10)], "x long, y long"
    )
    assert spearman_rho(down, "x", "y").collect()[0]["spearman_rho"] == -1.0
    flat = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7)], "x long, y long"
    )
    assert flat.count() == 3
    assert (
        spearman_rho(flat, "x", "y").collect()[0]["spearman_rho"] is None
    )
