"""Optimization r12: the unrolled fixed-width vector kernels must be
BIT-IDENTICAL to the interpreted higher-order folds they replace —
same IEEE operations in the same order — including on inputs that do
NOT match the static width (the CASE guard must fall back to the fold).

Covers dot_expr / l2sq_expr / cosine_sim (functions) and
lsh_bucket_expr's precomputed-parity hyperplane weights (similarity).
"""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faconne_spark.functions import cosine_sim, dot_expr, l2sq_expr  # noqa: E402
from faconne_spark.operators.similarity import (  # noqa: E402
    _plane_sign,
    lsh_bucket_expr,
)


def _vecs(spark, dim, n=64, seed=7):
    """Deterministic float32-ish test vectors (incl. zeros and exact
    negatives so sign-of-zero and cancellation paths are exercised)."""
    rows = []
    s = seed
    for i in range(n):
        v, w = [], []
        for d in range(dim):
            s = (1103515245 * s + 12345) % (1 << 31)
            v.append(((s % 2001) - 1000) / 250.0)
            s = (1103515245 * s + 12345) % (1 << 31)
            w.append(((s % 2001) - 1000) / 250.0)
        if i == 0:
            v = [0.0] * dim  # zero vector → nullif(0.0) path
        if i == 1:
            w = [-x for x in v]  # exact cancellation
        rows.append((i, v, w))
    return spark.createDataFrame(
        rows, "id bigint, a array<float>, b array<float>"
    )


@pytest.mark.parametrize("dim", [64, 16])
def test_dot_l2_cos_unrolled_bit_identical(spark, dim):
    df = _vecs(spark, dim)
    from pyspark.sql import functions as F

    out = df.select(
        F.expr(dot_expr("a", "b", "spark")).alias("dot_fold"),
        F.expr(dot_expr("a", "b", "spark", dim=dim)).alias("dot_un"),
        F.expr(l2sq_expr("a", "b", "spark")).alias("l2_fold"),
        F.expr(l2sq_expr("a", "b", "spark", dim=dim)).alias("l2_un"),
        F.expr(cosine_sim("a", "b", "spark")).alias("cos_fold"),
        F.expr(cosine_sim("a", "b", "spark", dim=dim)).alias("cos_un"),
    ).collect()
    for r in out:
        # bit-identical, not approx: repr equality catches any ulp drift
        assert repr(r.dot_fold) == repr(r.dot_un)
        assert repr(r.l2_fold) == repr(r.l2_un)
        assert repr(r.cos_fold) == repr(r.cos_un)


def test_unrolled_guard_falls_back_on_ragged(spark):
    """Arrays narrower/wider than the static dim must take the fold
    branch — the unrolled kernel with dim=64 over 16-wide arrays must
    equal the plain fold over those same arrays."""
    df = _vecs(spark, 16)
    from pyspark.sql import functions as F

    out = df.select(
        F.expr(dot_expr("a", "b", "spark")).alias("fold"),
        F.expr(dot_expr("a", "b", "spark", dim=64)).alias("guarded"),
        F.expr(cosine_sim("a", "b", "spark")).alias("cfold"),
        F.expr(cosine_sim("a", "b", "spark", dim=64)).alias("cguard"),
    ).collect()
    for r in out:
        assert repr(r.fold) == repr(r.guarded)
        assert repr(r.cfold) == repr(r.cguard)


def test_plane_sign_matches_sql_hash(spark):
    """The Python-precomputed hyperplane parity must equal the SQL
    phash60 parity for every (plane, coordinate) the engine uses."""
    from pyspark.sql import functions as F

    exprs = [
        F.expr(
            f"cast(conv(substring(md5(concat('p{p}d', {d})), 1, 15),"
            f" 16, 10) as bigint) % 2"
        ).alias(f"p{p}d{d}")
        for p in range(6)
        for d in range(0, 64, 7)
    ]
    row = spark.range(1).select(*exprs).collect()[0]
    for p in range(6):
        for d in range(0, 64, 7):
            want = float((row[f"p{p}d{d}"] % 2) * 2 - 1)
            assert _plane_sign(p, d) == want


@pytest.mark.parametrize("dim", [64, 16])
def test_lsh_bucket_matches_precomputed_signs(spark, dim):
    """The SQL bucket id must equal a Python replay using the
    _plane_sign precomputed parities — pins the hyperplane derivation
    (and documents why the unrolled-literal variant was reverted: it
    measured SLOWER, see lsh_bucket_expr docstring)."""
    from pyspark.sql import functions as F

    df = _vecs(spark, dim)
    expr = lsh_bucket_expr("a", 4, dim, "spark")
    rows = df.select("a", F.expr(expr).alias("b")).collect()
    for r in rows:
        want = 0
        for p in range(4):
            dot = 0.0
            for d in range(dim):
                dot += float(r.a[d]) * _plane_sign(p, d)
            if dot > 0:
                want |= 1 << p
        assert r.b == want


def test_unrolled_kernels_leave_no_higher_order_fold_in_plan(spark):
    """The guarded fast path must actually be the unrolled chain (the
    point of the rewrite): on width-matched input the CASE's THEN
    branch carries no aggregate(...) lambda; we assert the expression
    still contains the fold ONLY as the ELSE fallback."""
    e = dot_expr("a", "b", "spark", dim=4)
    assert e.startswith("(CASE WHEN size(a) = 4")
    then_part = e.split(" ELSE ")[0]
    assert "aggregate(" not in then_part
    assert "zip_with" not in then_part
    assert "aggregate(" in e.split(" ELSE ")[1]


def test_cosine_norms_match(spark):
    """cosine_sim's unrolled norms use the same 0.0-seeded left fold:
    check against math.fsum-free manual reduction in Python for a
    handful of rows (double-precision sequential sum)."""
    df = _vecs(spark, 8, n=8)
    from pyspark.sql import functions as F

    rows = df.select(
        "a", "b",
        F.expr(cosine_sim("a", "b", "spark", dim=8)).alias("c"),
    ).collect()
    for r in rows:
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(r.a, r.b):
            dot += float(x) * float(y)
            na += float(x) * float(x)
            nb += float(y) * float(y)
        denom = math.sqrt(na) * math.sqrt(nb)
        if denom == 0.0:
            assert r.c is None
        else:
            assert r.c == pytest.approx(dot / denom, abs=0, rel=0) or (
                r.c == dot / denom
            )
