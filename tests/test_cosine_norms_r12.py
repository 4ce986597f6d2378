"""Optimization r12 wave 2: ``cosine_from_norms`` (pair-stage cosine
over PRECOMPUTED per-row squared norms) must be BIT-IDENTICAL to the
single-expression ``cosine_sim`` it replaces in the high-volume pair
stages — the dot is the same guarded unrolled chain (or the same fold),
and the denominator multiplies the same two per-side Σv² folds, so no
IEEE operation changes, only WHERE the norm is evaluated (once per row
instead of once per pair).

Also pins ``sqnorm_expr`` == ``dot_expr(a, a)`` textually, so the two
can never drift apart.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faconne_spark.functions import (  # noqa: E402
    cosine_from_norms,
    cosine_sim,
    dot_expr,
    sqnorm_expr,
)


def _vecs(spark, dim, n=48, seed=11):
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
            v = [0.0] * dim  # zero vector → nullif(0.0) → NULL cosine
        if i == 1:
            w = [-x for x in v]  # exact cancellation
        rows.append((i, v, w))
    return spark.createDataFrame(
        rows, "id bigint, a array<float>, b array<float>"
    )


def test_sqnorm_is_dot_self():
    """sqnorm_expr must be LITERALLY dot_expr(a, a) — same fold text,
    same guarded unrolled chain — so sqrt(nn) is bit-identical to the
    norm factor inside cosine_sim."""
    for dim in (None, 8, 64):
        assert sqnorm_expr("a", "spark", dim=dim) == dot_expr(
            "a", "a", "spark", dim
        )


@pytest.mark.parametrize("dim", [64, 16, None])
def test_cosine_from_norms_bit_identical(spark, dim):
    """Precomputing the squared norms per row and dividing in the pair
    stage must give the same 64-bit double as the all-in-one
    cosine_sim, for matched widths, the unrolled path, and the plain
    fold (dim=None)."""
    from pyspark.sql import functions as F

    df = _vecs(spark, dim or 16)
    two_stage = df.select(
        "id", "a", "b",
        F.expr(sqnorm_expr("a", "spark", dim=dim)).alias("nn_a"),
        F.expr(sqnorm_expr("b", "spark", dim=dim)).alias("nn_b"),
    ).select(
        "id",
        F.expr(cosine_sim("a", "b", "spark", dim=dim)).alias("one"),
        F.expr(
            cosine_from_norms("a", "b", "nn_a", "nn_b", dim=dim)
        ).alias("two"),
    )
    for r in two_stage.collect():
        assert repr(r.one) == repr(r.two), f"row {r.id}"


def test_cosine_from_norms_ragged_fallback(spark):
    """Width-mismatched arrays must take the fold branch on BOTH the
    norm and the dot — still bit-identical to cosine_sim's own ragged
    fallback."""
    from pyspark.sql import functions as F

    df = _vecs(spark, 16)  # guard dim=64 over 16-wide arrays
    out = df.select(
        "id",
        F.expr(cosine_sim("a", "b", "spark", dim=64)).alias("one"),
        F.expr(sqnorm_expr("a", "spark", dim=64)).alias("nn_a"),
        F.expr(sqnorm_expr("b", "spark", dim=64)).alias("nn_b"),
        "a", "b",
    ).select(
        "id", "one",
        F.expr(
            cosine_from_norms("a", "b", "nn_a", "nn_b", dim=64)
        ).alias("two"),
    )
    for r in out.collect():
        assert repr(r.one) == repr(r.two), f"row {r.id}"
