"""Optimization r12 wave 4: the explode+groupBy minhash signature
build (``_minhash_sig_rel``) must be BIT-IDENTICAL to the
higher-order-fold expression (``minhash_sig`` over ``word_shingles``)
it replaces: the per-shingle permutation arithmetic is the same
overflow-free BIGINT text, and ``min`` over the exploded group equals
the fold's ``least`` chain.  Covers normal docs, single-token docs
(the greatest(…,1) one-shingle path), duplicate-heavy docs
(array_distinct), empty strings, and NULL text (explode_outer → NULL
hash → all-NULL signature, matching the fold's NULL propagation).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faconne_spark.functions import minhash_sig, word_shingles  # noqa: E402
from faconne_spark.operators.dedup import _minhash_sig_rel  # noqa: E402

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "single"),
    (3, "two words"),
    (4, "a a a a a a a a"),  # all-duplicate shingles
    (5, ""),  # empty text → one '' shingle either way
    (6, None),  # NULL text → all-NULL signature either way
    (7, "pack my box with five dozen liquor jugs pack my box"),
]


def _fold_rows(spark, n_shingle, k):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    sig = minhash_sig(word_shingles("text", n_shingle, "spark"), k, "spark")
    return {
        r.doc_id: r.sig
        for r in df.select("doc_id", F.expr(sig).alias("sig")).collect()
    }


def _codegen_rows(spark, n_shingle, k):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    return {
        r.doc_id: r.sig
        for r in _minhash_sig_rel(df, n_shingle, k).collect()
    }


def test_minhash_codegen_bit_identical(spark):
    for n_shingle, k in ((3, 12), (2, 8)):
        fold = _fold_rows(spark, n_shingle, k)
        code = _codegen_rows(spark, n_shingle, k)
        assert set(fold) == set(code)  # no doc dropped (NULL text incl.)
        for d in fold:
            assert repr(fold[d]) == repr(code[d]), f"doc {d}"


def test_minhash_codegen_null_text_shape(spark):
    """The NULL-text doc must SURVIVE as a row and carry the same
    signature the old fold produced.  (Empirically both formulations
    hash NULL text like the empty string: word_shingles' concat_ws
    coalesces the NULL token slice to '', so the one shingle is '' —
    the explode path reproduces that because the shingle ARRAY is
    non-null/non-empty; explode_outer additionally guards the
    hypothetical NULL-array input so no row can ever drop.)"""
    code = _codegen_rows(spark, 3, 12)
    fold = _fold_rows(spark, 3, 12)
    assert 6 in code  # row present, not dropped
    assert code[6] == fold[6] == code[5] == fold[5]  # NULL ≡ '' text
    assert len(code[6]) == 12 and all(v is not None for v in code[6])
