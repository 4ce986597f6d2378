"""Gate-vacuity guard (VERDICT r8 ask #2).

Two pieces close the green-by-emptiness class:

1. test_oracle.py asserts every registry key returns >= 1 row at the
   proven SF unless waived in tests/vacuity_waivers.py (the per-key
   assertion lives there because that file already collects every
   query's rows — no extra sweep).
2. This file keeps the waiver list honest: every waiver must name a
   constructed-fixture test that EXISTS, and the planted-mirror
   fixture for docs_cross_source_duplication lives here (mirroring
   test_hardening.py::test_stitch_detects_split_document, the
   dedup_stitch proof).
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vacuity_waivers import VACUITY_WAIVERS

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def test_waivers_name_real_fixture_tests():
    """A waiver whose fixture test was renamed/deleted is a silent
    hole — fail loudly instead."""
    from faconne_spark.queries import all_queries

    keys = set(all_queries())
    for key, (fname, test_fn) in VACUITY_WAIVERS.items():
        assert key in keys, f"waiver for unknown registry key {key!r}"
        path = os.path.join(TESTS_DIR, fname)
        assert os.path.exists(path), f"{key}: waiver file {fname} missing"
        with open(path) as fh:
            src = fh.read()
        assert re.search(rf"^def {re.escape(test_fn)}\(", src, re.M), (
            f"{key}: fixture test {fname}::{test_fn} not found — "
            "the waiver no longer proves anything"
        )


def test_cross_source_duplication_detects_planted_mirror(spark, tmp_path):
    """Plant the SAME text (modulo the whitespace the fingerprint
    normalizes away) in two sources and a third unrelated source;
    the provenance matrix must surface exactly the (mirror_a,
    mirror_b) pair with one shared fingerprint."""
    from faconne_spark.queries.round8 import docs_cross_source_duplication

    rows = [
        (1, "Common Crawl  boilerplate\tparagraph here", "en", "mirror_a", 40),
        (2, "common crawl boilerplate paragraph here", "en", "mirror_b", 39),
        (3, "a different document entirely", "en", "mirror_a", 29),
        (4, "yet another unrelated text", "en", "other_src", 26),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    out = docs_cross_source_duplication(spark, str(tmp_path)).collect()
    assert [(r["sa"], r["sb"], r["n_shared_fingerprints"]) for r in out] == [
        ("mirror_a", "mirror_b", 1)
    ]
