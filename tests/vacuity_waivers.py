"""Gate-vacuity waivers (VERDICT r8 finding #1 / ask #2).

The driver's correctness gate compares Spark vs DuckDB output — a key
whose output is EMPTY at the gate SF passes on 0-rows-vs-0-rows and
the green row proves nothing about its logic.  test_oracle.py now
asserts every registry key returns >= 1 row at the proven SF; a key
that is legitimately empty there (the phenomenon it detects does not
occur in the synthetic data at that scale) must carry a waiver HERE,
naming the constructed-fixture test that proves it non-vacuously on
planted data.  test_vacuity_guard.py mechanically checks each named
fixture test exists, so a waiver cannot silently rot.
"""

# key -> (test file under tests/, test function that plants the
#         phenomenon and asserts the key's operator surfaces it)
VACUITY_WAIVERS = {
    # sf0.001/sf0.01 contain ZERO exact duplicate documents (judge
    # checked: dup surplus = 0), so both exact-fingerprint detectors
    # are empty at the gate SF.  Non-vacuous proofs:
    "dedup_stitch": (
        "test_hardening.py", "test_stitch_detects_split_document"
    ),
    "docs_cross_source_duplication": (
        "test_vacuity_guard.py",
        "test_cross_source_duplication_detects_planted_mirror",
    ),
}
