"""Property tests (SURVEY §5.2): random structures conforming to a
domain — including empty branches — transformed by the Spark engine and
checked against hand-written Python oracles, mirroring the reference's
``gen-structure-from-domain`` random-extension strategy
(test/core.clj:7-32)."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from faconne_spark import Agg, Keys, SetOf, V, collect_nested, transform


def t(spark, data, domain, range_, where=None):
    return collect_nested(
        transform(data, domain, range_, where=where, spark=spark)
    )


names = st.text(
    alphabet="abcdefgh", min_size=1, max_size=3
)

PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# ---- {store {aisle [product]}} → {store #{product}} -------------------

nested_2level = st.dictionaries(
    names,
    st.dictionaries(
        st.integers(0, 9), st.lists(names, max_size=4), max_size=3
    ),
    min_size=1,
    max_size=4,
)


@PROP
@given(data=nested_2level)
def test_unnest_to_set_matches_oracle(spark, data):
    got = t(
        spark, data,
        {V.store: {V.aisle: [V.product]}},
        {V.store: SetOf(V.product)},
    )
    expected = {}
    for store, aisles in data.items():
        for products in aisles.values():
            for p in products:
                expected.setdefault(store, set()).add(p)
    assert got == expected


# ---- rows → grouped sum ----------------------------------------------

rows = st.lists(
    st.fixed_dictionaries({"k": names, "v": st.integers(-100, 100)}),
    min_size=1,
    max_size=12,
)


@PROP
@given(data=rows)
def test_group_sum_matches_oracle(spark, data):
    got = t(spark, data, [Keys("k", "v")], {V.k: Agg("sum(v)")})
    expected = {}
    for r in data:
        expected[r["k"]] = expected.get(r["k"], 0) + r["v"]
    assert got == expected


# ---- inversion {k [x]} → {x #{k}} ------------------------------------

inv_input = st.dictionaries(
    names, st.lists(st.integers(0, 5), max_size=5), min_size=1, max_size=4
)


@PROP
@given(data=inv_input)
def test_inversion_matches_oracle(spark, data):
    got = t(spark, data, {V.k: [V.x]}, {V.x: SetOf(V.k)})
    expected = {}
    for k, xs in data.items():
        for x in xs:
            expected.setdefault(x, set()).add(k)
    assert got == expected


# ---- where-filter ----------------------------------------------------

@PROP
@given(data=rows)
def test_where_filter_matches_oracle(spark, data):
    got = t(
        spark, data, [Keys("k", "v")], {V.k: SetOf(V.v)},
        where=["v >= 0"],
    )
    expected = {}
    for r in data:
        if r["v"] >= 0:
            expected.setdefault(r["k"], set()).add(r["v"])
    assert got == expected
