"""API-surface parity (SURVEY §2.3): transformer reuse, for_each,
explain, error messages, property-based random-extension tests modeled
on the reference's gen-structure-from-domain (test/core.clj:7-32)."""

import random

import pytest

from faconne_spark import (
    Agg, FaconneError, Keys, SetOf, Transformer, V, collect_nested,
    for_each, to_df, transform,
)


def test_transformer_reuse(spark):
    t = Transformer({V.k: [V.v]}, {V.v: SetOf(V.k)})
    out1 = collect_nested(t(to_df({"a": [1, 2], "b": [2]}, spark=spark)))
    out2 = collect_nested(t(to_df({"x": [7]}, spark=spark)))
    assert out1 == {1: {"a"}, 2: {"a", "b"}}
    assert out2 == {7: {"x"}}


def test_for_each_distributed(spark):
    acc = spark.sparkContext.accumulator(0)
    for_each(
        [{"a": i} for i in range(10)],
        [Keys("a")],
        lambda row: acc.add(row["a"]),
        spark=spark,
    )
    assert acc.value == sum(range(10))


def test_for_each_where(spark):
    acc = spark.sparkContext.accumulator(0)
    for_each(
        [{"a": i} for i in range(10)],
        [Keys("a")],
        lambda row: acc.add(1),
        where=["a % 2 = 0"],
        spark=spark,
    )
    assert acc.value == 5


def test_explain_produces_plan(spark, capsys):
    t = Transformer([Keys("a")], SetOf(V.a))
    t.explain(to_df([{"a": 1}], spark=spark), mode="simple")
    out = capsys.readouterr().out
    assert "Physical Plan" in out


def test_error_where_not_list():
    with pytest.raises(FaconneError, match="where"):
        Transformer([Keys("a")], [V.a], where="a > 1")


def test_error_empty_vector_domain(spark):
    with pytest.raises(FaconneError, match="empty vector"):
        transform([{"a": 1}], {"a": []}, [V.x], spark=spark)


def test_error_multi_entry_group_range(spark):
    with pytest.raises(FaconneError, match="exactly one"):
        transform([{"a": 1, "b": 2}], [Keys("a", "b")],
                  {V.a: V.b, V.b: V.a}, spark=spark)


def test_error_set_domain_multiple(spark):
    # reference: "Sets in the domain can have only one element"
    # (parse_domain.cljc:74-76) — SetOf in domains takes one pattern
    with pytest.raises((FaconneError, ValueError)):
        transform({"a": [1]}, {V.k: SetOf(V.x, V.y)}, [V.x], spark=spark)


# ---- property tests: random extensions of a domain vs python oracle ----


def _rand_scalar(rng):
    return rng.randint(0, 99)


def gen_map_of_lists(rng):
    return {
        f"k{i}": [_rand_scalar(rng) for _ in range(rng.randint(0, 6))]
        for i in range(rng.randint(0, 6))
    }


@pytest.mark.parametrize("seed", range(5))
def test_property_unnest_set(spark, seed):
    """{k [v]} → #{v} against a hand-written python oracle
    (reference test-transformer pattern, test/core.clj:44-48)."""
    rng = random.Random(seed)
    data = gen_map_of_lists(rng)
    got = collect_nested(
        transform(data, {V.k: [V.v]}, SetOf(V.v), spark=spark)
    )
    expected = {v for vs in data.values() for v in vs}
    assert got == expected


@pytest.mark.parametrize("seed", range(5))
def test_property_invert(spark, seed):
    """{k v} → {v #{k}} (multi-valued inversion)."""
    rng = random.Random(seed)
    data = {f"k{i}": _rand_scalar(rng) for i in range(rng.randint(1, 8))}
    got = collect_nested(
        transform(data, {V.k: V.v}, {V.v: SetOf(V.k)}, spark=spark)
    )
    expected = {}
    for k, v in data.items():
        expected.setdefault(v, set()).add(k)
    assert got == expected


@pytest.mark.parametrize("seed", range(5))
def test_property_group_count(spark, seed):
    """{k [v]} → {v (count ^:expand [k])}"""
    rng = random.Random(seed)
    data = gen_map_of_lists(rng)
    if not any(data.values()):
        pytest.skip("empty extension")
    got = collect_nested(
        transform(data, {V.k: [V.v]}, {V.v: Agg("count(k) AS n")}, spark=spark)
    )
    expected = {}
    for k, vs in data.items():
        for v in vs:
            expected[v] = expected.get(v, 0) + 1
    assert got == expected


@pytest.mark.parametrize("seed", range(3))
def test_property_pairs(spark, seed):
    """[a b] chunking against a python oracle."""
    rng = random.Random(seed)
    data = [_rand_scalar(rng) for _ in range(rng.randint(0, 11))]
    got = collect_nested(
        transform(data, [V.a, V.b], ["coalesce(a, 0) + coalesce(b, 0) AS s"],
                  spark=spark)
    )
    expected = [
        (data[i] if i < len(data) else 0)
        + (data[i + 1] if i + 1 < len(data) else 0)
        for i in range(0, len(data), 2)
    ]
    assert sorted(got) == sorted(expected)


def test_iterator_reusable(spark):
    """f/iterator parity (core.cljc:20-23): compile once, run on
    multiple inputs; rows() yields lazily on the driver."""
    from faconne_spark import Iterator, V

    it = Iterator({V.store: {V.aisle: [V.product]}})
    d1 = {"g": {1: ["a", "b"]}}
    d2 = {"h": {2: ["c"]}, "i": {3: ["d", "e"]}}

    from faconne_spark.dsl.pyobj import to_df

    got1 = sorted(r["product"] for r in it.rows(to_df(d1, spark)))
    got2 = sorted(r["product"] for r in it.rows(to_df(d2, spark)))
    assert got1 == ["a", "b"]
    assert got2 == ["c", "d", "e"]
    # full bound frame carries all vars
    row = next(it.rows(to_df(d1, spark)))
    assert set(row) >= {"store", "aisle", "product"}


def test_iterator_action_runs_distributed(spark, tmp_path):
    from faconne_spark import Iterator, V
    from faconne_spark.dsl.pyobj import to_df

    out = str(tmp_path / "seen")
    import os

    os.makedirs(out)

    def act(r):
        # side effect observable from executors (same host in local mode)
        open(os.path.join(out, f"{r['x']}"), "w").close()

    it = Iterator([V.x], action=act)
    it(to_df([10, 20, 30], spark))
    assert sorted(os.listdir(out)) == ["10", "20", "30"]


def test_error_unbound_where_var(spark):
    """A :where clause referencing a variable the domain never binds
    must fail with a clear error, not silently bind a table column
    (reference: options validation, core.cljc:6-13)."""
    from faconne_spark import Keys, transform
    from faconne_spark.errors import FaconneError
    from pyspark.sql.utils import AnalysisException

    data = [{"k": "a", "v": 1}]
    with pytest.raises((FaconneError, AnalysisException)):
        transform(
            data, [Keys("k", "v")], {V.k: V.v},
            where=["nonexistent_var > 3"], spark=spark,
        ).collect()


def test_error_unsupported_option_analog(spark):
    """The reference rejects unknown transform options (only :where is
    supported, core.cljc:6-13); the Python face has keyword-only args so
    an unknown option is a TypeError at the call site."""
    from faconne_spark import Keys, transform

    with pytest.raises(TypeError):
        transform(
            [{"k": 1}], [Keys("k")], [V.k],
            wherre=["k > 0"], spark=spark,  # typo'd option
        )


def test_pyagg_arbitrary_reducer_matches_python(spark, tables):
    """PyAgg closes the arbitrary-fn ^:expand delta with the reference
    (parse_range.cljc:112-139): a bespoke reducer no SQL aggregate
    spells — second-highest balance — matches a Python replay, and the
    groupBy itself stays a native Catalyst aggregate (map-side partial
    collect) with exactly one post-aggregation Python stage."""
    from faconne_spark import Keys, PyAgg, V, transform

    def second_top(xs):
        return float(xs[-2]) if len(xs) > 1 else float(xs[-1])

    out = transform(
        tables["customer"],
        [Keys("c_nationkey", "c_acctbal")],
        {V.c_nationkey: PyAgg(V.c_acctbal, second_top, "double",
                              alias="second_top_bal")},
    )
    got = {r["c_nationkey"]: r["second_top_bal"] for r in out.collect()}

    rows = tables["customer"].select("c_nationkey", "c_acctbal").collect()
    per: dict = {}
    for r in rows:
        per.setdefault(r["c_nationkey"], []).append(float(r["c_acctbal"]))
    want = {k: second_top(sorted(v)) for k, v in per.items()}
    assert got == want

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_collect_list" in plan or "collect_list" in plan
    # exactly one Python stage per plan section (AQE prints the final
    # and initial sections, so normalize to the final one)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("BatchEvalPython") + final.count("ArrowEvalPython") == 1


def test_pyagg_composes_inside_struct(spark, tables):
    """PyAgg fields mix with SQL aggregates inside one Struct — both
    land in the same single groupBy."""
    from faconne_spark import Agg, Keys, PyAgg, V, transform

    def spread_fn(xs):
        return float(xs[-1] - xs[0])

    out = transform(
        tables["customer"],
        [Keys("c_nationkey", "c_acctbal")],
        {V.c_nationkey: {"n": Agg("count(*) AS n"),
                         "spread": PyAgg(V.c_acctbal, spread_fn,
                                         "double", alias="spread")}},
    )
    rows = {r["c_nationkey"]: r for r in out.collect()}
    per: dict = {}
    for r in tables["customer"].select("c_nationkey", "c_acctbal").collect():
        per.setdefault(r["c_nationkey"], []).append(float(r["c_acctbal"]))
    for k, vals in per.items():
        assert rows[k]["n"] == len(vals)
        assert rows[k]["spread"] == max(vals) - min(vals)


def test_pyagg_validates_inputs(spark):
    """Missing alias and non-callable fn fail loudly at construction."""
    import pytest as _pytest

    from faconne_spark import FaconneError, PyAgg, V

    with _pytest.raises(FaconneError, match="alias"):
        PyAgg(V.x, lambda xs: 1.0)
    with _pytest.raises(FaconneError, match="callable"):
        PyAgg(V.x, "not a function", alias="y")
