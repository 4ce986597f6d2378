"""Parity suite: every behavior in the reference's test file
(`/root/reference/test/faconne/test/core.clj`) and README demos
(`/root/reference/demo.clj`), re-expressed through the Spark engine and
checked against the reference's expected outputs (transcribed; cited by
line). Data flows nested-literal → DataFrame → transform →
collect_nested → compare."""

import pytest

from faconne_spark import (
    Agg, As, K, Keys, Lit, SetOf, Transformer, V, collect_nested, transform,
)


def t(spark, data, domain, range_, where=None):
    return collect_nested(transform(data, domain, range_, where=where, spark=spark))


# ---- README / demo.clj ------------------------------------------------


def test_store_unnest_set(spark):
    # demo.clj:122-133 — un-nesting to {store #{product}}
    store_data = {
        "Gas Station": {1: ["Hot Dog", "Nachos", "Cola"],
                        2: ["Hot Dog", "Toothpaste", "Deoderant"]},
        "Grocer": {1: ["Celery", "Onion", "Carrot"],
                   2: ["Orange", "Apple"], 3: ["Salmon"]},
    }
    got = t(spark, store_data, {V.store: {V.aisle: [V.product]}},
            {V.store: SetOf(V.product)})
    assert got == {
        "Gas Station": {"Nachos", "Toothpaste", "Cola", "Deoderant", "Hot Dog"},
        "Grocer": {"Carrot", "Onion", "Celery", "Salmon", "Orange", "Apple"},
    }


def test_store_unnest_rows(spark):
    # demo.clj:136-151 — {store [{:aisle aisle :product product}]}
    store_data = {
        "Gas Station": {1: ["Hot Dog", "Nachos"], 2: ["Toothpaste"]},
        "Grocer": {3: ["Salmon"]},
    }
    got = t(spark, store_data, {V.store: {V.aisle: [V.product]}},
            {V.store: [{"aisle": V.aisle, "product": V.product}]})
    assert sorted(got["Gas Station"], key=repr) == sorted(
        [{"aisle": 1, "product": "Hot Dog"}, {"aisle": 1, "product": "Nachos"},
         {"aisle": 2, "product": "Toothpaste"}], key=repr)
    assert got["Grocer"] == [{"aisle": 3, "product": "Salmon"}]


def test_event_grouping_conditional_key(spark):
    # demo.clj:157-176 — conditional map keys
    event_data = [
        {"day": "2018-08-10", "type": "add-user", "handled": False, "data": ["steve"]},
        {"day": "2018-08-10", "type": "add-user", "handled": True, "data": ["george"]},
        {"day": "2018-08-10", "type": "remove-user", "handled": False, "data": ["janice"]},
        {"day": "2018-08-11", "type": "add-user", "handled": True, "data": ["jocelyn"]},
        {"day": "2018-08-11", "type": "remove-user", "handled": False, "data": ["steve"]},
    ]
    got = t(spark, event_data,
            [{"day": V.day, "type": V.type, "handled": V.handled, "data": V.data}],
            {V.day: {K("if(handled, 'handled', 'unhandled') AS status"):
                     {V.type: Agg("flatten(array_sort(collect_list(data)))")}}})
    assert got == {
        "2018-08-10": {"unhandled": {"add-user": ["steve"], "remove-user": ["janice"]},
                       "handled": {"add-user": ["george"]}},
        "2018-08-11": {"handled": {"add-user": ["jocelyn"]},
                       "unhandled": {"remove-user": ["steve"]}},
    }


def test_reduce_count_courses(spark):
    # demo.clj:181-188 — {student (count ^:expand #{course-number})}
    data = {"math": {2062: ["John", "Mary", "Paul", "Susan"],
                     4001: ["Mary", "Tone", "Mike"]},
            "history": {6000: ["John", "Paul", "Susan", "Tone"],
                        3052: ["Tone", "Mike", "Susan"]}}
    got = t(spark, data, {V.category: {V.course_number: [V.student]}},
            {V.student: Agg("count(distinct course_number)")})
    assert got == {"Susan": 3, "Mary": 2, "John": 2, "Paul": 2, "Tone": 3, "Mike": 2}


def test_eval_at_leaf_undergrad(spark):
    # demo.clj:205-220 — evaluate at each leaf, deep merge
    data = {"math": {2062: ["John", "Mary"], 4001: ["Tone"]},
            "history": {6000: ["John", "Tone"]}}
    got = t(spark, data, {V.category: {V.course_number: [V.student]}},
            {V.student: {K("if(course_number > 4000, 'undergraduate', 'graduate') AS level"):
                         SetOf(V.course_number)}})
    assert got == {"John": {"graduate": {2062}, "undergraduate": {6000}},
                   "Mary": {"graduate": {2062}},
                   "Tone": {"undergraduate": {4001, 6000}}}


def test_invert(spark):
    # demo.clj:224-230
    got = t(spark, {"GYU-6749": 1, "JEI-1353": 2, "JNMK-194": 3},
            {V.license_plate: V.parking_space}, {V.parking_space: V.license_plate})
    assert got == {1: "GYU-6749", 2: "JEI-1353", 3: "JNMK-194"}


def test_invert_with_mapping(spark):
    # demo.clj:233-242 — lower-case both sides while inverting
    got = t(spark, {"Grocer": ["Hot Dog", "Celery", "Tooth Brush"],
                    "Gas Station": ["Hot Dog", "Tooth Brush", "Beer"]},
            {V.store: [V.product]},
            {K("lower(product) AS product_lc"): SetOf("lower(store)")})
    assert got == {"celery": {"grocer"}, "tooth brush": {"gas station", "grocer"},
                   "hot dog": {"gas station", "grocer"}, "beer": {"gas station"}}


def test_map_and_merge_positions(spark):
    # demo.clj:247-258 — computed key merging distinct source keys
    data = {"First Baseman": [{"first_name": "Steve", "last_name": "White"}],
            "first baseman": [{"first_name": "Mark", "last_name": "Smith"}],
            "second Baseman": [{"first_name": "George", "last_name": "Brown"}]}
    got = t(spark, data,
            {V.position: [{"first_name": V.f, "last_name": V.l}]},
            {K("replace(lower(position), ' ', '-') AS pos"):
             ["concat(l, ', ', f)"]})
    assert got == {"first-baseman": ["Smith, Mark", "White, Steve"],
                   "second-baseman": ["Brown, George"]}


def test_filtering_franchise(spark):
    # demo.clj:263-311
    franchise_info = [
        {"franchise": "Laundry Store", "location": {"name": "West Location"},
         "managers": [{"name": "Ruth", "months_worked": 15},
                      {"name": "Bruno", "months_worked": 1}],
         "employees": [{"name": "Luke", "months_worked": 0}]},
        {"franchise": "Laundry Store", "location": {"name": "East Location"},
         "managers": [{"name": "Tomas", "months_worked": 8},
                      {"name": "Ruth", "months_worked": 15}],
         "employees": [{"name": "Mary", "months_worked": 22}]},
        {"franchise": "Restaurant", "location": {"name": "Campus Location"},
         "managers": [{"name": "Sarah", "months_worked": 6},
                      {"name": "Emily", "months_worked": 22}],
         "employees": [{"name": "Joe", "months_worked": 0},
                       {"name": "Nathan", "months_worked": 1}]},
    ]
    got = t(spark, franchise_info,
            [{"franchise": V.franchise, "location": {"name": V.location},
              "managers": [{"months_worked": V.months}]}],
            SetOf(V.location),
            where=["months > 12", "franchise = 'Laundry Store'"])
    # demo.clj:293 prints #{"West Location"} but East also has Ruth at 15
    # months in demo.clj:271-272, so faconne's own semantics yield both;
    # (the README text itself says "has one manager who's worked at least
    # a year", which both laundry locations satisfy).
    assert got == {"West Location", "East Location"}

    got = t(spark, franchise_info,
            [{"franchise": V.franchise, "location": {"name": V.location},
              "managers": [{"name": V.manager}],
              "employees": [{"name": V.employee, "months_worked": V.months}]}],
            {V.employee: {"months_worked": V.months, "location": V.location,
                          "franchise": V.franchise}},
            where=["manager = 'Ruth'", "months > 12"])
    assert got == {"Mary": {"months_worked": 22, "location": "East Location",
                            "franchise": "Laundry Store"}}


# ---- map destructuring (demo.clj:332-367) -----------------------------


def test_map_traversal_vs_get(spark):
    assert t(spark, {"a": 1, "b": 2, "c": 3}, {V.k: V.v}, [V.v]) == [1, 2, 3]
    assert t(spark, {"a": 1, "b": 2, "c": 3}, {"a": V.v}, [V.v]) == [1]


def test_literal_key_marker(spark):
    # demo.clj:350-351 — (:literal :keys)
    data = {"keys": [1, 2, 3], "vals": [4, 5, 6]}
    assert t(spark, data, {Lit("keys"): [V.x]}, [V.x]) == [1, 2, 3]


def test_all_pairs_combinations(spark):
    # demo.clj:359-367 — {k v, k' v'} all pairs summing to 10
    got = t(spark, {"a": 7, "b": 3, "c": 5, "d": 5, "e": 3},
            {V.k: V.v, V.k2: V.v2}, SetOf(SetOf([V.k, V.k2])),
            where=["k != k2", "v + v2 = 10"])
    assert got == {("c", "d"), ("a", "e"), ("a", "b")}


def test_vector_partitioning_pairs(spark):
    # demo.clj:372-382
    assert t(spark, [1, 2, 3, 4, 5, 6, 7, 8], [V.a, V.b], ["a + b AS s"]) == [3, 7, 11, 15]
    assert t(spark, [1, 2, 3, 4, 5, 6, 7, 8, 9], [V.a, V.b, V.c],
             ["a + b + c AS s"]) == [6, 15, 24]


# ---- test/core.clj ----------------------------------------------------


def test_map_to_map_swap(spark):
    # core.clj:123-131
    got = t(spark, {"a": {"b": 2, "c": 5}, "c": {"b": 3, "e": 1}},
            {V.k1: {V.k2: V.v}}, {V.k2: {V.k1: V.v}})
    assert got == {"b": {"a": 2, "c": 3}, "c": {"a": 5}, "e": {"c": 1}}


def test_set_in_map_profs(spark):
    # core.clj:133-162
    profs = {"Sussman": {"AI": [{"name": "John", "grade": "A"},
                                {"name": "Sally", "grade": "B"}],
                         "Compilers": [{"name": "Tom", "grade": "B"},
                                       {"name": "John", "grade": "B"}]},
             "Abelson": {"Machine Learning": [{"name": "Sally", "grade": "C"},
                                              {"name": "Tom", "grade": "B-"}],
                         "Compilers": [{"name": "Eva Lu Ator", "grade": "B"},
                                       {"name": "Ben Bitdiddle", "grade": "A"}]}}
    expected = {"John": {"Sussman"}, "Sally": {"Abelson", "Sussman"},
                "Tom": {"Abelson", "Sussman"}, "Eva Lu Ator": {"Abelson"},
                "Ben Bitdiddle": {"Abelson"}}
    got = t(spark, profs, {V.prof: {V._: [V.student]}},
            {K("student.name AS sname"): SetOf(V.prof)})
    assert got == expected
    got = t(spark, profs, {V.prof: {V._: [{"name": V.name}]}},
            {V.name: SetOf(V.prof)})
    assert got == expected
    got = t(spark, profs, {V.prof: {V._: [Keys("name")]}},
            {V.name: SetOf(V.prof)})
    assert got == expected


def test_simple_vector_partitioning(spark):
    # core.clj:164-185
    assert t(spark, [1, 2, 3, 4, 5, 6], [V.a, V._], [V.a]) == [1, 3, 5]
    assert t(spark, [1, 2, 3, 4, 5, 6], [V.a, V._, V.c],
             [{"a": V.a, "c": V.c}]) == [{"a": 1, "c": 3}, {"a": 4, "c": 6}]
    assert t(spark, [1, 2, 3, 4, 5, 6], [V._, V.b, V._], [V.b]) == [2, 5]
    assert t(spark, [1, 2, 3, 4, 5], [V._, V.b], [V.b],
             where=["b IS NOT NULL"]) == [2, 4]
    assert t(spark, [[1, 2], [3, 4], [5, 6]], [[V.a, V._]], [V.a]) == [1, 3, 5]
    assert t(spark, [[1, 2], [3, 4], [5, 6]], [[V._, V.b]], [V.b]) == [2, 4, 6]
    assert t(spark, [[1, 2], [3, 4]], [[V.a]], [V.a]) == [1, 2, 3, 4]


def test_complex_vector_partitioning(spark):
    # core.clj:187-212 — {{:keys [k]} [a _ c]} re-expressed as rows
    data_rows = [{"k": "a", "xs": [1, 2, 3, 4, 5, 6]},
                 {"k": "b", "xs": [7, 8, 9, 10, 11, 12]}]
    got = t(spark, data_rows, [{"k": V.k, "xs": [V.a, V._, V.c]}],
            {K("a + c AS s"): V.k}, where=["a % 2 = 0", "c % 2 = 0"])
    assert got == {10: "a", 22: "b"}

    nested = [[1, 2, 3], [4, 5, 98, 7], [5, 6, 8, 17], [13, 14, 15]]
    assert t(spark, nested, [[V._, V.b], V._], [V.b],
             where=["b IS NOT NULL", "b % 2 = 0"]) == [2, 6]
    assert t(spark, nested, [V._, [V.a, V._]], [V.a],
             where=["a IS NOT NULL", "a % 2 = 0"]) == [4, 98]
    assert t(spark, nested, [V._, [V._, V.b]], [V.b],
             where=["b IS NOT NULL", "b % 2 = 0"]) == [14]
    assert t(spark, nested, [[V.a, V._], V._], [V.a],
             where=["a IS NOT NULL", "a % 2 = 0"]) == [8]


def test_key_literals(spark):
    # core.clj:214-228
    data = [{"num": 6, "coll": [1, 2]}, {"num": 7, "coll": [-94, -100]},
            {"num": 8, "coll": [3, 4]}]
    assert t(spark, data, [{"num": V.n, "coll": [V.x]}], SetOf(V.x),
             where=["n % 2 = 0"]) == {1, 2, 3, 4}
    assert t(spark, data, [{Keys("num"): None, "coll": [V.x]}], SetOf(V.x),
             where=["num % 2 = 1"]) == {-94, -100}


def test_as_binding_pieces(spark):
    # core.clj:230-251
    pieces = [{"composer": "Bartók", "title": "Piano Concerto 1", "year": 1926},
              {"composer": "Bartók", "title": "String Quartet 2", "year": 1917},
              {"composer": "Ligeti", "title": "Etude 1", "year": 1985},
              {"composer": "Ligeti", "title": "Mysteries of the Macabre", "year": 1992}]
    expected = {
        "Bartók": {1926: [{"composer": "Bartók", "title": "Piano Concerto 1", "year": 1926}],
                   1917: [{"composer": "Bartók", "title": "String Quartet 2", "year": 1917}]},
        "Ligeti": {1985: [{"composer": "Ligeti", "title": "Etude 1", "year": 1985}],
                   1992: [{"composer": "Ligeti", "title": "Mysteries of the Macabre", "year": 1992}]}}
    got = t(spark, pieces, [{Keys("composer", "year"): None, As("piece"): None}],
            {V.composer: {V.year: [V.piece]}})
    assert got == expected
    got = t(spark, pieces, [{Keys("composer"): None, "year": V.y, As("piece"): None}],
            {V.composer: {V.y: [V.piece]}})
    assert got == expected


def test_mixed_key_types(spark):
    # core.clj:253-264 — {:a 1 "b" 2} analog: plain dict rows
    data = [{"a": 1, "b": 2}, {"a": 2, "b": 3}, {"a": 3, "b": 5}, {"a": 4, "b": 4}]
    expected = {1: 2, 2: 3, 4: 4, 3: 5}
    assert t(spark, data, [{"a": V.a, "b": V.b}], {V.a: V.b}) == expected
    assert t(spark, data, [{Keys("a"): None, "b": V.b}], {V.a: V.b}) == expected


def test_literal_reserved_words(spark):
    # core.clj:266-274 — :keys/:strs/:as as literal map keys
    data = [{"keys": 1, "strs": 2, "syms": 3, "as": 4},
            {"keys": 5, "strs": 6, "syms": 7, "as": 8}]
    got = t(spark, data,
            [{Lit("keys"): V.a, Lit("strs"): V.b, Lit("syms"): V.c, Lit("as"): V.d}],
            SetOf("a + b + c + d"))
    assert got == {10, 26}


def test_composite_literal_key(spark):
    # core.clj:276-278 — {(:literal [101 23]) x}
    rows = [{"k": [101, 23], "v": 4}, {"k": [98], "v": 2}]
    got = t(spark, rows, [{"k": V.k, "v": V.x}], SetOf(V.x),
            where=["k = array(101, 23)"])
    assert got == {4}


def test_variable_key_literal(spark):
    # core.clj:280-288 — merge-key-vals via (:literal k1)/(:literal k2)
    data = {"a": [1, 2, 3], "b": [3, 4, 5], "c": [5, 6, 7]}

    def merge_key_vals(m, k1, k2):
        return t(spark, m, {Lit(k1): [V.v1], Lit(k2): [V.v2]}, SetOf(V.v1, V.v2))

    assert merge_key_vals(data, "a", "b") == {1, 2, 3, 4, 5}


def test_where_infinite_analog(spark):
    # core.clj:291-295 — pushdown skips unneeded branches
    got = t(spark, {1: [9, 9], 2: [1, 2], 3: [9], 4: [3, 4]},
            {V.k: [V.n]}, {V.n: V.k}, where=["k % 2 = 0", "n % 2 = 1"])
    assert got == {1: 2, 3: 4}


def test_key_destructuring(spark):
    # core.clj:297-305
    pair_map_rows = [{"k": [1, 2], "v": 3}, {"k": [4, 5], "v": 6}]
    got = t(spark, pair_map_rows, [{"k": (V.n1, V.n2), "v": V.v}],
            SetOf("n1 + n2 + v"))
    assert got == {6, 15}
    map_map_rows = [{"k": {"a": 1, "b": 2}, "v": 3}, {"k": {"a": 4, "b": 5}, "v": 6}]
    got = t(spark, map_map_rows, [{"k": Keys("a", "b"), "v": V.v}],
            SetOf("a + b + v"))
    assert got == {6, 15}


# ---- reducers (core.clj:355-440) --------------------------------------


def test_simple_reducers(spark):
    assert t(spark, [1, 2, 3, 1, 2, 3], [V.x], Agg("max(x)")) == 3
    assert t(spark, [1, 2, 3, 1, 2, 3], [V.x],
             Agg("greatest(max(x), max(x + 1))")) == 4
    assert t(spark, [1, 2, 3, 1, 2, 3], [V.x],
             Agg("greatest(max(x), count(x))")) == 6
    assert t(spark, [1, 2, 3, 1, 2, 3], [V.x], Agg("count(distinct x)")) == 3
    # (apply max [v]) at top level — global reduce over nested values
    got = t(spark, {"a": [1, 2, 3], "b": [8, 9, 5], "d": [4, 5, 6]},
            {V.k: [V.v]}, Agg("max(v)"))
    assert got == 9


def test_complicated_reducers(spark):
    # core.clj:379-440
    student_data = [
        {"student": "john", "grade1": 97, "grade2": 89, "course": "math", "campus": "east"},
        {"student": "john", "grade1": 90, "grade2": 70, "course": "english", "campus": "east"},
        {"student": "john", "grade1": 70, "grade2": 80, "course": "history", "campus": "east"},
        {"student": "dave", "grade1": 80, "grade2": 80, "course": "math", "campus": "east"},
        {"student": "dave", "grade1": 100, "grade2": 90, "course": "english", "campus": "east"},
        {"student": "mary", "grade1": 90, "grade2": 86, "course": "math", "campus": "west"},
        {"student": "mary", "grade1": 92, "grade2": 81, "course": "english", "campus": "west"},
        {"student": "mary", "grade1": 94, "grade2": 83, "course": "history", "campus": "west"},
    ]
    dom = [Keys("student", "grade1", "grade2", "course", "campus")]
    assert t(spark, student_data, dom, {V.student: Agg("max(grade2)")}) == \
        {"john": 89, "dave": 90, "mary": 86}
    assert t(spark, student_data, dom,
             {V.student: Agg("greatest(max(grade1), max(grade2))")}) == \
        {"john": 97, "dave": 100, "mary": 94}
    # max-key analog: course with best average grade
    assert t(spark, student_data, dom,
             {V.student: Agg("max_by(course, (grade1 + grade2) / 2)")}) == \
        {"john": "math", "dave": "english", "mary": "history"}
    assert t(spark, student_data, dom, {V.course: Agg("count(student)")},
             where=["grade1 > 95"]) == {"math": 1, "english": 1}
    # flagship campus report (core.clj:418-440 / demo.clj:58-86)
    got = t(spark, student_data, dom,
            {V.campus: {"number_students": Agg("count(distinct student)"),
                        "avg_grade_per_course": {V.course: Agg("avg(grade1)")},
                        "student_stats": {V.student: {V.course: V.grade1}}}})
    assert got == {
        "east": {"number_students": 2,
                 "avg_grade_per_course": {"math": 88.5, "english": 95.0, "history": 70.0},
                 "student_stats": {"john": {"math": 97, "english": 90, "history": 70},
                                   "dave": {"math": 80, "english": 100}}},
        "west": {"number_students": 1,
                 "avg_grade_per_course": {"math": 90.0, "english": 92.0, "history": 94.0},
                 "student_stats": {"mary": {"math": 90, "english": 92, "history": 94}}}}


def test_expression_collections(spark):
    # core.clj:444-450 — issue #3: conditional keys and values
    got = t(spark, [1, 2, 3, 4, 5, 6], [V.x],
            {K("if(x % 2 = 0, 'even', 'odd') AS parity"):
             ["if(x % 2 = 0, 2 * x, x + 1) AS y"]})
    assert got == {"even": [4, 8, 12], "odd": [2, 4, 6]}


def test_roundtrip_campus(spark):
    # demo.clj:88-91 — transform back to original rows
    student_data = [
        {"student": "john", "grade": 97, "course": "math", "campus": "east"},
        {"student": "dave", "grade": 80, "course": "math", "campus": "east"},
        {"student": "mary", "grade": 90, "course": "math", "campus": "west"},
    ]
    nested = transform(student_data, [Keys("student", "grade", "course", "campus")],
                       {V.campus: {"student_grades": {V.student: {V.course: V.grade}}}},
                       spark=spark)
    back = t(spark, nested,
             {V.campus: {"student_grades": {V.student: {V.course: V.grade}}}},
             [{"campus": V.campus, "student": V.student,
               "course": V.course, "grade": V.grade}])
    assert sorted(back, key=repr) == sorted(student_data, key=repr)


# ---- random-extension deftests, deterministic transcriptions ----------
# (the random-extension harness itself is mirrored in
# tests/test_dsl_property.py; these pin the exact hand-written oracles)


def test_map_domains(spark):
    # core.clj:50-91 — the five test-map-domains transforms
    # swap-key-order {k1 {k2 v}} -> {k2 {k1 v}} (also core.clj:123-131)
    assert t(spark, {"a": {"b": 2}, "c": {"b": 3, "e": 1}},
             {V.k1: {V.k2: V.v}}, {V.k2: {V.k1: V.v}}) == \
        {"b": {"a": 2, "c": 3}, "e": {"c": 1}}
    # remove-inner {k {_ v}} -> {k #{v}}
    assert t(spark, {"a": {"x": 1, "y": 2}, "b": {"z": 1}},
             {V.k: {V._: V.v}}, {V.k: SetOf(V.v)}) == \
        {"a": {1, 2}, "b": {1}}
    # flip {k v} -> {v k}
    assert t(spark, {"a": 1, "b": 2}, {V.k: V.v}, {V.v: V.k}) == \
        {1: "a", 2: "b"}
    # skipping-flatset {k [v _]} -> #{[k v]} (int keys: Spark arrays are
    # homogeneous, so the reference's mixed-type pair vector maps to a
    # same-type pair; SURVEY §4)
    assert t(spark, {10: [1, 2, 3, 4], 20: [5, 6]},
             {V.k: [V.v, V._]}, SetOf((V.k, V.v))) == \
        {(10, 1), (10, 3), (20, 5)}
    # sums-of-all-pairs-of-vals {k1 v1, k2 v2} -> #{(+ v1 v2)} —
    # includes same-entry pairs, exactly like the reference oracle
    assert t(spark, {"a": 1, "b": 2, "c": 3},
             {V.k: V.v, V.k2: V.v2}, SetOf("v + v2")) == {2, 3, 4, 5, 6}


def test_vector_domains(spark):
    # core.clj:93-115 — the five test-vector-domains transforms
    # seconds [_ b] -> [b]
    assert t(spark, [1, 2, 3, 4, 5, 6], [V._, V.b], [V.b]) == [2, 4, 6]
    # sums-of-pairs-of-odds [a _ c _] -> [(+ a c)] :where [a c] (non-nil)
    assert t(spark, [1, 2, 3, 4, 5, 6, 7, 8], [V.a, V._, V.c, V._],
             ["a + c AS s"],
             where=["a IS NOT NULL", "c IS NOT NULL"]) == [4, 12]
    # [[a]] -> [a] (flatten)
    assert t(spark, [[1, 2], [3, 4]], [[V.a]], [V.a]) == [1, 2, 3, 4]
    # sums-of-1-3-in-2 [_ [a _ c] _] -> #{(+ a c)} (outer skipped slots
    # hold arrays too: Spark arrays are homogeneous, wildcards unbound)
    assert t(spark, [[9], [1, 2, 3], [9], [9], [4, 5, 6], [9]],
             [V._, [V.a, V._, V.c], V._], SetOf("a + c"),
             where=["a IS NOT NULL", "c IS NOT NULL"]) == {4, 10}
    # super-contrived [{k [v]} _] -> #{(+ k v)}
    assert t(spark, [{1: [10, 20]}, {99: [0]}, {2: [30]}, {99: [0]}],
             [{V.k: [V.v]}, V._], SetOf("k + v")) == {11, 21, 32}


def test_set_domains(spark):
    # core.clj:117-121 — adj-sums #{[a b]} -> #{(+ a b)} :where [a b]
    # set domains traverse like vectors (D5: sets ≡ arrays), so the
    # reference's #{[a b]} is the nested-vector domain [[a b]]
    got = t(spark, [[1, 2, 3], [5, 6]], [[V.a, V.b]], SetOf("a + b"),
            where=["a IS NOT NULL", "b IS NOT NULL"])
    assert got == {3, 11}


def test_combinations_core(spark):
    # core.clj:307-313 — identical to demo.clj:359-367 (see
    # test_all_pairs_combinations) but asserted with the deftest's data
    got = t(spark, {"a": 7, "b": 3, "c": 5, "d": 5, "e": 3},
            {V.k: V.v, V.k2: V.v2}, SetOf(SetOf([V.k, V.k2])),
            where=["k != k2", "v + v2 = 10"])
    assert got == {("c", "d"), ("a", "e"), ("a", "b")}


def test_higher_level_sanity_record_stores(spark):
    # core.clj:315-353 — record-store inventory regrouped by artist/title.
    # The reference's heterogeneous pair vector [(str store " @ " loc) qty]
    # maps to a struct (SURVEY §4: fixed-shape mixed types -> StructType);
    # lists build canonically sorted (arrays sorted for determinism).
    json = [
        {"store-name": "Tom's Records", "location": "1234 Main Street",
         "stock": [{"artist": "Bartók", "title": "String Quartets", "quantity": 5},
                   {"artist": "Ligeti", "title": "Violin Concerto", "quantity": 1}]},
        {"store-name": "Roger's Records", "location": "789 Secondary Street",
         "stock": [{"artist": "Ligeti", "title": "Violin Concerto", "quantity": 3},
                   {"artist": "Scriabin", "title": "12 Etudes", "quantity": 2}]},
    ]
    got = t(spark, json,
            [{"store-name": V.store, "location": V.loc,
              "stock": [{"artist": V.artist, "title": V.title,
                         "quantity": V.quantity}]}],
            {V.artist: {V.title: [{
                "store_at": "concat(store, ' @ ', loc)",
                "quantity": V.quantity}]}})
    assert got == {
        "Bartók": {"String Quartets": [
            {"store_at": "Tom's Records @ 1234 Main Street", "quantity": 5}]},
        "Ligeti": {"Violin Concerto": [
            {"store_at": "Roger's Records @ 789 Secondary Street", "quantity": 3},
            {"store_at": "Tom's Records @ 1234 Main Street", "quantity": 1}]},
        "Scriabin": {"12 Etudes": [
            {"store_at": "Roger's Records @ 789 Secondary Street", "quantity": 2}]},
    }


def test_for_each_leaf_semantics(spark):
    # demo.clj:97-106 — for-each runs the action once per fully-bound
    # domain leaf (campus, student, course, grade), filtered by :where;
    # Iterator.rows() is the driver-side face of the same traversal.
    from faconne_spark import Iterator

    data = {"east": {"student-grades": {"john": {"math": 97, "english": 90},
                                        "dave": {"math": 80, "english": 100}}},
            "west": {"student-grades": {"mary": {"math": 90}}}}
    it = Iterator(
        {V.campus: {"student-grades": {V.student: {V.course: V.grade}}}},
        where=["grade >= 95"],
    )
    from faconne_spark.dsl.pyobj import to_df

    msgs = sorted(
        f"Congratulations to {r['student']} at {r['campus']} campus!"
        f" They got a {r['grade']} in {r['course']}!"
        for r in it.rows(to_df(
            data,
            spark,
            domain={V.campus: {"student-grades": {V.student: {V.course: V.grade}}}},
        ))
    )
    assert msgs == [
        "Congratulations to dave at east campus! They got a 100 in english!",
        "Congratulations to john at east campus! They got a 97 in math!",
    ]


# --------------------------------------------------- struct-of-agg sugar
#
# NOTE on the ^:expand contract (SURVEY §2.2 R7): the reference accepts
# arbitrary Clojure fns as reducers; this engine requires SQL-expressible
# aggregates (Agg/AggOp) so grouped reduction stays JVM-side.  Every
# reducer appearing in the reference's own test suite is covered by the
# parity tests in this file — the restriction excludes no reference
# behavior that its tests exercise.


def test_struct_agg_sugar_matches_agg_strings(spark, sf_dir):
    """R6 via the first-class sugar (reference parse_range.cljc:112-139
    composable expands): Struct(CountDistinct/Round(Sum)/Min) must
    produce the exact rows of the hand-written Agg("...") spelling —
    the sugar desugars to the same SQL, hence the same Catalyst plan."""
    from faconne_spark import (
        Agg, CountDistinct, Keys, Min, Round, Struct, Sum, transform,
    )
    from faconne_spark.queries import T

    cust = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    joined = cust.join(nation, cust.c_nationkey == nation.n_nationkey)
    domain = [Keys("n_name", "c_custkey", "c_acctbal", "c_mktsegment")]
    sugared = transform(
        joined, domain,
        {V.n_name: Struct(
            n_customers=CountDistinct(V.c_custkey),
            total_bal=Round(Sum(V.c_acctbal), 2),
            first_segment=Min(V.c_mktsegment),
        )},
    )
    spelled = transform(
        joined, domain,
        {V.n_name: {
            "n_customers": Agg("count(distinct c_custkey)"),
            "total_bal": Agg("round(sum(c_acctbal), 2)"),
            "first_segment": Agg("min(c_mktsegment)"),
        }},
    )
    a = sorted(tuple(r) for r in sugared.collect())
    b = sorted(tuple(r) for r in spelled.collect())
    assert a == b and len(a) > 0


def test_agg_sugar_arithmetic_composition(spark):
    """Composed expands as first-class arithmetic: Sum(x)/Count() is
    avg, (Max-Min) is range — matching the SQL-string spellings."""
    from faconne_spark import (
        Agg, Count, Keys, Max, Min, Round, Struct, Sum, transform,
    )
    from faconne_spark.dsl.pyobj import collect_nested

    rows = [(g, v) for g in ("a", "b") for v in (1.0, 2.0, 4.0)]
    spark_df = spark.createDataFrame(rows, "g string, v double")
    domain = [Keys("g", "v")]
    sugared = transform(
        spark_df, domain,
        {V.g: Struct(
            avg_v=Round(Sum(V.v) / Count(), 6),
            spread=Max(V.v) - Min(V.v),
            scaled=Round(2 * Sum(V.v), 6),
        )},
    )
    spelled = transform(
        spark_df, domain,
        {V.g: {
            "avg_v": Agg("round((sum(v) / count(*)), 6)"),
            "spread": Agg("(max(v) - min(v))"),
            "scaled": Agg("round((2 * sum(v)), 6)"),
        }},
    )
    assert collect_nested(sugared) == collect_nested(spelled)
    got = collect_nested(sugared)
    assert got["a"]["avg_v"] == pytest.approx(7.0 / 3, abs=1e-6)
    assert got["a"]["spread"] == 3.0


def test_struct_sugar_nested_in_grouping(spark):
    """Struct sugar under a two-level grouping desugars into the nested
    dict form — deep-merge/fusion behaviour identical."""
    from faconne_spark import Count, Keys, Struct, Sum, transform
    from faconne_spark.dsl.pyobj import collect_nested

    rows = [("x", "p", 1), ("x", "q", 2), ("y", "p", 3), ("x", "p", 4)]
    df = spark.createDataFrame(rows, "outer string, inner string, v int")
    got = collect_nested(transform(
        df, [Keys("outer", "inner", "v")],
        {V.outer: {V.inner: Struct(n=Count(), total=Sum(V.v))}},
    ))
    assert got == {
        "x": {"p": {"n": 2, "total": 5}, "q": {"n": 1, "total": 2}},
        "y": {"p": {"n": 1, "total": 3}},
    }
