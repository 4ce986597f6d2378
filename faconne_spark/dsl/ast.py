"""Pattern AST for the transform DSL.

Mirrors the reference grammar (reference: src/faconne/parse_domain.cljc:8-25
for domains, src/faconne/parse_range.cljc for ranges) with Python syntax:

Domain patterns
---------------
* ``V.x`` / ``Var("x")``      — bind a variable (leaf or traversal key)
* ``V._`` / ``Wild()``        — anonymous binding (traverse, don't bind)
* ``[pat]``                   — iterate a vector/array (or DataFrame rows)
* ``[p1, p2, ...]``           — take the vector n at a time (reference
                                 demo.clj:369-382); ``V._`` skips positions
* ``SetOf(pat)``              — iterate a set
* ``{...}``                   — map/struct traversal; keys may be:
    - ``str`` / ``Lit(x)``    — literal key get (getField / element_at)
    - ``Var``                 — traverse all entries binding key;
                                 several Var keys → all k-groupings of
                                 entries (reference demo.clj:354-367)
    - ``Keys("a", "b")``      — clojure ``{:keys [a b]}`` destructuring
    - ``As("name")``          — bind the whole node (``:as``)
    - ``(V.a, V.b)``          — destructured (array/struct) key
    - ``Keys(...)`` as key with dict value — destructured map key

Range patterns
--------------
* ``V.x`` or SQL-expr ``str`` — per-leaf value expression (supports
                                 ``"expr AS name"`` aliasing)
* ``[elem]``                  — build a list (canonically sorted)
* ``SetOf(elem)``             — build a set
* ``{key: sub}`` (Var/expr keys) — grouping (map build)
* ``{"lit": sub, ...}`` (literal str keys) — fixed-shape struct; branches
                                 at different grouping depths are computed
                                 independently and deep-merged by joining
                                 on shared outer keys (reference
                                 parse_range.cljc:33-57 deep-merge)
* ``Agg("sum(x)")``           — ``^:expand`` reducer: an aggregate SQL
                                 expression evaluated once the group is
                                 fully built (reference
                                 parse_range.cljc:112-139)
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field


_wild_counter = itertools.count()


@dataclass(frozen=True)
class Var:
    name: str

    def __repr__(self) -> str:  # pragma: no cover
        return f"V.{self.name}"


@dataclass(frozen=True)
class Wild(Var):
    """Anonymous traversal slot (clojure ``_``)."""

    name: str = field(default_factory=lambda: f"__wild_{next(_wild_counter)}")


@dataclass(frozen=True)
class Lit:
    """Explicit literal key — reference ``(:literal x)``,
    src/faconne/parse_domain.cljc:111-119."""

    value: object


@dataclass(frozen=True)
class Keys:
    """``{:keys [a b]}`` destructuring (src/faconne/parse_domain.cljc:83-93)."""

    names: tuple

    def __init__(self, *names: str):
        object.__setattr__(self, "names", tuple(names))


@dataclass(frozen=True)
class As:
    """``:as`` whole-node binding (src/faconne/parse_domain.cljc:95-103)."""

    name: str


class SetOf:
    """Set pattern (Python sets can't hold dicts/lists, so sets are spelled
    ``SetOf(elem)`` in both domain and range positions). In ranges,
    multiple arguments build a multi-element set per leaf — the
    reference's ``#{v1 v2}`` (parse_range.cljc:219-224 conj's each
    element)."""

    def __init__(self, *elems):
        if not elems:
            raise ValueError("SetOf needs at least one element pattern")
        if len(elems) == 1 and isinstance(elems[0], list):
            # SetOf([a, b]) ≡ SetOf(a, b) — clojure #{a b}
            elems = tuple(elems[0])
        self.elems = elems

    @property
    def elem(self):
        if len(self.elems) != 1:
            raise ValueError("SetOf with multiple elements used where one is expected")
        return self.elems[0]

    def __repr__(self) -> str:  # pragma: no cover
        return f"SetOf({', '.join(map(repr, self.elems))})"


class Agg:
    """``^:expand`` reducer: SQL aggregate expression over the fully built
    group — e.g. ``Agg("avg(grade)")``, ``Agg("count(distinct student)")``,
    ``Agg("greatest(max(g1), max(g2))")`` (nested expands compose inside
    one SQL expression). ``alias`` names the output column.

    DELIBERATE CONTRACT DELTA from the reference: faconne's ``^:expand``
    accepts ANY Clojure fn as a reducer (parse_range.cljc:112-139, e.g. a
    bespoke ``max-key`` lambda); here reducers must be SQL-EXPRESSIBLE
    aggregates.  Why: an arbitrary Python reducer would run as a
    row-at-a-time Python UDF — the one execution path this engine bans,
    because it breaks whole-stage codegen and map-side partial
    aggregation, the two properties that make grouped reduction viable at
    100 TB.  Every reducer in the reference's own test suite is
    expressible this way (proven by tests/test_dsl_parity.py); a truly
    non-SQL reduction has a documented escape hatch — drop to
    ``df.groupBy(...).applyInPandas(...)`` by hand, outside the DSL."""

    def __init__(self, sql: str, alias: str | None = None):
        self.sql = sql
        self.alias = alias

    def sql_for(self, df) -> str:
        """Aggregate SQL for this reducer, given the bound DataFrame
        (overridden by :class:`PyAgg`, which must register its function
        on the DataFrame's session first)."""
        return self.sql

    def __repr__(self) -> str:  # pragma: no cover
        return f"Agg({self.sql!r})"


_PYAGG_SEQ = itertools.count()


class PyAgg(Agg):
    """Arbitrary-FUNCTION ``^:expand`` reducer — the opt-in escape
    hatch that closes the documented contract delta with the reference
    (parse_range.cljc:112-139 accepts ANY Clojure fn as a reducer).

    ``fn`` is a plain Python callable applied to the SORTED list of the
    group's values, ONCE PER GROUP — never per row: this compiles to
    ``<registered udf>(array_sort(collect_list(over)))``, so the
    groupBy itself remains a native Catalyst aggregate with map-side
    partial collect, and the Python cost is O(groups) Arrow-batched
    calls, not O(rows).  The group list arrives sorted so the fn sees a
    deterministic order (the reference reduces an unordered collection,
    so any fixed order is semantics-preserving).

    Honest scale contract: per-group state is the collected value list
    — the same bound as the reference's in-memory reduction — so this
    is for reductions that are genuinely not SQL-expressible; prefer
    :class:`Agg`/:class:`AggOp` everywhere else.  ``returns`` is the
    Spark SQL type of the result; ``alias`` is required (there is no
    SQL text to scrape a name from).
    """

    def __init__(self, over, fn, returns: str = "double", alias: str | None = None):
        from faconne_spark.errors import FaconneError

        if alias is None:
            raise FaconneError("PyAgg requires an explicit alias=")
        if not callable(fn):
            raise FaconneError("PyAgg fn must be callable")
        super().__init__(sql=f"<pyagg {getattr(fn, '__name__', 'fn')}>", alias=alias)
        self.over = over
        self.fn = fn
        self.returns = returns
        self._n = next(_PYAGG_SEQ)

    def sql_for(self, df) -> str:
        name = f"faconne_pyagg_{self._n}"
        df.sparkSession.udf.register(name, self.fn, self.returns)
        inner = f"`{self.over.name}`" if isinstance(self.over, Var) else str(self.over)
        return f"{name}(array_sort(collect_list({inner})))"

    def __repr__(self) -> str:  # pragma: no cover
        return f"PyAgg({self.over!r}, {self.fn!r})"


class AggOp:
    """Composable ``^:expand`` reducer — the first-class form of
    :class:`Agg` (reference parse_range.cljc:112-139 composes reducing
    fns; here aggregate objects compose with arithmetic operators and
    :class:`Round`).  Compiles to exactly the SQL an equivalent
    ``Agg("...")`` would, so the Catalyst plan (incl. partial
    aggregation) is identical.

    >>> Struct(n=CountDistinct(V.c_custkey),
    ...        bal=Round(Sum(V.c_acctbal), 2),
    ...        avg_bal=Round(Sum(V.c_acctbal) / Count(), 6))
    """

    def to_sql(self) -> str:  # pragma: no cover - abstract
        raise NotImplementedError

    def __add__(self, other):
        return BinAgg("+", self, other)

    def __radd__(self, other):
        return BinAgg("+", other, self)

    def __sub__(self, other):
        return BinAgg("-", self, other)

    def __rsub__(self, other):
        return BinAgg("-", other, self)

    def __mul__(self, other):
        return BinAgg("*", self, other)

    def __rmul__(self, other):
        return BinAgg("*", other, self)

    def __truediv__(self, other):
        return BinAgg("/", self, other)

    def __rtruediv__(self, other):
        return BinAgg("/", other, self)

    def __repr__(self) -> str:  # pragma: no cover
        return f"{type(self).__name__}<{self.to_sql()}>"


def _agg_operand_sql(x) -> str:
    if isinstance(x, AggOp):
        return x.to_sql()
    if isinstance(x, Var):
        return f"`{x.name}`"
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, (int, float)):
        return repr(x)
    if isinstance(x, str):  # raw row-level SQL, e.g. Sum("a * b")
        return x
    raise TypeError(f"cannot use {x!r} inside a composed aggregate")


class BinAgg(AggOp):
    """Arithmetic composition of aggregates: ``Sum(x) / Count()``."""

    def __init__(self, op: str, left, right):
        self.op = op
        self.left = left
        self.right = right

    def to_sql(self) -> str:
        return (
            f"({_agg_operand_sql(self.left)} {self.op} "
            f"{_agg_operand_sql(self.right)})"
        )


class _FnAgg(AggOp):
    _fn = ""

    def __init__(self, *args, distinct: bool = False):
        self.args = args
        self.distinct = distinct

    def to_sql(self) -> str:
        inner = ", ".join(_agg_operand_sql(a) for a in self.args) or "*"
        return f"{self._fn}({'distinct ' if self.distinct else ''}{inner})"


class Count(_FnAgg):
    """``Count()`` → count(*); ``Count(V.x)`` → count(x)."""

    _fn = "count"


class CountDistinct(Count):
    def __init__(self, *args):
        super().__init__(*args, distinct=True)


class Sum(_FnAgg):
    _fn = "sum"


class Avg(_FnAgg):
    _fn = "avg"


class Min(_FnAgg):
    _fn = "min"


class Max(_FnAgg):
    _fn = "max"


class Round(AggOp):
    """Post-aggregation rounding wrapper: ``Round(Sum(V.x), 2)``."""

    def __init__(self, inner, digits: int = 0):
        self.inner = inner
        self.digits = digits

    def to_sql(self) -> str:
        return f"round({_agg_operand_sql(self.inner)}, {self.digits})"


class Struct:
    """Fixed-shape struct sugar: ``Struct(a=..., b=...)`` is the
    first-class spelling of the literal-key dict ``{"a": ..., "b":
    ...}`` — pairs naturally with :class:`AggOp` fields, and desugars
    to the dict form before compilation (so deep-merge/fusion behaviour
    is exactly the dict's)."""

    def __init__(self, **fields):
        if not fields:
            raise ValueError("Struct needs at least one field")
        self.fields = fields

    def __repr__(self) -> str:  # pragma: no cover
        inner = ", ".join(f"{k}={v!r}" for k, v in self.fields.items())
        return f"Struct({inner})"


class K:
    """Computed grouping key in a range dict — e.g.
    ``{K("if(handled, 'handled', 'unhandled') AS status"): ...}``
    (reference demo.clj:164-167: arbitrary exprs as map keys). Plain
    ``str`` dict keys in ranges are literal *field names* (fixed-shape
    struct); computed keys must be wrapped in ``K`` or be a ``Var``."""

    def __init__(self, sql: str, alias: str | None = None):
        self.sql = sql
        self.alias = alias

    def __hash__(self):  # usable as a dict key
        return hash((self.sql, self.alias))

    def __eq__(self, other):
        return (
            isinstance(other, K)
            and (self.sql, self.alias) == (other.sql, other.alias)
        )

    def __repr__(self) -> str:  # pragma: no cover
        return f"K({self.sql!r})"


class _VFactory:
    """``V.x`` → ``Var("x")``; ``V._`` → fresh ``Wild``."""

    def __getattr__(self, name: str):
        if name == "_":
            return Wild()
        if name.startswith("__"):
            raise AttributeError(name)
        return Var(name)


V = _VFactory()
