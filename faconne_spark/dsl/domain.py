"""Domain binder: flatten a nested DataFrame into a relation of bound vars.

The reference compiles the domain into nested ``doseq``/``let``/``loop``
forms (src/faconne/compile.cljc:100-122). Spark-first, each traversal
becomes a Catalyst-native relational step instead:

* map traversal           → ``explode(map_entries(m))``
* vector/set iterate      → ``explode(arr)``
* vector n-at-a-time      → chunk structs via ``transform(sequence(...))``
                            then one ``explode`` (reference
                            compile.cljc:81-98's loop/recur)
* literal key get         → ``getField`` / ``element_at``
* ``:where``              → ``filter`` applied at the earliest frame where
                            all referenced vars are bound — the same
                            placement the reference computes in
                            parse_domain.cljc:195-207 — after which
                            Catalyst pushes the predicate further down
                            (into the parquet scan when possible).

The binder output is a flat DataFrame with one column per bound variable,
which the range builder then aggregates. Everything is a Column
expression; no Python UDFs.
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

from faconne_spark.dsl.ast import As, Keys, Lit, SetOf, Var, Wild
from faconne_spark.errors import FaconneError

_SQL_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def sql_idents(sql: str) -> set:
    """Identifiers appearing in a SQL expression (superset; used only to
    decide when all *domain vars* referenced by a where-clause are bound,
    mirroring parse_domain.cljc:186-193's clause environments)."""
    no_strings = re.sub(r"'[^']*'", "", sql)
    return set(_SQL_WORD.findall(no_strings))


def domain_vars(node) -> set:
    """All non-wild var names bound by a domain pattern."""
    out: set = set()

    def go(n):
        if isinstance(n, Wild):
            return
        if isinstance(n, Var):
            out.add(n.name)
        elif isinstance(n, As):
            out.add(n.name)
        elif isinstance(n, Keys):
            out.update(n.names)
        elif isinstance(n, SetOf):
            go(n.elem)
        elif isinstance(n, (list, tuple)):
            for c in n:
                go(c)
        elif isinstance(n, dict):
            for k, v in n.items():
                go(k)
                go(v)

    go(node)
    return out


class Binder:
    """Compile one domain pattern against one DataFrame schema."""

    def __init__(self, df: DataFrame, where: list | None):
        self._orig_cols = list(df.columns)
        self.df = df
        self.bound: set = set()
        self._tmp = itertools.count()
        self._pending: list = [(c, None) for c in (where or [])]
        self._dvars: set = set()

    # -- public ---------------------------------------------------------

    def bind(self, domain) -> DataFrame:
        self._dvars = domain_vars(domain)
        self._pending = [
            (c, sql_idents(c) & self._dvars) for (c, _) in self._pending
        ]
        self._apply_ready_filters()  # clauses over pre-existing columns
        self._enter_root(domain)
        missing = [c for c, _ in self._pending]
        if missing:
            raise FaconneError(
                f"where clauses reference unbound vars: {missing}; "
                f"bound = {sorted(self.bound)}"
            )
        cols = sorted(self.bound)
        return self.df.select(*cols)

    # -- internals ------------------------------------------------------

    def _fresh(self, stem: str) -> str:
        return f"__fac_{stem}_{next(self._tmp)}"

    def _dtype(self, col: Column) -> DataType:
        return self.df.select(col.alias("_t")).schema[0].dataType

    def _apply_ready_filters(self) -> None:
        """Apply every pending where-clause whose domain vars are all
        bound — the earliest-frame placement of parse_domain.cljc:195-207."""
        still = []
        for clause, needs in self._pending:
            if needs is not None and needs <= self.bound:
                self.df = self.df.filter(F.expr(clause))
            else:
                still.append((clause, needs))
        self._pending = still

    def _bind_var(self, name: str, col: Column) -> None:
        if name in self.bound:
            raise FaconneError(f"variable {name!r} bound twice in domain")
        self.df = self.df.withColumn(name, col)
        self.bound.add(name)
        self._apply_ready_filters()

    def _materialize(self, col: Column, stem: str = "m") -> str:
        name = self._fresh(stem)
        self.df = self.df.withColumn(name, col)
        return name

    # Root: DataFrame rows are the top-level collection.
    def _enter_root(self, domain) -> None:
        if len(self._orig_cols) == 1 and self._orig_cols[0] == "__root":
            # literal-object mode (pyobj.to_df): bind against the value
            self._go(domain, F.col("__root"))
        elif isinstance(domain, list) and len(domain) == 1:
            # [elem] over rows: each row is one element.
            self._go(domain[0], None)
        elif isinstance(domain, (list, SetOf)) or isinstance(domain, dict):
            if isinstance(domain, dict):
                self._go(domain, None)
            else:
                raise FaconneError(
                    "n-at-a-time vector domains over DataFrame *rows* would "
                    "need a global row order, which does not scale; wrap the "
                    "data as an array column (pyobj.to_df does this for "
                    "plain Python lists)"
                )
        elif isinstance(domain, Var):
            self._go(domain, None)
        else:
            raise FaconneError(f"unsupported top-level domain: {domain!r}")

    def _row_struct(self) -> Column:
        return F.struct(*[F.col(c) for c in self._orig_cols])

    def _go(self, node, src: Column | None) -> None:
        """Bind pattern ``node`` against ``src`` (None = the row itself)."""
        if isinstance(node, Wild):
            return
        if isinstance(node, Var):
            self._bind_var(node.name, self._row_struct() if src is None else src)
            return
        if isinstance(node, Keys):
            # bare Keys(...) element: shorthand for {Keys(...): None}
            dt = None if src is None else self._dtype(src)
            for name in node.names:
                self._bind_var(name, self._get_key(src, dt, name))
            return
        if isinstance(node, As):
            self._bind_var(node.name, self._row_struct() if src is None else src)
            return
        if isinstance(node, SetOf):
            self._iterate_one(node.elem, src)
            return
        if isinstance(node, list):
            if len(node) == 0:
                raise FaconneError("empty vector domain")
            if len(node) == 1:
                self._iterate_one(node[0], src)
            else:
                self._iterate_chunks(node, src)
            return
        if isinstance(node, dict):
            self._go_map(node, src)
            return
        if isinstance(node, tuple):
            # positional destructure of a fixed-size array/struct value
            # (reference test/core.clj:297-305 pair-map keys)
            dt = None if src is None else self._dtype(src)
            self._bind_key_pattern(node, src, dt)
            return
        raise FaconneError(f"unsupported domain node: {node!r}")

    # --- collections ---------------------------------------------------

    def _iterate_one(self, elem, src: Column | None) -> None:
        if src is None:
            # rows are the elements
            self._go(elem, None)
            return
        dt = self._dtype(src)
        if isinstance(dt, MapType):
            raise FaconneError(
                "vector/set domain over a map value; use a {key: val} pattern"
            )
        if not isinstance(dt, ArrayType):
            raise FaconneError(f"expected array for vector/set domain, got {dt}")
        t = self._fresh("el")
        self.df = self.df.select("*", F.explode(src).alias(t))
        self._go(elem, F.col(t))

    def _iterate_chunks(self, pats: list, src: Column | None) -> None:
        """``[a b]`` / ``[a _ c]``: take the array n at a time; trailing
        partial chunks yield nulls (reference demo.clj:369-382 and
        test/core.clj:164-212 semantics)."""
        if src is None:
            raise FaconneError(
                "n-at-a-time vector domain requires an array column, not rows"
            )
        n = len(pats)
        arr = self._materialize(src, "arr")
        fields = ", ".join(
            f"try_element_at({arr}, i + {j + 1}) AS c{j}" for j in range(n)
        )
        chunk_sql = (
            f"transform("
            f"  filter(sequence(0, size({arr})), i -> i % {n} = 0 AND i < size({arr})),"
            f"  i -> struct({fields}))"
        )
        t = self._fresh("chunk")
        self.df = self.df.select("*", F.explode(F.expr(chunk_sql)).alias(t))
        for j, p in enumerate(pats):
            if not isinstance(p, Wild):
                self._go(p, F.col(t).getField(f"c{j}"))

    # --- maps ----------------------------------------------------------

    def _go_map(self, node: dict, src: Column | None) -> None:
        dt = None if src is None else self._dtype(src)
        for k, v in node.items():
            if isinstance(k, As):
                self._bind_var(
                    k.name, self._row_struct() if src is None else src
                )
            elif isinstance(k, Keys):
                if v is None:
                    for name in k.names:
                        self._bind_var(name, self._get_key(src, dt, name))
                else:
                    # destructured *map key*: {{:keys [a b]} v}
                    self._traverse_entries(k, v, src, dt)
            elif isinstance(k, (Var, tuple)):
                self._traverse_entries(k, v, src, dt)
            elif isinstance(k, Lit):
                self._go(v, self._get_key(src, dt, k.value))
            elif isinstance(k, (str, int, float, bool)):
                self._go(v, self._get_key(src, dt, k))
            else:
                raise FaconneError(f"unsupported map key pattern: {k!r}")

    def _get_key(self, src: Column | None, dt, key) -> Column:
        if src is None:
            if not isinstance(key, str):
                raise FaconneError(
                    f"non-string literal key {key!r} over DataFrame rows"
                )
            return F.col(key)
        if isinstance(dt, StructType):
            if not isinstance(key, str):
                raise FaconneError(f"struct field access needs str key: {key!r}")
            return src.getField(key)
        if isinstance(dt, MapType):
            if isinstance(key, (list, tuple)):
                kt = dt.keyType
                if isinstance(kt, ArrayType):
                    return F.element_at(src, F.array(*[F.lit(x) for x in key]))
                if isinstance(kt, StructType):
                    return F.element_at(
                        src,
                        F.struct(
                            *[
                                F.lit(x).alias(f.name)
                                for x, f in zip(key, kt.fields)
                            ]
                        ),
                    )
                raise FaconneError(f"composite literal key on map<{kt}, _>")
            return F.element_at(src, F.lit(key))
        raise FaconneError(f"literal key get on non-map/struct type {dt}")

    def _traverse_entries(self, kpat, vpat, src: Column | None, dt) -> None:
        """``{k v}``: iterate all entries, binding key pattern + value
        pattern (src/faconne/parse_domain.cljc:105-109). Multiple Var-key
        entries in one dict each call this → cross product of entries
        (all k-groupings, demo.clj:354-367)."""
        if src is None:
            # Keyed-DataFrame-as-map: a top-level grouping result is a
            # DataFrame with the map key as a column (§4 of SURVEY.md).
            # A Var key naming an existing column traverses that
            # representation: key ← the column, value ← the remaining
            # columns as a struct.
            if isinstance(kpat, Var) and not isinstance(kpat, Wild) \
                    and kpat.name in self._orig_cols:
                rest = [c for c in self._orig_cols if c != kpat.name]
                self._bind_var(kpat.name, F.col(kpat.name))
                # name-addressing patterns (dict/Keys/As) see the value
                # as a struct of the remaining columns; positional /
                # collection patterns unwrap a single value column.
                by_name = isinstance(vpat, (dict, Keys, As))
                if len(rest) == 1 and not by_name:
                    self._go(vpat, F.col(rest[0]))
                else:
                    self._go(vpat, F.struct(*[F.col(c) for c in rest]))
                return
            raise FaconneError(
                "dynamic {key: value} traversal over DataFrame rows is not "
                "supported (rows have fixed columns); name the columns, "
                "use a map column, or use a Var key matching the key "
                "column of a keyed DataFrame"
            )
        if isinstance(dt, MapType):
            t = self._fresh("ent")
            self.df = self.df.select(
                "*", F.explode(F.map_entries(src)).alias(t)
            )
            key_col = F.col(t).getField("key")
            val_col = F.col(t).getField("value")
            self._bind_key_pattern(kpat, key_col, dt.keyType)
            self._go(vpat, val_col)
        elif isinstance(dt, StructType):
            vts = {str(f.dataType) for f in dt.fields}
            if len(vts) > 1:
                raise FaconneError(
                    "dynamic key traversal over a struct with heterogeneous "
                    f"field types {vts}; use literal keys instead"
                )
            entries = F.array(
                *[
                    F.struct(
                        F.lit(f.name).alias("key"),
                        src.getField(f.name).alias("value"),
                    )
                    for f in dt.fields
                ]
            )
            t = self._fresh("ent")
            self.df = self.df.select("*", F.explode(entries).alias(t))
            self._bind_key_pattern(kpat, F.col(t).getField("key"), None)
            self._go(vpat, F.col(t).getField("value"))
        else:
            raise FaconneError(f"dynamic key traversal on non-map type {dt}")

    def _bind_key_pattern(self, kpat, key_col: Column, key_dt) -> None:
        if isinstance(kpat, Wild):
            return
        if isinstance(kpat, Var):
            self._bind_var(kpat.name, key_col)
        elif isinstance(kpat, tuple):
            # destructured vector key: {(V.a, V.b): v} over map<array<_>, _>
            for i, p in enumerate(kpat):
                if isinstance(p, Wild):
                    continue
                if isinstance(key_dt, StructType):
                    comp = key_col.getField(key_dt.fields[i].name)
                else:
                    comp = F.get(key_col, i)
                if isinstance(p, Var):
                    self._bind_var(p.name, comp)
                else:
                    raise FaconneError(
                        f"nested key destructure too deep: {p!r}"
                    )
        elif isinstance(kpat, Keys):
            for name in kpat.names:
                if isinstance(key_dt, MapType):
                    self._bind_var(name, F.element_at(key_col, F.lit(name)))
                else:
                    self._bind_var(name, key_col.getField(name))
        else:
            raise FaconneError(f"unsupported key pattern: {kpat!r}")
