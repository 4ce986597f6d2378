"""Range builder: rebuild the target shape from the bound-variable relation.

The reference evaluates the range at each domain leaf and deep-merges
results (src/faconne/parse_range.cljc:33-57, 193-229); ``^:expand``
collections defer a reducing fn until the collection is fully built
(parse_range.cljc:112-139). Spark-first, deep-merge *is* grouping:

* ``{key: sub}``            → ``groupBy(key)``; nested dicts extend the
                              grouping-key path; below the top level the
                              map is materialised as a ``MapType`` column
                              via ``map_from_entries`` over a
                              key-sorted ``collect_list``.
* ``[x]`` / ``SetOf(x)``    → ``collect_list`` / ``collect_set``
                              (canonically sorted where orderable — maps
                              are unordered in both engines, so list
                              order is defined as sorted multiset).
* ``Agg("sum(x)")``         → native aggregate expression: the whole
                              ``^:expand`` reducer machinery becomes
                              Catalyst aggregates with partial (map-side)
                              aggregation for free.
* fixed-key struct dicts    → branches at the same grouping level fuse
                              into ONE ``agg()`` call; branches that
                              group deeper are computed independently and
                              deep-merged back with a full-outer join on
                              the shared outer keys.

Nothing here is a Python UDF; every node compiles to a Column expression.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, AtomicType, MapType, StructType

from faconne_spark.dsl.ast import Agg, AggOp, K, Lit, SetOf, Struct, Var
from faconne_spark.errors import FaconneError


def desugar(node):
    """Normalize the first-class sugar forms before compilation:
    ``Struct(a=..., b=...)`` → literal-key dict, composable
    :class:`AggOp` trees → ``Agg(sql)``.  Everything downstream sees
    only the core range grammar, so the compiled plan is identical to
    the hand-written spelling."""
    if isinstance(node, Struct):
        return {k: desugar(v) for k, v in node.fields.items()}
    if isinstance(node, AggOp):
        return Agg(node.to_sql())
    if isinstance(node, dict):
        return {k: desugar(v) for k, v in node.items()}
    if isinstance(node, SetOf):
        return SetOf(*[desugar(e) for e in node.elems])
    if isinstance(node, list):
        return [desugar(e) for e in node]
    if isinstance(node, tuple):
        return tuple(desugar(e) for e in node)
    return node

_AS_RE = re.compile(r"\s+[aA][sS]\s+([A-Za-z_][A-Za-z0-9_]*)\s*$")


def split_alias(sql: str) -> tuple:
    m = _AS_RE.search(sql)
    if m:
        return sql[: m.start()], m.group(1)
    return sql, None


@dataclass
class Shape:
    """Result-shape descriptor, used by ``collect_nested`` to reassemble
    the actual nested Python object (small results / parity tests)."""

    kind: str  # group | struct | list | set | scalar | rows
    key: str | None = None
    child: "Shape | None" = None
    fields: dict = field(default_factory=dict)  # name -> (col | None, Shape)
    col: str | None = None


def _is_struct_dict(node: dict) -> bool:
    if all(isinstance(k, (str, Lit)) for k in node.keys()):
        return True
    if all(isinstance(k, (Var, K)) for k in node.keys()):
        return False
    raise FaconneError(
        f"range dict mixes literal field names and grouping keys: "
        f"{list(node.keys())!r}"
    )


class RangeBuilder:
    def __init__(self, flat: DataFrame):
        self.flat = flat
        self._tmp = itertools.count()

    # ---- small helpers -------------------------------------------------

    def _fresh(self, stem: str) -> str:
        return f"__fv_{stem}_{next(self._tmp)}"

    def _scalar_sql(self, node) -> tuple:
        """Row-level (non-aggregate) expression → (sql, alias|None)."""
        if isinstance(node, Var):
            return f"`{node.name}`", node.name
        if isinstance(node, str):
            sql, alias = split_alias(node)
            bare = node.strip()
            if alias is None and re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", bare):
                alias = bare
            return sql, alias
        raise FaconneError(f"expected scalar range expression, got {node!r}")

    def _elem_sql(self, node) -> str:
        """Row-wise element expression inside a collect: scalar, struct
        dict, or row-wise array (a collection nested inside an element,
        e.g. the inner set of ``#{#{k k'}}``, demo.clj:354-367)."""
        if isinstance(node, (Var, str)):
            return self._scalar_sql(node)[0]
        if isinstance(node, dict):
            if not _is_struct_dict(node):
                raise FaconneError(
                    "grouping dicts cannot nest inside collected elements"
                )
            parts = []
            for k, v in node.items():
                name = k.value if isinstance(k, Lit) else k
                parts.append(f"{self._elem_sql(v)} AS `{name}`")
            return "struct(" + ", ".join(parts) + ")"
        if isinstance(node, (SetOf, list, tuple)):
            # row-wise collection, e.g. the inner set of #{#{k k'}};
            # a tuple is the reference's ordered vector literal in
            # element position (#{[k v]}, test/core.clj:76-82) — kept
            # ordered and non-deduped, unlike the set form
            elems = list(node.elems) if isinstance(node, SetOf) else list(node)
            arr = "array(" + ", ".join(self._elem_sql(e) for e in elems) + ")"
            if isinstance(node, SetOf):
                return f"array_sort(array_distinct({arr}))"
            return arr
        raise FaconneError(f"unsupported element in collect: {node!r}")

    def _orderable(self, sql: str) -> bool:
        dt = self.flat.selectExpr(f"{sql} AS _t").schema[0].dataType
        def ok(t):
            if isinstance(t, AtomicType):
                return True
            if isinstance(t, StructType):
                return all(ok(f.dataType) for f in t.fields)
            if isinstance(t, ArrayType):
                return ok(t.elementType)
            return False  # MapType etc.
        return ok(dt)

    # ---- group-level value compilation --------------------------------

    def _agg_sql(self, node) -> str:
        """Aggregate SQL producing this node's value within one group."""
        if isinstance(node, Agg):
            sql, _ = split_alias(node.sql_for(self.flat))
            return sql
        if isinstance(node, (Var, str)):
            sql, _ = self._scalar_sql(node)
            # deep-merge of scalars: reference keeps one value per key
            # path (parse_range.cljc:57 — `:else y`); any_value is the
            # distributed analogue (max would force comparisons on
            # non-orderable types).
            return f"any_value({sql})"
        if isinstance(node, SetOf):
            elems = list(node.elems)
            if len(elems) == 1:
                e = self._elem_sql(elems[0])
                agg = f"collect_set({e})"
            else:
                # multi-element set build: #{e1 e2} conj's each per leaf
                arr = "array(" + ", ".join(self._elem_sql(e) for e in elems) + ")"
                e = arr
                agg = f"array_distinct(flatten(collect_list({arr})))"
            return f"array_sort({agg})" if self._orderable(self._elem_sql(elems[0])) else agg
        if isinstance(node, list):
            if len(node) == 1:
                e = self._elem_sql(node[0])
                agg = f"collect_list({e})"
            else:
                arr = "array(" + ", ".join(self._elem_sql(e) for e in node) + ")"
                agg = f"flatten(collect_list({arr}))"
            return f"array_sort({agg})" if self._orderable(self._elem_sql(node[0])) else agg
        raise FaconneError(f"cannot aggregate range node: {node!r}")

    def _value_shape(self, node) -> Shape:
        if isinstance(node, Agg) or isinstance(node, (Var, str)):
            return Shape("scalar")
        if isinstance(node, SetOf):
            return Shape("set", child=self._leaf_elem_shape(node.elems[0]))
        if isinstance(node, list):
            return Shape("list", child=self._leaf_elem_shape(node[0]))
        raise FaconneError(f"no shape for {node!r}")

    def _leaf_elem_shape(self, elem) -> Shape:
        if isinstance(elem, dict):
            return Shape(
                "struct",
                fields={
                    (k.value if isinstance(k, Lit) else k): (None, self._leaf_elem_shape(v))
                    for k, v in elem.items()
                },
            )
        if isinstance(elem, SetOf):
            return Shape("set", child=self._leaf_elem_shape(elem.elems[0]))
        if isinstance(elem, list):
            return Shape("list", child=self._leaf_elem_shape(elem[0]))
        return Shape("scalar")

    # ---- recursive build ----------------------------------------------

    def _key_info(self, k) -> tuple:
        if isinstance(k, Var):
            return f"`{k.name}`", k.name
        if isinstance(k, K):
            sql, alias = split_alias(k.sql) if k.alias is None else (k.sql, k.alias)
            return sql, (alias or self._fresh("key"))
        raise FaconneError(f"bad grouping key: {k!r}")

    def build_nested(self, node, key_cols: list) -> tuple:
        """Build ``node`` under grouping path ``key_cols`` (names already
        materialised on ``self.flat``). Returns (df[key_cols + __v], Shape)."""
        if isinstance(node, dict) and not _is_struct_dict(node):
            if len(node) != 1:
                raise FaconneError(
                    "grouping dicts must have exactly one {key: sub} entry; "
                    "use a struct dict for fixed fields"
                )
            (k, sub), = node.items()
            ksql, kname = self._key_info(k)
            self._ensure_col(kname, ksql)
            child, cshape = self.build_nested(sub, key_cols + [kname])
            # wrap child into a MapType column keyed by kname
            entries = F.array_sort(
                F.collect_list(F.struct(F.col(kname).alias("key"),
                                        F.col("__v").alias("value"))),
                lambda l, r: F.when(l["key"] < r["key"], -1)
                .when(l["key"] > r["key"], 1)
                .otherwise(0),
            )
            gb = child.groupBy(*key_cols) if key_cols else child.groupBy()
            df = gb.agg(F.map_from_entries(entries).alias("__v"))
            return df, Shape("group", key=kname, child=cshape)

        if isinstance(node, dict):  # struct dict
            return self._build_struct(node, key_cols, splay=False)

        # leaf aggregation at this grouping level
        gb = self.flat.groupBy(*key_cols) if key_cols else self.flat.groupBy()
        df = gb.agg(F.expr(self._agg_sql(node)).alias("__v"))
        return df, self._value_shape(node)

    def _ensure_col(self, name: str, sql: str) -> None:
        if name not in self.flat.columns:
            self.flat = self.flat.withColumn(name, F.expr(sql))

    def _build_struct(self, node: dict, key_cols: list, splay: bool) -> tuple:
        """Fixed-key dict: same-level branches fuse into one agg; deeper
        branches are joined back on the outer keys (deep merge,
        parse_range.cljc:33-57)."""
        same_level: list = []   # (field, agg_sql, shape)
        nested: list = []       # (field, df, shape)
        for k, v in node.items():
            fname = k.value if isinstance(k, Lit) else k
            if isinstance(v, dict):
                df, shp = self.build_nested(v, key_cols)
                nested.append((fname, df, shp))
            else:
                same_level.append((fname, self._agg_sql(v), self._value_shape(v)))

        pieces: list = []
        if same_level:
            gb = self.flat.groupBy(*key_cols) if key_cols else self.flat.groupBy()
            aggs = [F.expr(sql).alias(f"__f_{i}") for i, (_, sql, _) in enumerate(same_level)]
            pieces.append((
                gb.agg(*aggs),
                [(fname, f"__f_{i}", shp) for i, (fname, _, shp) in enumerate(same_level)],
            ))
        for i, (fname, df, shp) in enumerate(nested):
            pieces.append((df.withColumnRenamed("__v", f"__n_{i}"), [(fname, f"__n_{i}", shp)]))

        joined, fields = pieces[0]
        for df, fl in pieces[1:]:
            if key_cols:
                joined = joined.join(df, on=key_cols, how="full")
            else:
                joined = joined.crossJoin(df)
            fields = fields + fl

        if splay:
            shape = Shape(
                "struct",
                fields={fname: (col, shp) for fname, col, shp in fields},
            )
            return joined, fields, shape
        struct_col = F.struct(
            *[F.col(col).alias(fname) for fname, col, shp in fields]
        )
        out = joined.select(
            *key_cols, struct_col.alias("__v")
        )
        shape = Shape(
            "struct",
            fields={fname: (None, shp) for fname, col, shp in fields},
        )
        return out, shape


def build_range(flat: DataFrame, node) -> tuple:
    """Top-level entry: compile the range against the bound-var relation.

    Top-level *maps* become keyed DataFrames (one row per key — the
    distributed representation of a map); top-level *vectors/sets* become
    plain rows. ``collect_nested`` reassembles the literal nested object.
    """
    node = desugar(node)
    b = RangeBuilder(flat)

    # rows mode: top-level vector / set
    if isinstance(node, (list, SetOf)):
        elems = list(node.elems) if isinstance(node, SetOf) else node
        if len(elems) > 1:
            # multi-element build: each leaf contributes every element
            exprs = [F.expr(b._elem_sql(e)) for e in elems]
            df = flat.select(F.explode(F.array(*exprs)).alias("value"))
            shape = Shape("rows", child=Shape("scalar"), col="value")
            if isinstance(node, SetOf):
                df = df.distinct()
                shape.kind = "rowset"
            return df, shape
        elem = elems[0]
        if isinstance(elem, dict) and _is_struct_dict(elem):
            cols = []
            fields = {}
            for k, v in elem.items():
                name = k.value if isinstance(k, Lit) else k
                cols.append(F.expr(b._elem_sql(v)).alias(name))
                fields[name] = (name, b._leaf_elem_shape(v))
            df = flat.select(*cols)
            shape = Shape("rows", child=Shape("struct", fields=fields))
        else:
            sql = b._elem_sql(elem)
            _, alias = (
                b._scalar_sql(elem) if isinstance(elem, (Var, str)) else (None, None)
            )
            df = flat.select(F.expr(sql).alias(alias or "value"))
            shape = Shape("rows", child=Shape("scalar"), col=alias or "value")
        if isinstance(node, SetOf):
            df = df.distinct()
            shape.kind = "rowset"
        return df, shape

    # top-level grouping dict → keyed DataFrame
    if isinstance(node, dict) and not _is_struct_dict(node):
        if len(node) != 1:
            raise FaconneError("grouping dicts must have exactly one entry")
        (k, sub), = node.items()
        ksql, kname = b._key_info(k)
        b._ensure_col(kname, ksql)
        if isinstance(sub, dict) and _is_struct_dict(sub):
            joined, fields, shape = b._build_struct(sub, [kname], splay=True)
            out = joined.select(
                kname, *[F.col(col).alias(fname) for fname, col, _ in fields]
            )
            shape = Shape(
                "group", key=kname,
                child=Shape("struct", fields={f: (f, s) for f, (c, s) in shape.fields.items()}),
            )
            return out, shape
        df, cshape = b.build_nested(sub, [kname])
        vname = _value_name(sub)
        out = df.withColumnRenamed("__v", vname)
        return out, Shape("group", key=kname, child=cshape, col=vname)

    # top-level struct dict (no grouping): single-row result
    if isinstance(node, dict):
        joined, fields, shape = b._build_struct(node, [], splay=True)
        out = joined.select(*[F.col(col).alias(fname) for fname, col, _ in fields])
        return out, Shape(
            "struct",
            fields={f: (f, s) for f, (c, s) in shape.fields.items()},
        )

    # top-level scalar / Agg: global aggregate, single row
    if isinstance(node, (Agg, Var, str)):
        sql = node.sql if isinstance(node, Agg) else None
        if isinstance(node, Agg):
            alias = node.alias or "value"
            df = flat.groupBy().agg(F.expr(node.sql_for(flat)).alias(alias))
        else:
            s, alias = b._scalar_sql(node)
            alias = alias or "value"
            df = flat.groupBy().agg(F.expr(f"any_value({s})").alias(alias))
        return df, Shape("scalar", col=alias)

    raise FaconneError(f"unsupported top-level range: {node!r}")


def _value_name(sub) -> str:
    if isinstance(sub, Agg):
        if sub.alias:
            return sub.alias
        _, alias = split_alias(sub.sql)
        if alias:
            return alias
    if isinstance(sub, Var):
        return sub.name
    if isinstance(sub, str):
        _, alias = split_alias(sub)
        if alias:
            return alias
        bare = sub.strip()
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", bare):
            return bare
    return "value"
