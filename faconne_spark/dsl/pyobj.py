"""Nested-Python-literal ⇄ DataFrame bridge.

Only for small data: parity tests against the reference's outputs and
driver-side convenience. The scalable path is DataFrames end-to-end;
``collect_nested`` is the explicit escape hatch that materialises a
transform result as the literal nested object the reference would
return.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

from faconne_spark.dsl.compiler import shape_of
from faconne_spark.dsl.range_ import Shape
from faconne_spark.errors import FaconneError


def to_df(
    obj, spark: SparkSession | None = None, schema=None, domain=None
) -> DataFrame:
    """Convert a nested Python literal to a DataFrame.

    * list of dicts  → rows (the scalable shape; like JDBC resultsets in
      the reference's motivating examples, demo.clj:45-54)
    * any other list/set → single row, one ``__root`` array column
    * dict           → single row, one ``__root`` map column

    ``domain`` (the transform's domain pattern, when available) types
    branches that are EMPTY in the data: ``{"a": {}}`` under domain
    ``{store: {aisle: [product]}}`` must give the inner value type
    map<·, array<·>> even though no element exists to sample — the
    reference's runtime traversal trivially yields nothing there, but a
    DataFrame needs the shape in the schema up front.
    """
    if spark is None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            from faconne_spark.session import get_session

            spark = get_session()
    if (
        isinstance(obj, list)
        and obj
        and all(isinstance(r, dict) for r in obj)
        # dicts with non-string keys are data maps, not records — they
        # take the __root array-of-maps path below (core.clj:113-115
        # vectors of dynamic-keyed maps)
        and all(isinstance(k, str) for r in obj for k in r)
    ):
        if schema is not None:
            return spark.createDataFrame(obj, schema=schema)
        # rows: nested dicts are fixed-field records → infer as structs
        # (MapType would coerce mixed value types to string). The
        # single-__root path below keeps dict→MapType for dynamic keys.
        key = "spark.sql.pyspark.inferNestedDictAsStruct.enabled"
        old = spark.conf.get(key, "false")
        spark.conf.set(key, "true")
        try:
            return spark.createDataFrame(obj)
        except Exception:
            # native sampler chokes on empty containers → infer ourselves,
            # letting the domain pattern type the empty branches
            elem_pat = (
                domain[0]
                if isinstance(domain, list) and len(domain) == 1
                else None
            )
            field_pats = {}
            if isinstance(elem_pat, dict):
                from faconne_spark.dsl.ast import Lit

                for k, v in elem_pat.items():
                    if isinstance(k, str):
                        field_pats[k] = v
                    elif isinstance(k, Lit):
                        field_pats[k.value] = v
            cols = []
            for r in obj:
                for c in r:
                    if c not in cols:
                        cols.append(c)
            fields = []
            for c in cols:
                t = _unify(_infer_type(_norm(r.get(c))) for r in obj)
                t = _concrete(_overlay(t, field_pats.get(c)))
                fields.append(T.StructField(c, t))
            return spark.createDataFrame(
                [_norm(r) for r in obj], schema=T.StructType(fields)
            )
        finally:
            spark.conf.set(key, old)
    if isinstance(obj, (list, set, frozenset, dict)):
        data = [{"__root": _norm(obj)}]
        if schema is None:
            # infer ourselves: Spark's sampler fails on empty containers
            # ([] / {}), whose element type the domain pattern supplies.
            t = _concrete(_overlay(_infer_type(_norm(obj)), domain))
            schema = T.StructType([T.StructField("__root", t)])
        return spark.createDataFrame(data, schema=schema)
    raise FaconneError(f"cannot convert {type(obj)} to DataFrame")


def _infer_type(x):
    """``T.NullType()`` marks positions whose type no element witnesses
    (empty containers / all-null); ``_overlay`` may fill them from the
    domain pattern and ``_concrete`` resolves the rest."""
    if x is None:
        return None
    if isinstance(x, bool):
        return T.BooleanType()
    if isinstance(x, int):
        return T.LongType()
    if isinstance(x, float):
        return T.DoubleType()
    if isinstance(x, str):
        return T.StringType()
    if isinstance(x, bytes):
        return T.BinaryType()
    if isinstance(x, (list, tuple, set, frozenset)):
        return T.ArrayType(_unify(_infer_type(v) for v in x) or T.NullType())
    if isinstance(x, dict):
        return T.MapType(
            _unify(_infer_type(k) for k in x) or T.NullType(),
            _unify(_infer_type(v) for v in x.values()) or T.NullType(),
        )
    raise FaconneError(f"cannot infer Spark type for {type(x)}")


def _unify(types):
    out = None
    for t in types:
        if t is None or isinstance(t, T.NullType):
            continue
        if out is None or isinstance(out, T.NullType) or out == t:
            out = t
        elif {out.__class__, t.__class__} == {T.LongType, T.DoubleType}:
            out = T.DoubleType()
        elif isinstance(out, T.ArrayType) and isinstance(t, T.ArrayType):
            out = T.ArrayType(
                _unify([out.elementType, t.elementType]) or T.NullType()
            )
        elif isinstance(out, T.MapType) and isinstance(t, T.MapType):
            out = T.MapType(
                _unify([out.keyType, t.keyType]) or T.NullType(),
                _unify([out.valueType, t.valueType]) or T.NullType(),
            )
        else:
            out = T.StringType()  # mixed scalars: stringly-typed fallback
    return out


def _overlay(t, pat):
    """Fill ``NullType`` positions of an inferred type with the container
    structure the domain pattern implies there. Leaf types stay unknown
    (the branch is empty — any concrete type yields the same empty
    result); only the SHAPE (map/array nesting) matters so the binder's
    explodes type-check."""
    from faconne_spark.dsl.ast import Lit, SetOf, Var

    if pat is None:
        return t
    unknown = t is None or isinstance(t, T.NullType)
    if isinstance(pat, SetOf):
        pat = list(pat.elems)
    if isinstance(pat, (list, tuple)) and pat:
        if unknown:
            t = T.ArrayType(T.NullType())
        if isinstance(t, T.ArrayType):
            elem = t.elementType
            for p in pat:  # n-at-a-time chunk patterns share the element type
                elem = _overlay(elem, p)
            return T.ArrayType(elem)
        return t
    if isinstance(pat, dict):
        traversal = {
            k: v
            for k, v in pat.items()
            if isinstance(k, (Var, Lit, str, tuple))  # not Keys/As destructure
        }
        if not traversal:
            return t  # Keys/As destructuring: node shape comes from data
        if unknown:
            t = T.MapType(T.NullType(), T.NullType())
        if isinstance(t, T.MapType):
            vt = t.valueType
            for _, vpat in traversal.items():
                vt = _overlay(vt, vpat)
            return T.MapType(t.keyType, vt)
        if isinstance(t, T.StructType):
            fields = []
            for f in t.fields:
                sub = None
                for k, vpat in traversal.items():
                    key = k.value if isinstance(k, Lit) else k
                    if key == f.name:
                        sub = vpat
                fields.append(
                    T.StructField(f.name, _overlay(f.dataType, sub), f.nullable)
                )
            return T.StructType(fields)
        return t
    return t


def _concrete(t, key_pos: bool = False):
    """Resolve remaining unknowns: LongType for values (any type works —
    the branch holds no data), StringType in map-key position."""
    if t is None or isinstance(t, T.NullType):
        return T.StringType() if key_pos else T.LongType()
    if isinstance(t, T.ArrayType):
        return T.ArrayType(_concrete(t.elementType))
    if isinstance(t, T.MapType):
        return T.MapType(
            _concrete(t.keyType, key_pos=True), _concrete(t.valueType)
        )
    if isinstance(t, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _concrete(f.dataType), f.nullable)
                for f in t.fields
            ]
        )
    return t


def _norm(x):
    """Sets → lists (Spark has no set literal type)."""
    if isinstance(x, (set, frozenset)):
        return sorted((_norm(v) for v in x), key=repr)
    if isinstance(x, dict):
        return {k: _norm(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_norm(v) for v in x]
    return x


def collect_nested(df: DataFrame, shape: Shape | None = None):
    """Materialise a transform result as the literal nested Python object
    (reference semantics: what ``f/transform`` returns). Driver-side —
    use only on small results."""
    shape = shape or shape_of(df)
    rows = [r.asDict(recursive=True) for r in df.collect()]
    return _assemble_top(rows, shape)


def _assemble_top(rows, shape: Shape):
    if shape.kind == "group":
        out = {}
        for r in rows:
            out[r[shape.key]] = _assemble_row_child(r, shape)
        return out
    if shape.kind in ("rows", "rowset"):
        child = shape.child
        if child.kind == "struct":
            vals = [
                {f: _convert(r[col], s) for f, (col, s) in child.fields.items()}
                for r in rows
            ]
        else:
            vals = [_convert(r[shape.col], child) for r in rows]
        if shape.kind == "rowset":
            return _to_hashable_set(vals)
        return vals
    if shape.kind == "struct":
        (r,) = rows or [{}]
        return {f: _convert(r.get(col), s) for f, (col, s) in shape.fields.items()}
    if shape.kind == "scalar":
        if not rows:
            return None
        (r,) = rows
        return r[shape.col]
    raise FaconneError(f"cannot assemble shape {shape.kind}")


def _assemble_row_child(r, shape: Shape):
    child = shape.child
    if child.kind == "struct" and shape.col is None:
        return {
            f: _convert(r[col if col else f], s)
            for f, (col, s) in child.fields.items()
        }
    return _convert(r[shape.col or "__v"], child)


def _convert(val, shape: Shape):
    if val is None:
        return None
    if shape is None or shape.kind == "scalar":
        return val
    if shape.kind == "group":
        return {k: _convert(v, shape.child) for k, v in val.items()}
    if shape.kind == "list":
        return [_convert(v, shape.child) for v in val]
    if shape.kind == "set":
        return _to_hashable_set([_convert(v, shape.child) for v in val])
    if shape.kind == "struct":
        return {f: _convert(val.get(f), s) for f, (_, s) in shape.fields.items()}
    raise FaconneError(f"cannot convert shape {shape.kind}")


def _to_hashable_set(vals):
    def h(v):
        if isinstance(v, list):
            return tuple(h(x) for x in v)
        if isinstance(v, set):
            return frozenset(h(x) for x in v)
        if isinstance(v, dict):
            return frozenset((k, h(x)) for k, x in v.items())
        return v

    return {h(v) for v in vals}
