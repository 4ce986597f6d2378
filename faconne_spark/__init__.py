"""faconne_spark — a PySpark-native declarative data-transformation engine.

Re-expresses the capabilities of the faconne nested-collection
transformation DSL (reference: turtlegrammar/faconne,
``src/faconne/core.cljc``) on top of Spark DataFrames: the *domain*
pattern flattens nested rows into a relation of bound variables, the
*range* pattern rebuilds the target shape with grouping/aggregation,
``where`` filters are pushed to the earliest frame (and further down by
Catalyst). Everything compiles to Catalyst expressions — no
row-at-a-time Python UDFs on hot paths.
"""

from faconne_spark.dsl.ast import (
    V, Var, Wild, Lit, Agg, PyAgg, SetOf, Keys, As, K,
    Struct, Count, CountDistinct, Sum, Avg, Min, Max, Round,
)
from faconne_spark.dsl.compiler import Iterator, Transformer, transform, for_each
from faconne_spark.dsl.pyobj import to_df, collect_nested
from faconne_spark.errors import FaconneError
from faconne_spark.session import get_session

__all__ = [
    "V", "Var", "Wild", "Lit", "Agg", "PyAgg", "SetOf", "Keys", "As", "K", "FaconneError",
    "Struct", "Count", "CountDistinct", "Sum", "Avg", "Min", "Max", "Round",
    "Iterator", "Transformer", "transform", "for_each",
    "to_df", "collect_nested",
    "get_session",
]
