"""Wide↔long reshaping: unpivot (melt), the inverse of the pivot the
analytics layer already does.

``unpivot`` turns N value columns into N rows of (variable, value) per
input row — pure projection + generator, zero shuffle, output = input ×
N rows by construction (plan for the fan-out, not the operator). Values
are cast to a common type up front because a long table has one value
column; mixed incompatible types are a caller error surfaced eagerly,
not silently coerced.

Reference parity note: the reference's dashboard melts quality-log
columns pandas-style for plotting (interactive_dashboard.py value_counts
loops); this is the engine-level operator behind that reshape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    *,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    value_type: str = "double",
) -> DataFrame:
    """(id_cols..., var_name, value_name): one output row per (input
    row, value column). NULL values are KEPT (a melted null is still an
    observation — filter after if not)."""
    if not value_cols:
        raise ValueError("unpivot needs at least one value column")
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias(var_name),
                F.col(c).cast(value_type).alias(value_name),
            )
            for c in value_cols
        ]
    )
    return df.select(*id_cols, F.explode(pairs).alias("_kv")).select(
        *id_cols, f"_kv.{var_name}", f"_kv.{value_name}"
    )
