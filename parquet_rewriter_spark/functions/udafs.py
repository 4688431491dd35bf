"""Arrow-batched Pandas UDF/UDAF definitions.

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf resolves real type annotations to infer the UDF kind
(grouped-agg vs scalar), and stringified annotations defeat it.

UDFs are the slow path (SURVEY.md §2.2): each of these exists as a demo
of the Python escape hatch; where a built-in expression computes the
same thing, the catalog documents the built-in as the production form.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-agg UDAF: sum(value*weight)/sum(weight) per group."""
    return float((value * weight).sum() / weight.sum())


@pandas_udf("double")
def scalar_clip01(x: pd.Series) -> pd.Series:
    """Scalar Pandas UDF (Series→Series): clamp into [0, 1]."""
    return x.clip(0.0, 1.0)
