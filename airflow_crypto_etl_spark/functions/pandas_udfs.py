"""Arrow-vectorized Python surface (SURVEY.md §2.11).

The reference has no UDFs — all its logic is built-in pandas calls
inside Airflow tasks. The engine's rule (README): built-in JVM
expressions first; when Python is genuinely needed (library calls,
imperative per-group logic), it enters ONLY through the Arrow-batched
forms below — scalar ``pandas_udf`` (SIMD-friendly columnar batches),
``applyInPandas`` (grouped map), and grouped-agg ``pandas_udf`` — never
row-at-a-time ``udf``.

Everything here is deterministic (string ops / IEEE arithmetic on
fixed operands), so the DuckDB oracles reproduce results exactly —
which is the point: the Arrow boundary must not change semantics.

Scale notes: scalar UDFs stream batch-by-batch (no per-row Python
overhead, ~10-100× over row UDFs); grouped map materializes ONE GROUP
per worker in pandas — group cardinality must bound memory (fine for
per-key feature frames; wrong for a 3-group 100 TB fact unless the
group count is raised first, e.g. by salting the key).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """Vectorized text normalization: lowercase, strip non-alphanumeric
    (keep spaces), collapse whitespace runs, trim. The classic
    pre-tokenization cleanup for a training corpus."""
    out = s.str.lower()
    out = out.str.replace(r"[^a-z0-9 ]", " ", regex=True)
    out = out.str.replace(r" +", " ", regex=True)
    return out.str.strip()


@F.pandas_udf(T.IntegerType())
def ascii_token_count(s: pd.Series) -> pd.Series:
    """Vectorized whitespace token count (matches split-on-spaces)."""
    return s.str.split().str.len().fillna(0).astype("int32")


def minmax_scale_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: min-max scale ``l_quantity`` within the
    group. Degenerate (constant) groups scale to 0.0."""
    lo, hi = pdf["l_quantity"].min(), pdf["l_quantity"].max()
    span = hi - lo
    scaled = (pdf["l_quantity"] - lo) / span if span > 0 else pdf["l_quantity"] * 0.0
    return pd.DataFrame(
        {
            "l_orderkey": pdf["l_orderkey"],
            "l_linenumber": pdf["l_linenumber"],
            "l_returnflag": pdf["l_returnflag"],
            "qty_scaled": scaled.round(4),
        }
    )


MINMAX_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("qty_scaled", T.DoubleType()),
    ]
)


@F.pandas_udf(T.LongType())
def count_price_increases(date: pd.Series, key: pd.Series, price: pd.Series) -> int:
    """Grouped-agg kernel with ORDER-DEPENDENT semantics: number of
    strictly-increasing consecutive price steps when the group's rows
    are ordered by (date, key). The pandas sort makes the order
    explicit inside the kernel — grouped-agg input order is otherwise
    partition-dependent."""
    df = pd.DataFrame({"d": date, "k": key, "p": price}).sort_values(["d", "k"])
    return int((df["p"].diff() > 0).sum())
