"""Closed-form distributed linear models from Gram-matrix sums.

Ridge regression and a one-step Newton logistic fit, computed the only
way that makes sense at 100 TB: the data pass is ONE partial-aggregated
shuffle producing the sufficient statistics (the Gram matrix XᵀX and
moment vector Xᵀy as exact DECIMAL sums — order-insensitive, so any
shuffle/merge order yields bit-identical sums), and the solve is a
closed-form 3×3 Cramer epilogue over those scalars. Post-shuffle state
is O(#groups × 10 sums); nothing about the plan changes between 60 k
rows and 10¹¹ rows.

Engine-portability discipline: the epilogue is generated ONCE as SQL
expression strings (`det3`, `ridge_beta_sql`, `newton_beta_sql`) and
used verbatim on BOTH sides — Spark applies them with ``F.expr`` over
an aggregate frame whose columns carry the same names the strings
reference, and the DuckDB oracle embeds the same strings — so the two
engines evaluate the *same IEEE-double expression tree* and agree
bit-for-bit (same discipline as queries_market's pinned epilogues).

Provenance: engine extension (the reference has no model fitting; its
closest surface is the pandas groupby means in
/root/reference/dags/coin_data_pipeline_optimized.py's Gold rollups).
Normal-equation ridge and IRLS/Newton are textbook (Hastie et al., ESL
§3.4, §4.4); the contribution here is the exact-decimal partial-agg
formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "gram_aggregate",
    "det3",
    "ridge_beta_sql",
    "newton_beta_sql",
    "r2_sql",
    "GRAM_SUMS_SQL",
]

# Sufficient statistics for a 2-feature model with intercept.
# Sums are DECIMAL (exact, merge-order-free); the *_d names are the
# one-time double casts the epilogue strings reference.
_SUM_COLS = ["sx1", "sx2", "sy", "sx11", "sx12", "sx22", "sx1y", "sx2y", "syy"]


def gram_aggregate(
    df: DataFrame, group_cols: list[str], x1: Column, x2: Column, y: Column
) -> DataFrame:
    """One partial-agg pass → per-group Gram/moment sums, cast to double.

    ``x1``/``x2``/``y`` must already be DECIMAL columns (exact products
    and sums; decimal(18,4) inputs keep every product within
    decimal(38,8) for trillions of rows of TPC-H-ranged values).
    Output columns: the group cols, ``n`` (bigint) and ``<sum>_d``
    doubles named exactly as the epilogue SQL strings expect."""
    base = df.select(
        *group_cols, x1.alias("_x1"), x2.alias("_x2"), y.alias("_y")
    )
    g = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x1").alias("sx1"),
        F.sum("_x2").alias("sx2"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x1") * F.col("_x1")).alias("sx11"),
        F.sum(F.col("_x1") * F.col("_x2")).alias("sx12"),
        F.sum(F.col("_x2") * F.col("_x2")).alias("sx22"),
        F.sum(F.col("_x1") * F.col("_y")).alias("sx1y"),
        F.sum(F.col("_x2") * F.col("_y")).alias("sx2y"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    casts = [F.col("n").cast("double").alias("n_d")] + [
        F.col(c).cast("double").alias(f"{c}_d") for c in _SUM_COLS
    ]
    return g.select(*group_cols, "n", *casts)


def gram_sums_sql(from_clause: str, x1: str, x2: str, y: str, group: str = "") -> str:
    """DuckDB twin of :func:`gram_aggregate`: same sums, same *_d names.

    ``x1``/``x2``/``y`` are SQL expressions that must yield DECIMALs of
    the same scale the Spark side used. ``group`` is an optional
    comma-led group column list (e.g. ``"l_returnflag,"``). The inner
    select re-casts to width 19 so DuckDB computes the products in
    int128 — a DECIMAL(18) operand multiplies in int64 and overflows on
    TPC-H price magnitudes (same workaround as the realized-vol
    oracle); the widening changes no value."""
    gcols = group.rstrip(",")
    sel_group = f"{gcols}, " if gcols else ""
    group_by = f"GROUP BY {gcols}" if gcols else ""
    x1, x2, y = (f"CAST({e} AS DECIMAL(19,4))" for e in (x1, x2, y))
    return f"""
SELECT {sel_group}CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) AS DOUBLE) AS n_d,
       CAST(sum(_x1) AS DOUBLE) AS sx1_d,
       CAST(sum(_x2) AS DOUBLE) AS sx2_d,
       CAST(sum(_y)  AS DOUBLE) AS sy_d,
       CAST(sum(_x1 * _x1) AS DOUBLE) AS sx11_d,
       CAST(sum(_x1 * _x2) AS DOUBLE) AS sx12_d,
       CAST(sum(_x2 * _x2) AS DOUBLE) AS sx22_d,
       CAST(sum(_x1 * _y) AS DOUBLE) AS sx1y_d,
       CAST(sum(_x2 * _y) AS DOUBLE) AS sx2y_d,
       CAST(sum(_y * _y)  AS DOUBLE) AS syy_d
FROM (SELECT {sel_group}{x1} AS _x1, {x2} AS _x2, {y} AS _y {from_clause})
{group_by}
"""


GRAM_SUMS_SQL = gram_sums_sql  # back-compat alias for callers/docs


def det3(m: list[list[str]]) -> str:
    """3×3 determinant as a fully-parenthesized SQL string — cofactor
    expansion along the first row, one fixed expression shape."""
    a, b, c = m[0]
    d, e, f_, g, h, i = m[1][0], m[1][1], m[1][2], m[2][0], m[2][1], m[2][2]
    return (
        f"(({a})*((({e})*({i}))-(({f_})*({h})))"
        f" - ({b})*((({d})*({i}))-(({f_})*({g})))"
        f" + ({c})*((({d})*({h}))-(({e})*({g}))))"
    )


def _cramer(A: list[list[str]], bvec: list[str]) -> list[str]:
    """β_i = det(A with column i replaced by b) / det(A)."""
    det_a = det3(A)
    betas = []
    for i in range(3):
        Ai = [[bvec[r] if c == i else A[r][c] for c in range(3)] for r in range(3)]
        betas.append(f"({det3(Ai)} / {det_a})")
    return betas


def ridge_beta_sql(lam: float) -> list[str]:
    """[b0, b1, b2] expression strings for ridge with UNPENALIZED
    intercept: solve (XᵀX + λ·diag(0,1,1)) β = Xᵀy over the *_d sums."""
    A = [
        ["n_d", "sx1_d", "sx2_d"],
        ["sx1_d", f"(sx11_d + {lam!r})", "sx12_d"],
        ["sx2_d", "sx12_d", f"(sx22_d + {lam!r})"],
    ]
    return _cramer(A, ["sy_d", "sx1y_d", "sx2y_d"])


def newton_beta_sql(lam: float) -> list[str]:
    """One Newton step for logistic regression from β = 0.

    At β=0 every fitted probability is ½, so the gradient is
    Xᵀ(y − ½) and the Hessian is ¼·XᵀX; with an L2 term the step is
    (¼·XᵀX + λI)⁻¹ Xᵀ(y − ½). The same Gram sums serve, with y fed in
    as the exact decimal (y − 0.5) = ±0.5 — so ``sy_d``/``sx1y_d``/
    ``sx2y_d`` already ARE the gradient components and only the
    quadratic sums need the ¼ scale."""
    A = [
        [f"(0.25*n_d + {lam!r})", "(0.25*sx1_d)", "(0.25*sx2_d)"],
        ["(0.25*sx1_d)", f"(0.25*sx11_d + {lam!r})", "(0.25*sx12_d)"],
        ["(0.25*sx2_d)", "(0.25*sx12_d)", f"(0.25*sx22_d + {lam!r})"],
    ]
    return _cramer(A, ["sy_d", "sx1y_d", "sx2y_d"])


def r2_sql() -> str:
    """R² from the sums plus already-computed b0/b1/b2 columns:
    SSE = Σy² − 2βᵀXᵀy + βᵀXᵀXβ, SST = Σy² − (Σy)²/n. References the
    column names ``b0, b1, b2`` so both engines evaluate the betas once
    (a layered select / CTE), not inline-expanded Cramer trees."""
    sse = (
        "(syy_d - 2.0*((b0*sy_d) + (b1*sx1y_d) + (b2*sx2y_d))"
        " + ((b0*b0*n_d) + (b1*b1*sx11_d) + (b2*b2*sx22_d)"
        " + 2.0*((b0*b1*sx1_d) + (b0*b2*sx2_d) + (b1*b2*sx12_d))))"
    )
    sst = "(syy_d - ((sy_d*sy_d) / n_d))"
    return f"(1.0 - ({sse} / {sst}))"
