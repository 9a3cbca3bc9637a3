"""Privacy-audit operators: k-anonymity and l-diversity checks over
quasi-identifier groupings.

A training-data pipeline that joins user-derived tables needs to KNOW
when a projection is re-identifying: k-anonymity (Sweeney 2002) asks
whether every quasi-identifier (QI) combination is shared by at least k
rows; l-diversity (Machanavajjhala et al. 2007) additionally asks
whether each QI group carries at least l distinct values of a sensitive
attribute (a k-anonymous group that is 100% one diagnosis still leaks).

The reference pipeline has no privacy surface (its coin-market rows are
public data; dags/coin_data_pipeline_optimized.py); these are engine
extensions for the curation use case, like the dedup family.

Scale shape: both checks are ONE partial-aggregatable groupBy over the
QI columns (count / count-distinct collapse map-side), then either a
filter (violating groups) or a second 1-row rollup (the report). No
windows, no row-scale shuffles beyond the single hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(df: DataFrame, quasi_cols: list[str | Column], k: int) -> DataFrame:
    """1-row audit report: total QI groups, groups with fewer than k
    rows, rows at re-identification risk (rows inside violating
    groups), the risk fraction, and the minimum group size (the
    dataset's actual anonymity level)."""
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("grp_n"))
    viol = F.col("grp_n") < k
    return groups.agg(
        F.lit(k).cast("int").alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(viol.cast("bigint")).alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("grp_n")).otherwise(0)).alias("n_rows_at_risk"),
        (
            F.sum(F.when(viol, F.col("grp_n")).otherwise(0)).cast("double")
            / F.sum("grp_n").cast("double")
        ).alias("risk_frac"),
        F.min("grp_n").alias("min_group_size"),
    )


def l_diversity_violations(
    df: DataFrame,
    quasi_cols: list[str | Column],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """QI groups whose sensitive attribute takes fewer than l distinct
    values — each output row is a group an attacker can map to a
    narrow sensitive set. Exact count-distinct per group (one hash
    aggregate; the sensitive domain per group is bounded by the
    attribute's cardinality, so map-side partials stay small)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("grp_n"),
            F.countDistinct(sensitive_col).alias("l_distinct"),
        )
        .where(F.col("l_distinct") < l)
    )
