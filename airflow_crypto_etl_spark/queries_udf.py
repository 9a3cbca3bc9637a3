"""Oracle-checked queries for the Arrow-vectorized Python surface
(functions.pandas_udfs). Each has an exact SQL twin: the Arrow
boundary must be semantics-preserving, and these queries prove it on
real data — scalar batch UDF, grouped map (applyInPandas), and
grouped aggregate with order-dependent logic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import pandas_udfs as pu
from .queries import _t


def q_pandas_udf_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: corpus text normalization + token count,
    computed in Arrow batches."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        pu.normalize_text(F.col("text")).alias("clean"),
        pu.ascii_token_count(F.col("text")).alias("n_tokens"),
    )


ORACLE_PANDAS_UDF_CLEAN = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +', ' ', 'g')) AS clean,
       CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INTEGER) AS n_tokens
FROM documents WHERE doc_id < 200
"""


def q_applyinpandas_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped map (applyInPandas): per-returnflag min-max scaling of
    quantity — the per-group feature-engineering shape. The oracle is
    the window form of the same arithmetic."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return (
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(pu.minmax_scale_group, schema=pu.MINMAX_SCHEMA)
    )


ORACLE_APPLYINPANDAS_SCALE = """
SELECT l_orderkey, l_linenumber, l_returnflag,
       round(CASE WHEN max(l_quantity) OVER w > min(l_quantity) OVER w
                  THEN (l_quantity - min(l_quantity) OVER w)
                       / (max(l_quantity) OVER w - min(l_quantity) OVER w)
                  ELSE 0.0 END, 4) AS qty_scaled
FROM lineitem
WHERE l_orderkey < 2000
WINDOW w AS (PARTITION BY l_returnflag)
"""


def q_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf with order-dependent logic: per customer,
    how many consecutive order-price increases (time-ordered). The SQL
    twin is lag()+sum over the same explicit ordering."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    return o.groupBy("o_custkey").agg(
        pu.count_price_increases(
            F.to_date("o_orderdate"), F.col("o_orderkey"), F.col("o_totalprice")
        ).alias("n_increases")
    )


ORACLE_PANDAS_GROUPED_AGG = """
WITH stepped AS (
  SELECT o_custkey,
         o_totalprice > lag(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC) AS up
  FROM orders WHERE o_custkey < 300)
SELECT o_custkey,
       CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n_increases
FROM stepped GROUP BY o_custkey
"""


QUERIES_UDF = {
    "q_pandas_udf_clean": q_pandas_udf_clean,
    "q_applyinpandas_scale": q_applyinpandas_scale,
    "q_pandas_grouped_agg": q_pandas_grouped_agg,
}

ORACLE_UDF = {
    "q_pandas_udf_clean": ORACLE_PANDAS_UDF_CLEAN,
    "q_applyinpandas_scale": ORACLE_APPLYINPANDAS_SCALE,
    "q_pandas_grouped_agg": ORACLE_PANDAS_GROUPED_AGG,
}


def q_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: per-document word bigrams with
    positions (the generator/table-function surface)."""
    from .functions.udtfs import WordNGrams

    spark.udtf.register("word_ngrams", WordNGrams)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("docs_udtf")
    return spark.sql(
        "SELECT doc_id, t.pos, t.ngram FROM docs_udtf, LATERAL word_ngrams(text, 2) t"
    )


ORACLE_UDTF_NGRAMS = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 50),
ex AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> {'pos': i - 1, 'ngram': toks[i] || ' ' || toks[i+1]})) AS e
  FROM t)
SELECT doc_id, CAST(e.pos AS INTEGER) AS pos, e.ngram AS ngram FROM ex
"""

QUERIES_UDF["q_udtf_ngrams"] = q_udtf_ngrams
ORACLE_UDF["q_udtf_ngrams"] = ORACLE_UDTF_NGRAMS
