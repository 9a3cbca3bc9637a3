"""airflow_crypto_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference `lokesh-98/airflow-crypto-etl` repo (a pandas-on-Airflow
medallion ETL), generalized into a reusable engine:

- ``session``    — SparkSession factory tuned for local[N] and cluster use
- ``sources``    — readers (parquet/csv/json/jdbc/rest) with pushdown-friendly shapes
- ``sinks``      — writers (partitioned parquet, metadata sidecars, jdbc upserts)
- ``operators``  — transform / aggregate / join / window / dedup / similarity /
                   text / multimodal operator library (DataFrame-in, DataFrame-out)
- ``functions``  — column-expression helpers (vector math, deterministic hashing)
- ``checks``     — declarative data-quality expectations (Great-Expectations-shaped)
- ``plans``      — the medallion bronze→silver→gold pipeline as Spark jobs
- ``streaming``  — Structured Streaming variants (tumbling/sliding/session windows)

Design stance (see SURVEY.md §7): DataFrame-first, let Catalyst optimize;
UDFs only where built-ins cannot express the semantics, and then always
Arrow-vectorized. Every operator is written so its physical plan survives a
1000-executor / 100 TB scale-up: broadcast the small side, shuffle only on
declared keys, keep expressions inside whole-stage codegen.
"""

__version__ = "0.1.0"
