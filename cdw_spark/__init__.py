"""cdw_spark — a PySpark-native analytics engine with the capabilities of
adrianva/3_Cloud_Data_Warehouse (the Udacity "Cloud Data Warehouse" Sparkify
ELT project), re-expressed Spark-first.

The reference (/root/reference) is a *client* of Redshift: all of its query
semantics live in SQL strings (sql_queries.py) executed remotely. This package
IS the engine: every operator the reference delegates to Redshift — bulk JSON
load, star-schema transforms, multi-key equi-joins, DISTINCT, scalar time
functions — is provided natively on Spark DataFrames/SQL, plus the
large-scale-pipeline layer (dedup, similarity search, text analysis,
multimodal plumbing, streaming) required at 100 TB scale.

Package layout (mirrors SURVEY.md §7):
  session     — SparkSession factory (UTC, AQE, tuned shuffle partitions)
  schemas     — explicit StructTypes for all reference + fixture tables
  catalog     — table registration / create / drop / reset
  sources/    — JSON (JSONPaths-style + auto-mapped) and Parquet readers
  pipeline/   — the Sparkify star-schema ELT recreated faithfully (quirks K1-K7)
  operators/  — joins, dedup (exact/minhash/simhash/jaccard), similarity, asof
  functions/  — time parts, text metrics, vector math (all JVM-side)
  plans/      — physical layout (DISTKEY/SORTKEY analogues), explain helpers
  streaming/  — Structured Streaming over the events table

NOTE: the working title "3_cloud_data_warehouse_spark" is not a legal Python
package name (leading digit), hence ``cdw_spark``.
"""

__version__ = "0.1.0"
