"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference NYC-taxi big-data pipeline
(AhmedMaaouia1/nyc-taxi-bigdata-pipeline), re-expressed Spark-first.

Layers (see SURVEY.md §7.1):

- ``session``     SparkSession factory (AQE, dynamic partition overwrite, UTC)
- ``sources``     parquet/csv readers, partition-aware IO, testdata loaders
- ``functions``   cross-engine-deterministic expression helpers, datetime parity
- ``operators``   dedup / similarity / text / upsert / top-k operators
- ``ingest``      bronze→silver cleaning (ex02 parity)
- ``warehouse``   silver→gold star schema (ex03 parity)
- ``analytics``   dashboard/EDA queries (ex04 parity)
- ``quality``     retention/rowcount/profile gates (ex06 parity)
- ``ml``          feature eng, GBT pipeline, registry, error analysis (ex05 parity)
- ``streaming``   Structured Streaming over the events table (extension)
- ``benchqueries``the oracle-checked query registry driving __spark_entry__.py
"""

__version__ = "0.1.0"
