"""data_bridge_spark — a PySpark-native analytics / ETL engine.

A ground-up rebuild of the capabilities of the reference ETL framework
(`thomaslesperance/data_bridge`): parameterized relational queries, a
dataflow DAG of named steps, pluggable sources/sinks, and delivery of
results — re-expressed as lazy Spark DataFrame plans so Catalyst/Tungsten
(not a single pandas process) execute it, and extended with the
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) the reference lacks.

Layout:
    session     SparkSession factory tuned for deterministic local runs
    catalog     lazy loaders for the test parquet tables
    functions/  scalar/vector helpers (exact decimal aggs, templating, macros)
    operators/  first-class relational + extension operators (SURVEY.md §2)
    sources/    readers: parquet/csv/json/jdbc + remote (sftp/smb) transports
    sinks/      writers: csv/parquet/fileshare/sftp/smtp with DestinationResponse
    plans/      config models, YAML loader, DAG validation, lazy step runner
    streaming/  Structured Streaming variants of the window operators
    registry    the query registry driving __spark_entry__.py and the oracle
"""

__version__ = "0.1.0"
