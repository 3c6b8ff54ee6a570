"""cs686_big_data_p1_spark — a PySpark-native analytics engine.

Re-expresses every data-processing capability of the reference DFS
(tiktaktok/cs686-big-data-p1, a GFS-style distributed file system) as
Spark DataFrame / SQL / Structured Streaming computations, plus the
LLM-data-pipeline extensions (dedup, similarity search, text and
multimodal analysis) required for large-scale training-data work.

Layout:
  session.py    SparkSession factory (AQE on, UTC, tuned local defaults)
  tables.py     base fixture tables with explicit schemas
  views.py      derived DFS-domain views (chunks/replicas/heartbeats/...)
                with a matching DuckDB CTE prelude for oracle checks
  registry.py   query registry: name -> (spark, sf_dir) -> DataFrame
                plus name -> ANSI SQL oracle
  functions/    scalar expression layer (checksums, chunk math, ...)
  operators/    relational operators (DFS metadata, analytics, LLM ops)
  sources/      ingest paths (binary chunking, recovery scans)
  streaming/    Structured Streaming recasts of the control loops
  plans/        explain/plan-inspection helpers
"""

__version__ = "0.1.0"
