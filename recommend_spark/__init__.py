"""recommend_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic-PySpark engine providing the query and
data-processing capabilities of the reference system (``marklit/recommend``,
see SURVEY.md) plus LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Architecture: every operator is declared as a Catalyst logical plan via the
DataFrame API (never RDDs), so predicate pushdown, column pruning, join
selection, partial aggregation and AQE all apply.  Python is re-entered only
for the explicitly-UDF surface (Arrow-batched pandas UDFs).

Public surface:
    - ``recommend_spark.session.get_spark()``      session factory
    - ``recommend_spark.io.load_table()``          fixture loader
    - ``recommend_spark.registry.QUERIES/ORACLES`` operator inventory
      (populated by importing ``recommend_spark.queries``)
"""

__version__ = "0.1.0"
