"""rakam_api_spark — a PySpark-native event-analytics engine.

A from-scratch Spark implementation of the capabilities of the
rakam-io/rakam-api reference (event collection with dynamic schema
inference/evolution, enrichment mappers, mutable user-profile store,
SQL analytics), extended with LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Everything here is expressed Spark-first: DataFrame/SQL plans that
Catalyst can optimize (predicate pushdown, broadcast joins, AQE),
with Python/Pandas UDFs only where built-in operators genuinely
cannot express the semantics.
"""

__version__ = "0.1.0"
