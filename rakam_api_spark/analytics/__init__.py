"""Analytics layer: the relational surface the reference delegates to
its warehouse ("Analyze your event data with your SQL queries",
reference README.md:14-19) plus the event-analytics report builders
(segmentation / funnel / retention / sessionization) that Rakam Cloud
implements on top.  Here Spark SQL *is* the warehouse, so this whole
surface is first-class.

Each module exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI SQL over the same
tables) consumed by ``__spark_entry__``.
"""
