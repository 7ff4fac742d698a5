"""sparktsc — a PySpark-native time-series analytics engine.

From-scratch rebuild of the query and data-processing capabilities of
wandnz/nntsc (a network time-series collector/store/export server),
re-expressed Spark-first:

- collections/streams  -> schema registry + dimension tables (``schemas``,
  ``catalog``)
- per-stream physical tables + UNION ALL  -> one date-partitioned fact table
  with predicate pushdown / partition pruning (``sources.timeseries``)
- QueryBuilder's fixed query shapes       -> DataFrame pipelines
  (``operators.select``, ``operators.aggregate``, ``operators.matrix``)
- Influx continuous queries (rollups)     -> windowed aggregation with
  algebraic re-merge (``operators.rollup``)
- custom Postgres aggregates most/smoke   -> native DataFrame expressions
  (``functions.aggregations``)
- ingest parsers                          -> vectorized DataFrame transforms
  (``ingest``)

Plus first-class large-scale training-data pipeline operators (``pipeline``):
deduplication, similarity search, multimodal columns, text analysis.
"""

__version__ = "0.1.0"
