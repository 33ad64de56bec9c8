"""data_integration_tool_spark — a PySpark-native analytics & ETL engine.

A from-scratch engine with the query and data-processing capabilities of
``riebecj/Data-Integration-Tool`` (reference unavailable at survey time —
see SURVEY.md §0; the operator inventory in SURVEY.md §2 is the binding
contract). Everything is expressed Spark-first: declarative DataFrame
plans that stay inside Catalyst, no driver-side collects, no Python row
loops outside Arrow-batched pandas UDFs.

Layout:
- ``session``    — SparkSession builder with scale-aware defaults
- ``io``         — table loading over the parquet test fixtures
- ``registry``   — query + oracle-SQL registration (single source of truth)
- ``operators/`` — relational operators (scan/filter/join/agg/window/...)
- ``functions/`` — scalar function families (string/date/math/array/json)
- ``streaming/`` — event-time operators (batch-verified) + Structured Streaming
- ``sources/``   — ETL format-conversion layer (parquet/csv/json/orc)
- ``plans/``     — tuning helpers & 100 TB posture notes
"""

__version__ = "0.1.0"
