"""open_source_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``sumaniitm/open-source-etl`` (a metadata-driven Airflow/Snowflake/dbt/GE
ELT pipeline, see SURVEY.md) as an idiomatic Spark engine:

- DataFrame/SQL relational core (SURVEY.md §2B) with DuckDB oracle twins
- ingestion layer: CSV staging, date partitioning, key-value metadata
  (reference: dags/ingest_bundesliga_match_scores.py:24-210)
- data-quality suite (reference: great_expectations/, data_validator.py)
- model registry with ref()-style dependency resolution (reference: dbt)
- structured streaming over the events table
- LLM-data-pipeline operators: dedup, similarity search, text analysis,
  multimodal column plumbing

Everything is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
