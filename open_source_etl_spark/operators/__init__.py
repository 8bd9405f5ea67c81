"""Operator modules. Importing a module registers its queries (see
``open_source_etl_spark.registry``)."""
