"""Model registry: ref() DAG, materialization, dbt-style schema tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_etl_spark.models import ModelRegistry, example_models


def test_example_models_reproduce_reference(spark):
    reg = example_models()
    built = reg.build(spark)
    first = built["my_first_dbt_model"]
    assert [r["id"] for r in first.orderBy(F.col("id").asc_nulls_last()).collect()] == [1, None]
    second = built["my_second_dbt_model"]
    assert [r["id"] for r in second.collect()] == [1]
    # views registered like the reference's materializations
    assert spark.table("my_second_dbt_model").count() == 1


def test_example_model_tests_fail_by_design(spark):
    """The starter project's NULL row makes not_null fail on model 1 and
    pass on the filtered model 2 (FIXTURES.md §A4)."""
    reg = example_models()
    outcomes = reg.test(spark)
    assert outcomes["my_first_dbt_model.not_null.id"] is False
    assert outcomes["my_first_dbt_model.unique.id"] is True
    assert outcomes["my_second_dbt_model.not_null.id"] is True
    assert outcomes["my_second_dbt_model.unique.id"] is True


def test_topological_build_order(spark):
    reg = ModelRegistry()
    reg.register("c", lambda s, ref: ref("b").withColumn("z", F.lit(3)), depends_on=("b",))
    reg.register("a", lambda s, ref: s.sql("SELECT 1 AS x"))
    reg.register("b", lambda s, ref: ref("a").withColumn("y", F.lit(2)), depends_on=("a",))
    order = reg.build_order()
    assert order.index("a") < order.index("b") < order.index("c")
    built = reg.build(spark)
    assert built["c"].columns == ["x", "y", "z"]


def test_ref_before_build_raises(spark):
    reg = ModelRegistry()
    reg.register("lonely", lambda s, ref: ref("missing"))
    with pytest.raises(KeyError):
        reg.build(spark)


def test_duplicate_model_rejected():
    reg = ModelRegistry()
    reg.register("m", lambda s, ref: None)
    with pytest.raises(ValueError):
        reg.register("m", lambda s, ref: None)
