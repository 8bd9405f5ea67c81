"""DQ suite: the reference's 9 expectations + the single-pass runner."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from open_source_etl_spark.dq import validate
from open_source_etl_spark.dq.expectations import (
    BUNDESLIGA_COLUMNS,
    bundesliga_suite,
    expect_column_values_to_be_between,
    expect_column_values_to_be_in_set,
    expect_column_values_to_be_unique,
    expect_column_values_to_not_be_null,
    expect_table_columns_to_match_ordered_list,
)


def _match_scores_df(spark, rows):
    return spark.createDataFrame(rows, ", ".join(f"{c} string" for c in BUNDESLIGA_COLUMNS))


GOOD_ROW = (
    "raw", "1", "Regular Season", "Sat", "2021-03-06", "15:30", "FCB",
    "2.1", "3-1", "0.7", "BVB", "100", "Allianz", "Ref A",
)


def test_reference_suite_passes_on_clean_data(spark, tmp_path):
    df = _match_scores_df(spark, [GOOD_ROW])
    report = str(tmp_path / "report.json")
    result = validate(df, bundesliga_suite(), report_path=report)
    assert result.success
    assert result.row_count == 1
    # 1 schema + 2 value-set + 6 not-null = the reference's 9 expectations
    assert len(result.results) == 9
    persisted = json.loads(open(report).read())
    assert persisted["success"] is True


def test_reference_suite_catches_violations(spark):
    bad_round = list(GOOD_ROW)
    bad_round[2] = "Friendly"  # not in the allowed round set
    null_venue = list(GOOD_ROW)
    null_venue[12] = None
    df = _match_scores_df(spark, [GOOD_ROW, tuple(bad_round), tuple(null_venue)])
    result = validate(df, bundesliga_suite())
    assert not result.success
    by_check = {
        (r["expectation"], r.get("column")): r for r in result.results
    }
    assert by_check[("expect_column_values_to_be_in_set", "round")]["violations"] == 1
    assert by_check[("expect_column_values_to_not_be_null", "venue")]["violations"] == 1
    # null round does NOT violate the set check (GE skip-null semantics)
    assert by_check[("expect_column_values_to_be_in_set", "day")]["violations"] == 0


def test_schema_ordered_list_check(spark):
    df = _match_scores_df(spark, [GOOD_ROW]).select(*reversed(BUNDESLIGA_COLUMNS))
    result = validate(df, [expect_table_columns_to_match_ordered_list(BUNDESLIGA_COLUMNS)])
    assert not result.success


def test_between_and_unique(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (2, 500.0)], "id int, val double"
    )
    result = validate(
        df,
        [
            expect_column_values_to_be_between("val", 0, 100),
            expect_column_values_to_be_unique("id"),
        ],
    )
    assert not result.success
    between, unique = result.results
    assert between["violations"] == 1  # 500 out of range
    assert unique["duplicate_keys"] == 1  # id=2 twice


def test_single_pass_plan(spark):
    """All row-level checks fold into one aggregation job (engine
    restatement of SURVEY.md §3.3 — count the agg in the plan)."""
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    suite = [
        expect_column_values_to_not_be_null("id"),
        expect_column_values_to_not_be_null("s"),
        expect_column_values_to_be_in_set("s", ["a", "b"]),
    ]
    # validate() must not error and must produce 3 outcomes from one pass
    result = validate(df, suite)
    assert result.success and len(result.results) == 3


def test_profile_table_one_pass(spark, sf_dir):
    from open_source_etl_spark.catalog import load_table
    from open_source_etl_spark.dq.profile import profile_table

    orders = load_table(spark, sf_dir, "orders")
    prof = profile_table(orders, ["o_orderkey", "o_orderstatus", "o_totalprice"])
    rows = {(r["column"], r["metric"]): r["value"] for r in prof.collect()}
    n = orders.count()
    assert rows[("o_orderkey", "count")] == str(n)
    assert rows[("o_orderkey", "nulls")] == "0"
    # exact key: approx distinct within HLL tolerance of n
    assert abs(int(rows[("o_orderkey", "approx_distinct")]) - n) / n < 0.10  # default rsd is ~5%; allow 2 sigma
    assert rows[("o_orderstatus", "min")] == "F"
    assert rows[("o_orderstatus", "max")] == "P"
    assert ("o_orderstatus", "mean") not in rows  # string column: no mean
    assert float(rows[("o_totalprice", "mean")]) > 0


def test_observe_metrics_piggyback_on_write(spark, tmp_path, sf_dir):
    """observe() metrics arrive with the landing write — one job, no
    second scan — and match the separately-computed truth."""
    from open_source_etl_spark.dq import (
        null_count,
        out_of_range_count,
        out_of_set_count,
        row_count,
        validate_while_writing,
    )
    from open_source_etl_spark.catalog import load_table

    orders = load_table(spark, str(sf_dir), "orders")
    metrics = validate_while_writing(
        orders,
        str(tmp_path / "landed"),
        row_count(),
        null_count("o_custkey"),
        out_of_set_count("o_orderstatus", ["O", "F", "P"]),
        out_of_range_count("o_totalprice", 0.0, 1e9),
    )
    truth = orders.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("o_custkey").isNull().cast("bigint")).alias("nulls"),
    ).first()
    assert metrics["rows"] == truth["rows"]
    assert metrics["o_custkey__nulls"] == truth["nulls"]
    assert metrics["o_orderstatus__out_of_set"] == 0
    assert metrics["o_totalprice__out_of_range"] == 0
    # the landed data is complete
    assert spark.read.parquet(str(tmp_path / "landed")).count() == metrics["rows"]


def test_data_docs_rendering(spark, tmp_path):
    """Data-docs analogue of the reference checkpoint's update_data_docs
    action (checkpoint.yml:9-20): validation results render to a static
    HTML site - index + per-suite detail pages - with pass/fail badges
    and violation details present in the markup."""
    from open_source_etl_spark.dq.datadocs import write_data_docs

    good = validate(_match_scores_df(spark, [GOOD_ROW]), bundesliga_suite())
    bad_row = list(GOOD_ROW)
    bad_row[2] = "Friendly"  # violates the round value-set expectation
    bad = validate(_match_scores_df(spark, [bad_row]), bundesliga_suite())

    site = str(tmp_path / "data_docs")
    index = write_data_docs(site, {"clean_batch": good, "dirty_batch": bad})

    idx = open(index).read()
    assert "clean_batch" in idx and "dirty_batch" in idx
    assert 'href="validations/clean_batch.html"' in idx
    assert "PASSED" in idx and "FAILED" in idx

    detail = open(f"{site}/validations/dirty_batch.html").read()
    assert "FAILED" in detail and "violations=1" in detail
    clean_detail = open(f"{site}/validations/clean_batch.html").read()
    assert "FAILED" not in clean_detail

    # idempotent overwrite, like repeated checkpoint runs
    write_data_docs(site, {"clean_batch": good, "dirty_batch": bad})
    assert open(index).read() == idx
