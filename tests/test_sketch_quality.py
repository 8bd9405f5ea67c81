"""Tight quality floors for the sketch aggregates' RAW estimates.

Since round 5 every sketch query's registry surface is value-checked
(exact twins + integer-arithmetic bound flags the DuckDB oracle pins at
3-sigma), so the driver no longer needs a rows-only tier.  These tests
keep the TIGHTER pins on the raw estimates themselves, read from the
``*_raw`` helper frames the registry queries project their flags from
(one implementation, two verification tiers).
"""

from __future__ import annotations

import duckdb
import pytest

from open_source_etl_spark.catalog import load_table
from open_source_etl_spark.operators.aggregates import (
    GK_ACCURACY,
    approx_distinct_raw,
    approx_quantile_raw,
    approx_topk_entries,
    hll_sketch_union_raw,
)
from open_source_etl_spark.operators.windows import running_distinct_approx_raw
from open_source_etl_spark.registry import all_queries

# approx_count_distinct(rsd=0.02): 2% relative standard deviation.
# 6 sigma ≈ guaranteed-stable margin for a deterministic fixture (the
# sketch is deterministic for fixed input, so this is a fixed, replayable
# assertion — the margin only needs to absorb fixture regeneration).
_APPROX_RSD = 0.02 * 6
# DataSketches HLL default lgK=12 → rsd ≈ 1.04/sqrt(4096) ≈ 1.6%
_HLL_RSD = 0.016 * 6
# hll_sketch_agg(lgK=14) → rsd ≈ 1.04/sqrt(2^14) ≈ 0.8%
_HLL14_RSD = 0.008 * 6


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    yield con
    con.close()


def test_approx_distinct_within_rsd_bounds(spark, sf_dir, duck):
    got = {
        r["l_returnflag"]: r["approx_parts"]
        for r in approx_distinct_raw(
            load_table(spark, sf_dir, "lineitem")
        ).collect()
    }
    exact = dict(
        duck.execute(
            f"""
            SELECT l_returnflag, COUNT(DISTINCT l_partkey)
            FROM read_parquet('{sf_dir}/lineitem.parquet')
            GROUP BY 1
            """
        ).fetchall()
    )
    assert set(got) == set(exact)
    for flag, est in got.items():
        lo = exact[flag] * (1 - _APPROX_RSD)
        hi = exact[flag] * (1 + _APPROX_RSD)
        assert lo <= est <= hi, f"{flag}: est {est} outside [{lo:.0f}, {hi:.0f}]"


def test_hll_sketch_union_within_rsd_bounds(spark, sf_dir, duck):
    got = {
        r["o_orderpriority"]: r["est_custkeys"]
        for r in hll_sketch_union_raw(
            load_table(spark, sf_dir, "orders")
        ).collect()
    }
    exact = dict(
        duck.execute(
            f"""
            SELECT o_orderpriority, COUNT(DISTINCT o_custkey)
            FROM read_parquet('{sf_dir}/orders.parquet')
            GROUP BY 1
            """
        ).fetchall()
    )
    exact["ALL"] = duck.execute(
        f"SELECT COUNT(DISTINCT o_custkey) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    assert set(got) == set(exact)
    for prio, est in got.items():
        lo = exact[prio] * (1 - _HLL_RSD)
        hi = exact[prio] * (1 + _HLL_RSD)
        assert lo <= est <= hi, f"{prio}: est {est} outside [{lo:.0f}, {hi:.0f}]"


def test_approx_quantile_within_rank_error(spark, sf_dir, duck):
    """percentile_approx(accuracy=10000) guarantees rank error <= n/10000;
    assert each approximate percentile's true rank is within that bound
    (plus 1 for boundary/interpolation slack) of the requested rank."""
    rows = approx_quantile_raw(load_table(spark, sf_dir, "lineitem")).collect()
    for r in rows:
        n = r["n_rows"]
        tol = max(1, n // GK_ACCURACY) + 1
        for p, col in ((0.5, "a50"), (0.9, "a90"), (0.99, "a99")):
            est = r[col]
            # rank of est within the group = #values <= est
            (rank,) = duck.execute(
                f"""
                SELECT COUNT(*) FROM read_parquet('{sf_dir}/lineitem.parquet')
                WHERE l_returnflag = ? AND l_extendedprice <= ?
                """,
                [r["l_returnflag"], est],
            ).fetchone()
            target = p * n
            assert abs(rank - target) <= tol, (
                f"{r['l_returnflag']} {col}: rank {rank} vs target {target:.0f} "
                f"(tol {tol}, n {n})"
            )


def test_window_running_distinct_approx_matches_exact(spark, sf_dir):
    """The HLL running-distinct companion must track the exact
    first-occurrence rewrite within the lgK=14 sketch's error bound
    (6-sigma margin as above) on every (event_type, day) row — tighter
    than the 3% flag the registry query's oracle pins."""
    rows = running_distinct_approx_raw(
        load_table(spark, sf_dir, "events")
    ).collect()
    exact = {
        (r["event_type"], r["day"]): r["cum_users"]
        for r in all_queries()["window_running_distinct"](spark, sf_dir).collect()
    }
    assert {(r["event_type"], r["day"]) for r in rows} == set(exact)
    for r in rows:
        true = exact[(r["event_type"], r["day"])]
        est = r["cum_users_approx"]
        assert r["cum_users"] == true  # raw frame's own exact twin agrees
        assert abs(est - true) <= max(1, true * _HLL14_RSD), (
            f"{(r['event_type'], r['day'])}: est {est} vs exact {true}"
        )


def test_approx_topk_matches_exact_heavy_hitters(spark, sf_dir):
    """The approx_top_k sketch must agree with the exact top-10 quantity
    values on membership under count ties (every reported key's exact
    count >= the 10th-largest count) and report EXACT counts — the
    50-value domain sits far below the sketch capacity, so any deviation
    is a merge bug, not estimation error."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    approx = {r.qty: r.est_count for r in approx_topk_entries(li).collect()}
    full = {
        int(r.qty): r.n
        for r in li.groupBy(F.col("l_quantity").cast("bigint").alias("qty"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(approx) == 10
    kth = sorted(full.values(), reverse=True)[9]
    for key, est in approx.items():
        assert est == full[key], (key, est, full[key])
        assert full[key] >= kth, (key, full[key], kth)
