"""Pins for Spark engine semantics the codebase depends on.

These exist so a surprising engine behavior that already caused a bug
cannot silently recur: if a Spark upgrade (or a new call site) changes
the behavior, the pin fails with an explanation rather than a parity
mismatch three layers up.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sequence_steps_down_when_start_exceeds_stop(spark):
    """Spark's ``sequence(start, stop)`` with start > stop steps DOWN —
    ``sequence(1, 0)`` is ``[1, 0]``, NOT an empty array (unlike
    DuckDB's ``range(1, 1)`` which is empty).  Any shingle/spine
    generator built on ``sequence`` must therefore guard the
    start > stop case explicitly (see ``datapipe_contamination_ngram``,
    round-3 phantom-shingle bug)."""
    row = spark.range(1).select(
        F.expr("sequence(1, 0)").alias("down"),
        F.expr("sequence(1, 1)").alias("one"),
    ).first()
    assert row["down"] == [1, 0]  # the footgun this file pins
    assert row["one"] == [1]


def test_guarded_shingle_generator_is_empty_for_short_docs(spark):
    """The exact guard pattern used by the shingle generators: docs
    shorter than the shingle width must yield ZERO shingles."""
    df = spark.createDataFrame(
        [(1, "short", 5), (2, "x" * 25, 25), (3, "", 0)],
        ["doc_id", "text", "n_chars"],
    )
    out = df.select(
        "doc_id",
        F.explode(
            F.when(
                F.col("n_chars") >= 20,
                F.expr(
                    "transform(sequence(1, n_chars - 19), "
                    "i -> substring(text, i, 20))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("sh"),
    )
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {2}
    assert len(rows) == 6  # 25 - 20 + 1 shingles, none phantom


def test_try_divide_matches_duckdb_null_on_zero(spark):
    """``try_divide(x, 0)`` is NULL (matching DuckDB ``x / 0``) while the
    bare ``/`` raises under ANSI mode — ratio expressions over columns
    that can be zero (``n_chars`` of an empty document) must use
    ``try_divide`` (see ``datapipe_c4_filter_cascade``, round-3 bug)."""
    row = spark.range(1).select(
        F.try_divide(F.lit(5.0), F.lit(0)).alias("td")
    ).first()
    assert row["td"] is None


def test_load_table_yields_fresh_join_sides(spark):
    """Two ``load_table`` calls for the same table must be independently
    resolvable join sides (fresh attribute IDs per call), exactly as two
    raw ``read.parquet`` calls are.  Pinned because the schema-inference
    cache in ``catalog.load_table`` must never graduate to caching the
    DataFrame itself: a shared relation makes ``a[c] == b[c]`` ambiguous
    (Spark resolves by attribute ID, and ``.alias`` does NOT refresh
    them — measured live before the cache was narrowed to schemas)."""
    from open_source_etl_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    a = load_table(spark, sf, "nation")
    b = load_table(spark, sf, "nation")
    joined = a.join(b, a["n_nationkey"] == b["n_regionkey"])
    assert joined.count() > 0
    # and the memoized schema is byte-identical to a fresh inference
    fresh = spark.read.parquet(f"{sf}/nation.parquet").schema
    assert a.schema == fresh
