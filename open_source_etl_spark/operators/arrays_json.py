"""Array / map / JSON function family (EXT, SURVEY.md §2B "Scalar
functions": Array + Map/JSON rows).

Exercised over the embeddings fixture (`array<float>` dim 64, L2-
normalized) and the events fixture (`props` JSON strings).

Scale notes: higher-order functions (`transform`/`aggregate`/`zip_with`)
run inside codegen on the JVM — no Python boundary — which is why the
similarity operators (operators/llm_similarity.py) build on them rather
than on UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "array_funcs_basic",
    oracle="""
    SELECT
      vec_id,
      len(embedding) AS dim,
      embedding[1] AS first_component,
      COALESCE(array_to_string(list_transform(embedding[1:4],
        x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) AS VARCHAR)), ','),
        '') AS head4,
      list_contains(embedding, 0.0) AS has_exact_zero
    FROM embeddings
    ORDER BY vec_id
    """,
)
def array_funcs_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / slice / array_contains on the embedding column.

    head4 serializes via float→double→decimal(18,6)→string on BOTH engines:
    the identical widen-then-quantize path makes the rendered digits equal,
    and a string column survives the driver's pandas hasher (list cells
    don't — CORRECTNESS_r01 `array_funcs_basic` err).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    head4 = F.transform(
        F.slice("embedding", 1, 4),
        lambda x: x.cast("double").cast("decimal(18,6)").cast("string"),
    )
    return (
        emb.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            # try_element_at: ANSI element_at ERRORS on a zero-length
            # array; DuckDB's [1] yields NULL — try_ matches that
            F.try_element_at("embedding", F.lit(1)).alias("first_component"),
            F.array_join(head4, ",").alias("head4"),
            F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_exact_zero"),
        )
        .orderBy("vec_id")
    )


@query(
    "array_explode_agg",
    oracle="""
    SELECT
      label,
      ord AS dim_pos,
      ROUND(CAST(SUM(CAST(val AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*), 6) AS avg_component
    FROM (
      SELECT label, unnest(embedding) AS val, generate_subscripts(embedding, 1) AS ord
      FROM embeddings
    )
    WHERE ord <= 8
    GROUP BY label, ord
    ORDER BY label, dim_pos
    """,
)
def array_explode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode embeddings → per-(label, dimension) mean component.

    The centroid computation behind IVF-style ANN partitioning
    (operators/llm_similarity.py): explode is a flatMap (no shuffle),
    the mean shuffles on (label, dim) with map-side partials.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    return (
        exploded.groupBy("label", (F.col("pos") + 1).alias("dim_pos"))
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(18,8)")).cast("double") / F.count("*"), 6
            ).alias("avg_component")
        )
        .filter(F.col("dim_pos") <= 8)
        .orderBy("label", "dim_pos")
    )


@query(
    "array_higher_order",
    oracle="""
    SELECT
      vec_id,
      ROUND(COALESCE(list_sum(list_transform(embedding, x -> CAST(x*x AS DOUBLE))), 0.0), 4) AS norm_sq,
      ROUND(COALESCE(list_sum(list_transform(embedding, x -> CAST(abs(x) AS DOUBLE))), 0.0), 4) AS l1_norm,
      len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    ORDER BY vec_id
    """,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order transform/aggregate/filter: norms without leaving the JVM."""
    emb = load_table(spark, sf_dir, "embeddings")
    acc0 = F.lit(0.0).cast("double")
    norm_sq = F.aggregate(
        "embedding", acc0, lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    l1 = F.aggregate("embedding", acc0, lambda acc, x: acc + F.abs(x.cast("double")))
    return (
        emb.select(
            "vec_id",
            # coalesce: both engines agree the empty/NULL-array sum is 0.0
            # (DuckDB list_sum yields NULL there; Spark aggregate yields
            # 0.0 on empty but NULL on a NULL array)
            F.round(F.coalesce(norm_sq, F.lit(0.0)), 4).alias("norm_sq"),
            F.round(F.coalesce(l1, F.lit(0.0)), 4).alias("l1_norm"),
            F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        )
        .orderBy("vec_id")
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT
      event_id,
      event_type,
      CAST(CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS BIGINT) AS prop_k,
      CASE WHEN json_valid(props)
           THEN json_extract_string(props, '$.missing') END AS prop_missing
    FROM events
    ORDER BY event_id
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the event props column (REF generalization:
    event props are JSON strings, SURVEY.md §2B Map/JSON).

    The oracle guards every extraction with json_valid: Spark's
    get_json_object NULLs on malformed JSON while DuckDB's json functions
    ERROR — undefined inputs must not reach the divergent path."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
            F.get_json_object("props", "$.missing").alias("prop_missing"),
        )
        .orderBy("event_id")
    )


@query(
    "json_to_map",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(k) AS BIGINT) AS sum_k,
      MIN(k) AS min_k,
      MAX(k) AS max_k
    FROM (
      SELECT event_type,
             CAST(CASE WHEN json_valid(props)
                       THEN json_extract_string(props, '$.k') END AS BIGINT) AS k
      FROM events
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json → MapType → element access, aggregated per event type.

    Exercises the schema-bearing JSON path (from_json with an explicit
    MapType) as opposed to stringly get_json_object.
    """
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("props_map", F.from_json("props", "map<string,bigint>"))
    k = F.element_at("props_map", "k")
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "array_zip_construct",
    oracle="""
    SELECT
      n.n_name AS nation_name,
      array_to_string([r.r_name, n.n_name], ',') AS region_nation,
      CAST(to_json(struct_pack(nation := n.n_name, region := r.r_name)) AS VARCHAR) AS geo
    FROM nation n
    JOIN region r ON r.r_regionkey = n.n_regionkey
    ORDER BY nation_name
    """,
)
def array_zip_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array and struct construction (typed nested values end-to-end).

    The constructed values are serialized (array_join / to_json) because
    the driver's pandas canonicalizer cannot hash list/struct cells
    (CORRECTNESS_r01 `array_zip_construct` err); construction itself still
    exercises F.array / F.struct.
    """
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        nat.join(F.broadcast(reg), reg.r_regionkey == nat.n_regionkey)
        .select(
            F.col("n_name").alias("nation_name"),
            F.array_join(F.array("r_name", "n_name"), ",").alias("region_nation"),
            F.to_json(
                F.struct(
                    F.col("n_name").alias("nation"), F.col("r_name").alias("region")
                )
            ).alias("geo"),
        )
        .orderBy("nation_name")
    )


@query(
    "array_explode_outer_nulls",
    oracle="""
    SELECT
      e.event_id,
      u.tok AS bucket_tok
    FROM (
      SELECT
        event_id,
        CASE WHEN value >= 50 THEN string_split(event_type, '_') END AS toks
      FROM events
      WHERE event_id < 2000
    ) e
    LEFT JOIN LATERAL (SELECT unnest(e.toks) AS tok) u ON TRUE
    ORDER BY event_id, bucket_tok
    """,
)
def array_explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-preserving lateral expansion: ``explode_outer`` keeps rows
    whose array is NULL (low-value events here) as a single NULL-element
    row — plain explode would silently drop them, the classic
    lost-rows bug in flattening pipelines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    toks = F.when(F.col("value") >= 50, F.split("event_type", "_"))
    return (
        ev.select("event_id", toks.alias("toks"))
        .select("event_id", F.explode_outer("toks").alias("bucket_tok"))
        .orderBy("event_id", "bucket_tok")
    )


@query(
    "json_variant_extract",
    oracle="""
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(k) AS BIGINT) AS k_sum,
      CAST(MIN(k) AS INT) AS k_min,
      CAST(MAX(k) AS INT) AS k_max
    FROM (
      SELECT event_type,
             CAST(CASE WHEN json_valid(props)
                       THEN json_extract(props, '$.k') END AS INTEGER) AS k
      FROM events
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via the VARIANT type (Spark 4): parse_json
    once into the binary variant encoding, then typed path extraction with
    variant_get — the engine-native path for open JSON schemas, replacing
    per-query string re-parsing (get_json_object) with a parse-once
    columnar value.  At 100 TB the variant column is the storage format;
    here it's derived in-flight from the props string."""
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json: parse_json ERRORS on malformed input; the NULL-on-
    # malformed behavior matches the oracle's json_valid guard
    k = F.variant_get(F.try_parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.min("k").cast("int").alias("k_min"),
            F.max("k").cast("int").alias("k_max"),
        )
        .orderBy("event_type")
    )


@query(
    "map_funcs_explode",
    oracle="""
    WITH src AS (
      -- json_valid must filter BEFORE the lateral: DuckDB evaluates the
      -- lateral's json_keys ahead of an outer WHERE, erroring on the
      -- malformed string.  Spark mirrors via from_json -> NULL map ->
      -- explode drops the row.
      SELECT event_id, event_type, props
      FROM events
      WHERE event_id <= 500 AND json_valid(props)
    ), kv AS (
      SELECT e.event_id, e.event_type, j.key AS k, CAST(j.value AS BIGINT) AS v
      FROM src e, LATERAL (
        SELECT unnest(json_keys(e.props)) AS key,
               json_extract_string(e.props, '$.' || unnest(json_keys(e.props))) AS value
      ) j
    )
    SELECT event_id, event_type, k, v, v * 2 AS v_doubled
    FROM kv
    ORDER BY event_id, k
    """,
)
def map_funcs_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function family (SURVEY §2B Map/JSON): JSON props →
    ``from_json`` MapType → ``transform_values`` (higher-order map
    rewrite) → ``explode`` into (key, value) rows — the generic
    flatten-a-property-bag shape.  ``map_keys``/``map_filter`` ride the
    same MapType; per-row, zero shuffle, fully JVM."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    parsed = ev.select(
        "event_id",
        "event_type",
        F.from_json("props", "map<string,bigint>").alias("m"),
    ).select(
        "event_id",
        "event_type",
        "m",
        F.transform_values("m", lambda _, v: v * 2).alias("m2"),
    )
    return (
        parsed.select(
            "event_id",
            "event_type",
            F.explode("m").alias("k", "v"),
            "m2",
        )
        .select(
            "event_id", "event_type", "k", "v", F.element_at("m2", F.col("k")).alias("v_doubled")
        )
        .orderBy("event_id", "k")
    )
