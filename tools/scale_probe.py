"""Empirical scaling probe: rerun heavy operators on a 5x replica of the
sf0.1 fixtures and report the time ratio.

Usage: python tools/scale_probe.py [mult=5] [out_dir=/tmp/osetl-scaleprobe]

Construction (scale-out semantics, not row duplication): fact tables are
unioned ``mult`` times with entity keys offset per copy — more orders,
more customers, more events — while enumerated dimensions (nation,
region) stay fixed, exactly how a real corpus grows.  Text/embedding
tables are excluded: replicating documents verbatim manufactures
duplicate clusters, so a dedup query's output (and its pair count)
grows quadratically BY CONSTRUCTION — that would measure the synthetic
data, not the operator.

A near-``mult`` (or lower, since fixed overhead amortizes) time ratio is
the evidence the SCALE.md claims rest on; a super-linear ratio flags an
operator whose cost curve bends the wrong way before the driver's bench
would ever show it.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

# key columns to offset per copy (dimension tables nation/region are NOT
# replicated; their keys are referenced unchanged)
OFFSETS = {
    "customer": {"c_custkey": 10**9},
    "supplier": {"s_suppkey": 10**9},
    "part": {"p_partkey": 10**9},
    "orders": {"o_orderkey": 10**12, "o_custkey": 10**9},
    "lineitem": {"l_orderkey": 10**12, "l_partkey": 10**9, "l_suppkey": 10**9},
    "events": {"event_id": 10**12, "user_id": 10**9},
}
COPY_AS_IS = ["nation", "region", "documents", "embeddings"]

PROBES = [
    "q1_pricing_summary",
    "q9_product_profit",
    "behavior_sessionize",
    "behavior_attribution_last_touch",
    "graph_pagerank",
    "analytics_market_basket",
    "warehouse_point_in_time_join",
    "timeseries_downsample_ohlc",
    "scd2_user_state",
    "agg_grouped_basic",
    # round-2 additions
    "behavior_funnel",
    "dq_profile_table",
    "warehouse_merge_upsert",
    "layout_partition_prune_dpp",
]


def build(spark, mult: int, out: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for tbl, keys in OFFSETS.items():
        df = spark.read.parquet(f"{BASE}/{tbl}.parquet")
        parts = []
        for i in range(mult):
            d = df
            for c, off in keys.items():
                d = d.withColumn(c, F.col(c) + F.lit(i * off))
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")
    for tbl in COPY_AS_IS:
        spark.read.parquet(f"{BASE}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{tbl}.parquet")


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/osetl-scaleprobe"

    from open_source_etl_spark.conf import EngineConfig
    from open_source_etl_spark.registry import all_queries
    from open_source_etl_spark.session import build_session

    spark = build_session(EngineConfig(master="local[32]", shuffle_partitions=32))
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    print(f"building {mult}x replica under {out} ...", flush=True)
    t0 = time.time()
    build(spark, mult, out)
    print(f"built in {time.time() - t0:.1f}s", flush=True)

    # warm the JVM so the first probe doesn't pay codegen spin-up
    queries["q1_pricing_summary"](spark, BASE).count()

    print(f"{'query':40s} {'sf0.1':>8s} {f'{mult}x':>8s} {'ratio':>6s}")
    for name in PROBES:
        t0 = time.time()
        queries[name](spark, BASE).count()
        base_s = time.time() - t0
        t0 = time.time()
        queries[name](spark, out).count()
        big_s = time.time() - t0
        print(
            f"{name:40s} {base_s:8.2f} {big_s:8.2f} {big_s / base_s:6.2f}",
            flush=True,
        )

    shutil.rmtree(out, ignore_errors=True)





# ---------------------------------------------------------------------------
# Iterative-operator probe: 100x key-space scaling for the two Pregel-style
# loops (PageRank, connected components).  Fixture replication is the wrong
# instrument here — the fixture's graph is dense-bipartite and CC's edges
# derive from document content — so the probe runs the EXACT iteration
# kernels (graph_queries.pagerank, llm_dedup._propagate_min_labels) on
# synthetic graphs whose vertex count spans two orders of magnitude, and
# reports the fitted scaling exponent alpha where time ~ n^alpha
# (alpha <= 1 = at-most-linear; the SCALE.md claim).
#
# Graph shapes (deterministic, |E| proportional to |V|):
# - pagerank: each v -> (7v+1) mod V and (13v+5) mod V, undirected
#   (expander-ish: every round's contribution shuffle carries 4|V| rows).
# - cc: chains of length 32 (v <-> v+1 within a block), so min-label
#   propagation + path halving needs its full log-depth round count at
#   every size — the worst case for the convergence loop, not the best.
# ---------------------------------------------------------------------------

ITER_SIZES = (100_000, 1_000_000, 10_000_000)


def _pagerank_edges(spark, n: int):
    from pyspark.sql import functions as F

    v = spark.range(n).select(F.col("id").alias("src"))
    fwd = v.select(
        "src", ((F.col("src") * 7 + 1) % n).alias("dst")
    ).union(v.select("src", ((F.col("src") * 13 + 5) % n).alias("dst")))
    return fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _chain_edges(spark, n: int, block: int = 32):
    from pyspark.sql import functions as F

    v = spark.range(n - 1).select(F.col("id").alias("src"))
    fwd = v.filter((F.col("src") % block) != block - 1).select(
        "src", (F.col("src") + 1).alias("dst")
    )
    return fwd


def iterative_main() -> None:
    import math

    from open_source_etl_spark.conf import EngineConfig
    from open_source_etl_spark.operators.graph_queries import pagerank
    from open_source_etl_spark.operators.llm_dedup import _propagate_min_labels
    from open_source_etl_spark.session import build_session
    from pyspark.sql import functions as F

    # Size the JVM for the 10M-key leg the way a cluster would size its
    # executors: 40M cached edge rows + 7 generations of 10M-row rank
    # checkpoints do not fit an 8g heap without GC thrash (the round-4
    # α=1.13 bend), and Tungsten execution memory moves off-heap so
    # shuffle/sort buffers stop feeding the collector at all.
    os.environ.setdefault("OSETL_DRIVER_MEMORY", "24g")
    spark = build_session(
        EngineConfig(
            master="local[32]",
            shuffle_partitions=32,
            extra={
                "spark.memory.offHeap.enabled": "true",
                "spark.memory.offHeap.size": "8g",
            },
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, list[tuple[int, float]]] = {"pagerank": [], "cc": []}
    for n in ITER_SIZES:
        e_pr = _pagerank_edges(spark, n).localCheckpoint(eager=True)
        t0 = time.time()
        ranks = pagerank(spark, e_pr, rounds=6)
        mass = ranks.agg(F.sum("rank")).first()[0]
        pr_s = time.time() - t0
        assert abs(mass - 1.0) < 1e-6, mass
        results["pagerank"].append((n, pr_s))

        e_cc = _chain_edges(spark, n)
        und = e_cc.union(
            e_cc.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).localCheckpoint(eager=True)
        t0 = time.time()
        labels = und.select(
            F.col("src").alias("doc_id"), F.least("src", "dst").alias("label")
        ).groupBy("doc_id").agg(F.min("label").alias("label"))
        labels = _propagate_min_labels(und, labels)
        n_clusters = labels.select("label").distinct().count()
        cc_s = time.time() - t0
        # chains of 32 -> exactly ceil(n/32) components: correctness at scale
        assert n_clusters == -(-n // 32), (n_clusters, n)
        results["cc"].append((n, cc_s))
        print(f"n={n:>11,}  pagerank {pr_s:7.1f}s  cc {cc_s:7.1f}s", flush=True)
        spark.catalog.clearCache()

    for op, series in results.items():
        for (n1, t1), (n2, t2) in zip(series, series[1:]):
            alpha = math.log(t2 / t1) / math.log(n2 / n1)
            print(f"{op}: n {n1:,} -> {n2:,}: alpha = {alpha:.2f}", flush=True)
        (n1, t1), (n2, t2) = series[0], series[-1]
        alpha = math.log(t2 / t1) / math.log(n2 / n1)
        print(f"{op}: OVERALL {n1:,} -> {n2:,} (100x): alpha = {alpha:.2f}", flush=True)




def pairs_main() -> None:
    """Candidate-pair growth probe for the Levenshtein dedup blocking
    (`python tools/scale_probe.py pairs [mults]`): replicate the
    document corpus N x with doc_id offsets (same length distribution —
    the quantity under test is ENUMERATION growth, not dup semantics)
    and count the candidate pairs each blocking scheme feeds the DP:

    - old: (lang, source) blocks + |delta n_chars| residual — block size
      grows linearly with the corpus, so pairs grow quadratically;
    - new: (lang, source, floor(n_chars/60)) equi-key with the
      3-adjacent-bucket explode — pair growth tracks the per-bucket
      density, the shape that holds when a real corpus's length
      distribution spreads over thousands of buckets.
    """
    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from open_source_etl_spark.conf import EngineConfig
    from open_source_etl_spark.session import build_session

    mults = [int(m) for m in (sys.argv[2:] or ["1", "5", "25"])]
    spark = build_session(EngineConfig(master="local[32]", shuffle_partitions=32))
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .filter(F.col("n_chars") <= 220)
        .select("doc_id", "lang", "source", "n_chars")
    )
    n_base = base.count()
    for mult in mults:
        d = base
        if mult > 1:
            d = base.withColumn(
                "copy", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
            ).select(
                (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
                "lang", "source", "n_chars",
            )
        d = d.withColumn("len_bucket", F.floor(F.col("n_chars") / 60))
        a_old, b_old = d.alias("a"), d.alias("b")
        old_pairs = a_old.join(
            b_old,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 60),
        ).count()
        a_new = d.withColumn(
            "jb",
            F.explode(
                F.array(
                    F.col("len_bucket") - 1,
                    F.col("len_bucket"),
                    F.col("len_bucket") + 1,
                )
            ),
        ).alias("a")
        new_pairs = a_new.join(
            d.alias("b"),
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.jb") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 60),
        ).count()
        # join-candidate volume BEFORE residual filters = what each plan
        # actually streams through the probe side
        old_cand = a_old.join(
            b_old,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source")),
        ).count()
        new_cand = a_new.join(
            d.alias("b"),
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.jb") == F.col("b.len_bucket")),
        ).count()
        print(
            f"mult={mult} docs={n_base * mult:,} "
            f"equi-candidates old={old_cand:,} new={new_cand:,} "
            f"(ratio {old_cand / max(new_cand, 1):.1f}x) "
            f"DP-surviving old={old_pairs:,} new={new_pairs:,}",
            flush=True,
        )

    # the fixture caps n_chars at 220 (4 buckets), which understates the
    # bucketing win; a real crawl corpus spreads lengths over thousands
    # of buckets.  Re-run the largest mult with a synthetic WIDE length
    # distribution (uniform-ish 0..4000 — 67 buckets) to measure the
    # shape that actually holds at 100 TB.
    mult = mults[-1]
    # the FULL document table, not the n_chars<=220-filtered `base`:
    # the WIDE branch overwrites n_chars anyway, and the published
    # SCALE.md §9c row is measured over all docs
    d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    n_wide = d.count()
    if mult > 1:
        d = d.withColumn(
            "copy", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
        ).select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            "lang", "source",
        )
    d = d.withColumn("n_chars", (F.col("doc_id") * 37) % 4000).withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 60)
    )
    a_old, b_old = d.alias("a"), d.alias("b")
    old_cand = a_old.join(
        b_old,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source")),
    ).count()
    a_new = d.withColumn(
        "jb",
        F.explode(
            F.array(
                F.col("len_bucket") - 1,
                F.col("len_bucket"),
                F.col("len_bucket") + 1,
            )
        ),
    ).alias("a")
    new_cand = a_new.join(
        d.alias("b"),
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.jb") == F.col("b.len_bucket")),
    ).count()
    print(
        f"WIDE-length mult={mult} docs={n_wide * mult:,} "
        f"equi-candidates old={old_cand:,} new={new_cand:,} "
        f"(ratio {old_cand / max(new_cand, 1):.1f}x)",
        flush=True,
    )




def _shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes across all completed stages, via the
    UI REST API (the probe session enables the UI for exactly this).
    Deltas around a run isolate that run's shuffle volume."""
    import json as _json
    import urllib.request

    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{url}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = _json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def shingles_main() -> None:
    """Scale probe for the two shingle operators
    (`python tools/scale_probe.py shingles [mults]`), string vs
    xxhash64 scheme (VERDICT round 7 items 4 + 6):

    - corpus construction: union of per-copy ISOMORPHIC corpora — each
      copy rotates the lowercase alphabet by its copy index (translate,
      length-preserving), so within-copy shingle/doc-frequency structure
      matches the base corpus exactly while cross-copy shingle overlap
      is ~nil.  Verbatim replication would instead multiply every
      shingle's doc-frequency by mult and flip the df>=4 threshold
      corpus-wide — measuring the synthetic data, not the operator.
    - per (query, mult): run the string scheme and the hashed scheme,
      assert their RESULTS agree (same survivors / shared-ngram sums),
      record wall time and the run's shuffle-write bytes.
    - report: fitted time exponents per scheme, and the string/hashed
      shuffle-bytes ratio (the 100 TB cost driver the hashed path
      exists to cut)."""
    import math

    from pyspark.sql import functions as F

    from open_source_etl_spark.conf import EngineConfig
    from open_source_etl_spark.operators.datapipe_queries import (
        datapipe_boilerplate_prune,
        datapipe_contamination_ngram,
    )
    from open_source_etl_spark.session import build_session

    mults = [int(m) for m in (sys.argv[2:] or ["1", "5", "25"])]
    spark = build_session(
        EngineConfig(
            master="local[32]",
            shuffle_partitions=32,
            extra={"spark.ui.enabled": "true"},
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    alpha = "abcdefghijklmnopqrstuvwxyz"
    base = spark.read.parquet(f"{BASE}/documents.parquet")

    def summarize_boiler(df):
        row = df.agg(
            F.count("*"),
            F.sum(F.col("keep").cast("int")),
            F.sum("n_boilerplate"),
            F.sum("n_shingles"),
        ).first()
        return tuple(row)

    def summarize_contam(df):
        row = df.agg(F.count("*"), F.sum("n_shared_ngrams")).first()
        return tuple(row)

    probes = [
        ("datapipe_boilerplate_prune", datapipe_boilerplate_prune, summarize_boiler),
        (
            "datapipe_contamination_ngram",
            datapipe_contamination_ngram,
            summarize_contam,
        ),
    ]
    times: dict[tuple[str, bool], list[tuple[int, float]]] = {}
    for mult in mults:
        out = f"/tmp/osetl-shingleprobe-{mult}"
        parts = []
        for i in range(mult):
            rot = alpha[i % 26 :] + alpha[: i % 26]
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    F.translate("text", alpha, rot).alias("text"),
                    "n_chars",
                    "lang",
                    "source",
                    *[c for c in base.columns if c not in
                      ("doc_id", "text", "n_chars", "lang", "source")],
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{out}/documents.parquet")

        for qname, fn, summarize in probes:
            sums = {}
            for hashed in (False, True):
                spark.catalog.clearCache()
                b0 = _shuffle_write_bytes(spark)
                t0 = time.time()
                sums[hashed] = summarize(fn(spark, out, hash_shingles=hashed))
                dt = time.time() - t0
                db = _shuffle_write_bytes(spark) - b0
                times.setdefault((qname, hashed), []).append((mult, dt))
                print(
                    f"mult={mult:2d} {qname:32s} "
                    f"{'xxhash64' if hashed else 'string':8s} "
                    f"{dt:7.2f}s shuffle={db / 1e6:10.2f} MB",
                    flush=True,
                )
            assert sums[False] == sums[True], (qname, mult, sums)
            print(f"         {qname:32s} schemes agree: {sums[False]}", flush=True)
        shutil.rmtree(out, ignore_errors=True)

    for (qname, hashed), series in sorted(times.items()):
        if len(series) < 2:
            continue
        (n1, t1), (n2, t2) = series[0], series[-1]
        a = math.log(t2 / t1) / math.log(n2 / n1)
        print(
            f"{qname} [{'xxhash64' if hashed else 'string'}]: "
            f"mult {n1} -> {n2}: alpha = {a:.2f}",
            flush=True,
        )


def dsir_main() -> None:
    """Scale probe for ``datapipe_dsir_importance``
    (`python tools/scale_probe.py dsir [mults]`): isomorphic corpus
    replication (the shingles probe's alphabet-rotation construction,
    which preserves each copy's term structure and the lang-based
    target/raw split while keeping cross-copy term overlap ~nil), wall
    time per mult, and the fitted exponent.  The expected shape: the
    two bucket-count aggregations collapse to <= 4096 rows regardless
    of mult, so cost is dominated by the term explode + one per-doc
    combinable sum — alpha ~= 1."""
    import math

    from pyspark.sql import functions as F

    from open_source_etl_spark.conf import EngineConfig
    from open_source_etl_spark.operators.datapipe_queries import (
        datapipe_dsir_importance,
    )
    from open_source_etl_spark.session import build_session

    mults = [int(m) for m in (sys.argv[2:] or ["1", "5", "25"])]
    spark = build_session(
        EngineConfig(master="local[32]", shuffle_partitions=32)
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    alpha = "abcdefghijklmnopqrstuvwxyz"
    base = spark.read.parquet(f"{BASE}/documents.parquet")
    series = []
    for mult in mults:
        out = f"/tmp/osetl-dsirprobe-{mult}"
        parts = []
        for i in range(mult):
            rot = alpha[i % 26 :] + alpha[: i % 26]
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    F.translate("text", alpha, rot).alias("text"),
                    "n_chars", "lang", "source",
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{out}/documents.parquet")

        spark.catalog.clearCache()
        t0 = time.time()
        row = datapipe_dsir_importance(spark, out).agg(
            F.count("*"), F.sum("n_terms")
        ).first()
        dt = time.time() - t0
        series.append((mult, dt))
        print(
            f"mult={mult:2d} dsir_importance {dt:7.2f}s "
            f"docs={row[0]} terms={row[1]}",
            flush=True,
        )
        shutil.rmtree(out, ignore_errors=True)
    if len(series) >= 2:
        (n1, t1), (n2, t2) = series[0], series[-1]
        a = math.log(t2 / t1) / math.log(n2 / n1)
        print(f"dsir_importance: mult {n1} -> {n2}: alpha = {a:.2f}", flush=True)


def containers_main() -> None:
    """Scale probe for the container extractors and walks
    (`python tools/scale_probe.py containers [mults]`): replicate the
    documents corpus (doc_id offset per copy, text reused — container
    bytes are per-row so verbatim replication is safe here, unlike the
    shingle probes), run every synthesize-and-walk kernel, fit
    exponents.  Expected: embarrassingly parallel mapInPandas kernels,
    alpha ~= 1 until the 32 cores saturate, then exactly 1."""
    import math

    from pyspark.sql import functions as F

    from open_source_etl_spark.conf import EngineConfig
    from open_source_etl_spark.operators.datapipe_queries import (
        datapipe_avro_scan,
        datapipe_gzip_jsonl_scan,
        datapipe_pdf_text_extract,
        datapipe_tar_extract,
        datapipe_tfrecord_scan,
        datapipe_warc_extract,
        datapipe_zip_extract,
    )
    from open_source_etl_spark.operators.multimodal_queries import (
        multimodal_aac_adts_walk,
        multimodal_mp4_box_walk,
        multimodal_ogg_opus_walk,
        multimodal_webm_ebml_walk,
    )
    from open_source_etl_spark.session import build_session

    mults = [int(m) for m in (sys.argv[2:] or ["1", "5", "25"])]
    spark = build_session(
        EngineConfig(master="local[32]", shuffle_partitions=32)
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = spark.read.parquet(f"{BASE}/documents.parquet")
    probes = [
        ("datapipe_warc_extract", datapipe_warc_extract, "n_records"),
        ("datapipe_zip_extract", datapipe_zip_extract, "n_members"),
        ("datapipe_tar_extract", datapipe_tar_extract, "n_members"),
        ("datapipe_tfrecord_scan", datapipe_tfrecord_scan, "n_records"),
        ("datapipe_avro_scan", datapipe_avro_scan, "n_records"),
        ("datapipe_gzip_jsonl_scan", datapipe_gzip_jsonl_scan, "n_lines"),
        ("datapipe_pdf_text_extract", datapipe_pdf_text_extract,
         "n_objects"),
        ("multimodal_mp4_box_walk", multimodal_mp4_box_walk, "n_boxes"),
        ("multimodal_webm_ebml_walk", multimodal_webm_ebml_walk,
         "n_blocks"),
        ("multimodal_ogg_opus_walk", multimodal_ogg_opus_walk,
         "n_pages"),
        ("multimodal_aac_adts_walk", multimodal_aac_adts_walk,
         "n_frames"),
    ]
    times: dict[str, list[tuple[int, float]]] = {}
    for mult in mults:
        out = f"/tmp/osetl-containerprobe-{mult}"
        parts = [
            base.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
            )
            for i in range(mult)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{out}/documents.parquet")
        for qname, fn, count_col in probes:
            t0 = time.time()
            row = fn(spark, out).agg(
                F.count("*"), F.sum(count_col)
            ).first()
            dt = time.time() - t0
            times.setdefault(qname, []).append((mult, dt))
            print(
                f"mult={mult:2d} {qname:24s} {dt:7.2f}s rows={row[0]}",
                flush=True,
            )
        shutil.rmtree(out, ignore_errors=True)
    for qname, series in times.items():
        if len(series) >= 2:
            (n1, t1), (n2, t2) = series[0], series[-1]
            a = math.log(t2 / t1) / math.log(n2 / n1)
            print(f"{qname}: mult {n1} -> {n2}: alpha = {a:.2f}", flush=True)


def similarity_main() -> None:
    """Scale probe for the exact-similarity linear scans
    (`python tools/scale_probe.py similarity [mults]`): grow the
    embeddings corpus with vec_id offsets while PINNING the query
    batch to copy 0's (replicated rows that would land on the
    vec_id % 97 = 0 query stride are dropped, ~1%), so the measured
    curve is scan cost vs corpus size — not the quadratic
    queries x corpus blow-up verbatim replication would manufacture.
    Expected: alpha ~= 1 (one broadcast-batch scored scan per
    ranking); the fitted throughput extrapolates the documented
    exact->ANN handoff in SCALE.md §9g."""
    import math

    from pyspark.sql import functions as F

    from open_source_etl_spark.conf import EngineConfig
    from open_source_etl_spark.operators.llm_similarity import (
        ann_topk_multiquery,
        embed_prefix_topk_overlap,
    )
    from open_source_etl_spark.session import build_session

    mults = [int(m) for m in (sys.argv[2:] or ["1", "5", "25"])]
    spark = build_session(
        EngineConfig(master="local[32]", shuffle_partitions=32)
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = spark.read.parquet(f"{BASE}/embeddings.parquet")
    probes = [
        ("ann_topk_multiquery", ann_topk_multiquery),
        ("embed_prefix_topk_overlap", embed_prefix_topk_overlap),
    ]
    times: dict[str, list[tuple[int, float]]] = {}
    for mult in mults:
        out = f"/tmp/osetl-simprobe-{mult}"
        parts = [base]
        for i in range(1, mult):
            shifted = base.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)
            )
            parts.append(shifted.filter(F.col("vec_id") % 97 != 0))
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
        n_rows = spark.read.parquet(f"{out}/embeddings.parquet").count()
        for qname, fn in probes:
            t0 = time.time()
            row = fn(spark, out).agg(F.count("*")).first()
            dt = time.time() - t0
            times.setdefault(qname, []).append((mult, dt))
            print(
                f"mult={mult:2d} {qname:26s} {dt:7.2f}s "
                f"corpus={n_rows} out_rows={row[0]}",
                flush=True,
            )
        shutil.rmtree(out, ignore_errors=True)
    for qname, series in times.items():
        if len(series) >= 2:
            (n1, t1), (n2, t2) = series[0], series[-1]
            a = math.log(t2 / t1) / math.log(n2 / n1)
            print(f"{qname}: mult {n1} -> {n2}: alpha = {a:.2f}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "iterative":
        iterative_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "pairs":
        pairs_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "shingles":
        shingles_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "dsir":
        dsir_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "containers":
        containers_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "similarity":
        similarity_main()
    else:
        main()
