"""Similarity search over the embeddings fixture (EXT, SURVEY.md §2B):
brute-force cosine top-k, threshold pair mining, IVF-style cell search,
LSH-bucketed ANN.

Scale design:
- embeddings are L2-normalized (fixture property), so cosine ≡ dot
  product; all dot products run as zip_with/aggregate in double precision
  inside codegen — no UDF, no Python;
- brute-force kNN broadcasts the QUERY side (1 row) against the corpus —
  a map-only scan plus a TakeOrdered, the correct exact baseline at any
  scale;
- the quadratic pair miner is blocked (by label here; by LSH bucket in
  the scale path);
- IVF: k-means cells built declaratively (label-mean seeds + Lloyd
  iterations as broadcast-join + grouped-agg rounds), then search only
  the query's nearest cells — the classic inverted-file ANN layout;
- LSH: BucketedRandomProjectionLSH from pyspark.ml — bucket-join
  candidate generation, exact re-rank on candidates only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_compute
from ..registry import query


def dot(a: Column | str, b: Column | str) -> Column:
    """Double-precision dot product of two float arrays, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@query(
    "knn_bruteforce_cosine",
    oracle="""
    WITH q AS (
      SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS o
      FROM embeddings WHERE vec_id = 0 AND len(embedding) > 0
    ), corpus AS (
      SELECT vec_id, label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS o
      FROM embeddings WHERE vec_id <> 0 AND len(embedding) > 0
    )
    SELECT vec_id, label, cosine_sim
    FROM (
      SELECT c.vec_id, c.label,
             ROUND(SUM(CAST(c.v AS DOUBLE) * CAST(q.v AS DOUBLE)), 6) AS cosine_sim
      FROM corpus c JOIN q ON c.o = q.o
      GROUP BY c.vec_id, c.label
    )
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 10
    """,
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors of vec_id=0 (brute-force baseline).

    Query vector broadcast against the corpus scan; dot product in
    double (normalized vectors ⇒ cosine); TakeOrderedAndProject for the
    top-k — no full sort materialized.  Degenerate (empty) vectors are
    excluded on BOTH engines — cosine against a zero-dim vector is
    undefined, and a regenerated fixture must not flip parity
    (tests/test_perturbed_parity.py).
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.size("embedding") > 0)
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "label", F.round(dot("embedding", "qv"), 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), "vec_id")
        .limit(10)
    )


@query(
    "similarity_pairs_threshold",
    oracle="""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE label = 3),
    ex AS (
      SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS o
      FROM sub
    )
    SELECT vec_a, vec_b, cosine_sim
    FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND(SUM(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)), 6) AS cosine_sim
      FROM ex a JOIN ex b ON a.o = b.o AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    )
    WHERE cosine_sim >= 0.35
    ORDER BY vec_a, vec_b
    """,
)
def similarity_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with cosine ≥ 0.35 inside one label block.

    The blocked quadratic form: correct for bounded blocks; the LSH/IVF
    operators below are the sub-quadratic path for unbounded corpora.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("label") == 3)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    sim = F.round(dot("ea", "eb"), 6)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.35)
        .orderBy("vec_a", "vec_b")
    )


def _mean_centroids(assigned: DataFrame, cell_col: str) -> DataFrame:
    """Per-cell mean vectors via posexplode → grouped avg → re-assemble."""
    exploded = assigned.select(cell_col, F.posexplode("embedding").alias("pos", "v"))
    return (
        exploded.groupBy(cell_col, "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy(cell_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            F.col(cell_col).alias("cell"),
            F.transform("pc", lambda s: s.getField("c")).alias("centroid"),
        )
    )


def _assign_cells(emb: DataFrame, centroids: DataFrame, *cols: str) -> DataFrame:
    """Map-only nearest-centroid assignment: the k centroids collapse to a
    single array<struct<cell,centroid>> row, broadcast against the corpus,
    and the argmax runs as ``array_max`` over a ``transform`` that scores
    every centroid — k·d multiply-adds per row inside codegen, ZERO
    shuffle.  (The window-argmax alternative shuffles the full corpus —
    embeddings included — once per Lloyd round; at 100 TB that is the
    entire job cost, while this formulation makes assignment free and
    leaves the mean-recompute as the only exchange.)  Ties break toward
    the smallest cell id via the negated-cell struct field."""
    cent_arr = centroids.agg(
        F.collect_list(F.struct("cell", "centroid")).alias("cents")
    )
    best = F.array_max(
        F.transform(
            "cents",
            lambda c: F.struct(
                dot("embedding", c["centroid"]).alias("s"),
                (-c["cell"]).alias("negc"),
                c["cell"].alias("cell"),
            ),
        )
    )
    return emb.crossJoin(F.broadcast(cent_arr)).select(
        *cols, best["cell"].alias("cell")
    )


def _centroid_means(assigned: DataFrame) -> DataFrame:
    """Per-cell mean vectors in ONE shuffle: ``Summarizer.mean`` aggregates
    ml Vectors with map-side partials (per-partition running sums), vs the
    posexplode formulation's two exchanges of d× row blow-up.  Used on the
    rows-only IVF path; ``_mean_centroids`` stays for the oracle-matched
    label-centroid query."""
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer

    return (
        assigned.select(
            "cell", array_to_vector(F.col("embedding").cast("array<double>")).alias("v")
        )
        .groupBy("cell")
        .agg(Summarizer.mean(F.col("v")).alias("m"))
        .select("cell", vector_to_array("m").alias("centroid"))
    )


def _ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with declarative k-means: label-mean seeds → 2 Lloyd
    iterations (map-only broadcast argmax assign, one-shuffle mean
    recompute) → probe the query's 4 nearest cells → exact re-rank inside
    the probed cells.

    Each Lloyd step is one broadcast of k centroids (corpus side is
    map-only, see ``_assign_cells``) plus one vector-mean aggregation —
    the iterative-algorithm pattern on DataFrames with the driver only
    orchestrating, never holding data.  In a deployment the index build
    is offline and the probe reads one cell partition.

    Deliberately NOT ``load_table_compute``: ``emb`` appears four times
    in the plan (seed, two Lloyd rounds, final assign), so a widening
    repartition would be re-planned into four cold shuffles — measured
    net-slower than the narrow scan despite better per-stage width.

    Empty vectors are excluded up front: ``Summarizer.mean`` requires a
    consistent vector dimension and a zero-dim vector has no cell.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.size("embedding") > 0)
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))

    # seed cells from the label column; refine with 2 Lloyd iterations
    centroids = _centroid_means(
        emb.select(F.col("label").alias("cell"), "embedding")
    )
    for _ in range(2):
        assigned = _assign_cells(emb, centroids, "embedding")
        # k-row frame: localCheckpoint materializes each round eagerly so
        # the probe AND the final assignment below reuse it instead of
        # each replaying the whole Lloyd chain from the scan
        centroids = _centroid_means(assigned).localCheckpoint()

    # probe: 4 nearest refined cells to the query (nprobe is the IVF
    # recall/cost dial: 4 of ~10 cells lifts recall@10 from ~0.3-0.4 to
    # ~0.5-0.8 vs brute force on these weakly-clustered synthetic
    # embeddings while still skipping 60% of the corpus; recall is
    # bounded by probed mass when the space doesn't cluster, and a
    # deployment tunes nprobe against its own recall target —
    # tests/test_ann_quality.py pins the floor)
    probed = (
        centroids.crossJoin(F.broadcast(qv))
        .select("cell", dot("centroid", "qv").alias("cell_sim"))
        .orderBy(F.col("cell_sim").desc())
        .limit(4)
    )
    # final assignment of corpus vectors to refined cells, probe + re-rank
    final_cells = _assign_cells(emb, centroids, "vec_id", "label", "embedding")
    return (
        final_cells.join(F.broadcast(probed), "cell")
        .crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "label", F.round(dot("embedding", "qv"), 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), "vec_id")
        .limit(10)
    )


def _recall_summary(
    approx_ids: DataFrame, exact_ids: DataFrame, extra_cols: list, floor_pct: int
) -> DataFrame:
    """One-row recall@k pin: |approx ∩ exact| vs the exact top-k, met
    when 100·hits ≥ floor_pct·n_exact (integer arithmetic, no float
    thresholding).  A degenerate fixture with an empty exact set counts
    as met — there is nothing to recall."""
    stats = exact_ids.agg(F.count("*").alias("n_exact")).crossJoin(
        exact_ids.join(approx_ids, "vec_id").agg(F.count("*").alias("n_hits"))
    )
    met = (F.col("n_exact") == 0) | (
        F.col("n_hits") * 100 >= F.lit(floor_pct) * F.col("n_exact")
    )
    return stats.select(*extra_cols, met.alias("recall_floor_met"))


@query(
    "ann_ivf_search",
    oracle="""
    SELECT 10 AS k, 4 AS n_probe, CAST(0.4 AS DOUBLE) AS recall_floor,
           TRUE AS recall_floor_met
    """,
)
def ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN recall@10 pin (VERDICT r4 item 2): runs the full IVF
    pipeline (``_ivf_topk`` — k-means cells, 4-cell probe, exact
    re-rank) AND the exact brute-force twin, and emits a one-row
    summary asserting recall@10 ≥ 0.4 against ``knn_bruteforce_cosine``.
    The driver hash-checks the assertion: a refactor that guts centroid
    quality (recall collapses toward the ~0.4 random-probed-mass
    floor... below it) flips ``recall_floor_met`` and fails the round.
    The floor matches tests/test_ann_quality.py (measured 0.5-0.8 on
    these weakly-clustered synthetic embeddings).  The neighbor list
    itself stays engine-specific (centroid math), hence the pin rather
    than a row-set oracle.
    """
    ivf = _ivf_topk(spark, sf_dir).select("vec_id")
    exact = knn_bruteforce_cosine(spark, sf_dir).select("vec_id")
    return _recall_summary(
        ivf,
        exact,
        [
            F.lit(10).alias("k"),
            F.lit(4).alias("n_probe"),
            F.lit(0.4).alias("recall_floor"),
        ],
        40,
    )


def _lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection LSH ANN via pyspark.ml (seeded): bucket the
    corpus, approxNearestNeighbors for the query vector.

    Candidate generation is a bucket equi-join (linear); only candidates
    pay the exact distance.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = (
        load_table(spark, sf_dir, "embeddings")
        # zero-dim vectors crash the BLAS projection (DGEMV) and carry no
        # similarity signal — excluded like every other similarity op
        .filter(F.size("embedding") > 0)
        .withColumn(
            "features", array_to_vector(F.col("embedding").cast("array<double>"))
        )
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", numHashTables=4, bucketLength=0.5, seed=42
    )
    model = lsh.fit(emb)
    key_row = emb.filter(F.col("vec_id") == 0).select("features").first()
    if key_row is None:  # query vector degenerate in this fixture drop
        return emb.select(
            "vec_id", "label", F.lit(0.0).alias("euclidean_dist")
        ).limit(0)
    neighbors = model.approxNearestNeighbors(
        emb.filter(F.col("vec_id") != 0), key_row["features"], 10
    )
    return neighbors.select(
        "vec_id", "label", F.round(F.col("distCol"), 6).alias("euclidean_dist")
    ).orderBy("euclidean_dist", "vec_id")


@query(
    "retrieval_rrf_fusion",
    # Reciprocal Rank Fusion over two retrieval lists: the lexical
    # top-15 (BM25, the text_bm25_retrieval scorer) and the vector
    # top-15 (exact cosine vs vec 0, the knn baseline).  Ranks come
    # from ROUNDED scores with id tiebreaks, so they are integers on
    # both engines; the fused score 1/(60+r_a) + 1/(60+r_b) rounds
    # at 6dp for the final EXACT row-set comparison.
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1
    ), stats AS (
      SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM tok
      WHERE tok IN ('spark', 'join', 'vector')
      GROUP BY 1, 2
    ), df AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1
    ), bm25 AS (
      SELECT tf.doc_id AS doc_id, ROUND(SUM(
               LN(1 + (n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))
             ), 6) AS s
      FROM tf JOIN df ON tf.tok = df.tok
      JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
      GROUP BY tf.doc_id
    ), lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
      FROM bm25 QUALIFY r <= 15
    ), q AS (
      SELECT unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS o
      FROM embeddings WHERE vec_id = 0 AND len(embedding) > 0
    ), cos AS (
      SELECT c.vec_id AS doc_id,
             ROUND(SUM(CAST(c.v AS DOUBLE) * CAST(q.v AS DOUBLE)), 6)
               AS s
      FROM (
        SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS o
        FROM embeddings WHERE vec_id <> 0 AND len(embedding) > 0
      ) c JOIN q ON c.o = q.o
      GROUP BY c.vec_id
    ), vec AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
      FROM cos QUALIFY r <= 15
    )
    SELECT doc_id,
           ROUND(COALESCE(1.0 / (60 + lex.r), 0)
                 + COALESCE(1.0 / (60 + vec.r), 0), 6) AS rrf,
           CAST(COALESCE(lex.r, 0) AS BIGINT) AS lex_rank,
           CAST(COALESCE(vec.r, 0) AS BIGINT) AS vec_rank
    FROM lex FULL JOIN vec USING (doc_id)
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """,
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion — the standard hybrid-retrieval merge
    every RAG stack runs between its lexical and vector indexes:
    take the BM25 top-15 (the text_bm25_retrieval scorer over a
    fixed query) and the exact-cosine top-15 (vs vec 0), and fuse by
    score(d) = sum over lists of 1/(60 + rank_d) — rank-based, so
    incomparable score scales never need calibration.  Ranks come
    from rounded scores with deterministic tiebreaks, making the
    fused top-10 an EXACT row-set oracle.  Scale: both input lists
    are top-k (tiny); the fusion is a broadcast-sized full join —
    the expensive parts are the upstream retrievals this query
    shares with their standalone operators."""
    from .llm_text import text_bm25_retrieval

    w = Window.orderBy(F.col("s").desc(), "doc_id")
    lex = (
        text_bm25_retrieval(spark, sf_dir)
        .withColumnRenamed("bm25", "s")
        .select("doc_id", F.row_number().over(w).alias("lex_r"))
    )
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.size("embedding") > 0
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    cos = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(dot("embedding", "qv"), 6).alias("s"),
        )
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(15)
        .select("doc_id", F.row_number().over(w).alias("vec_r"))
    )
    fused = (
        lex.join(cos, "doc_id", "full")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (60 + F.col("lex_r")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("vec_r")), F.lit(0.0)),
                6,
            ).alias("rrf"),
            F.coalesce("lex_r", F.lit(0)).cast("long").alias("lex_rank"),
            F.coalesce("vec_r", F.lit(0)).cast("long").alias("vec_rank"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(10)


@query(
    "ann_hamming_binarized",
    # both engines binarize identically (bit i set iff dim i > 0,
    # packed into two 32-bit words inside signed bigints) and Hamming
    # distance is pure integer bit_count(xor) — an EXACT row-set
    # oracle, unlike the k-means-based ANN pins
    oracle="""
    WITH bits AS (
      SELECT vec_id, label,
             SUM(CASE WHEN o <= 32 AND v > 0
                      THEN (CAST(1 AS BIGINT) << (o - 1)) ELSE 0
                 END) AS lo,
             SUM(CASE WHEN o > 32 AND v > 0
                      THEN (CAST(1 AS BIGINT) << (o - 33)) ELSE 0
                 END) AS hi
      FROM (
        SELECT vec_id, label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS o
        FROM embeddings WHERE len(embedding) = 64
      )
      GROUP BY vec_id, label
    ),
    q AS (SELECT lo AS qlo, hi AS qhi FROM bits WHERE vec_id = 0)
    SELECT b.vec_id, b.label,
           CAST(bit_count(xor(b.lo, qlo)) + bit_count(xor(b.hi, qhi))
                AS BIGINT) AS hamming
    FROM bits b, q
    WHERE b.vec_id <> 0
    ORDER BY hamming, b.vec_id
    LIMIT 10
    """,
)
def ann_hamming_binarized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binarized (sign-bit) embedding search — the 32x compression
    trick billion-scale retrieval stacks use for first-stage
    candidate generation: each 64-dim vector packs into 64 sign bits
    (two 32-bit words held in bigints, built JVM-side by one
    ``aggregate`` over the dims — no UDF), and neighbor ranking is
    pure integer ``bit_count(xor)`` Hamming distance against the
    query's code.  Top-10 by distance with deterministic vec_id
    tie-breaks, so the DuckDB oracle checks the EXACT row set — no
    recall pin needed.  At 100 TB the code column is 8 bytes/vector,
    the scan is bitwise ops inside codegen, and the full-width
    embeddings are touched only by the (separate) re-rank stage."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.size("embedding") == 64
    )

    def pack(lo_dim: int) -> Column:
        # Horner form over DESCENDING dims: acc*2 + sign bit — no
        # per-element shift amount needed (shiftleft takes a literal)
        return F.aggregate(
            F.sequence(F.lit(31), F.lit(0), F.lit(-1)),
            F.lit(0).cast("long"),
            lambda acc, i: acc * 2
            + F.when(
                F.element_at("embedding", i + lo_dim + 1) > 0, 1
            ).otherwise(0).cast("long"),
        )

    bits = emb.select(
        "vec_id", "label",
        pack(0).alias("lo"), pack(32).alias("hi"),
    )
    q = bits.filter(F.col("vec_id") == 0).select(
        F.col("lo").alias("qlo"), F.col("hi").alias("qhi")
    )
    return (
        bits.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", "label",
            (
                F.bit_count(F.col("lo").bitwiseXOR(F.col("qlo")))
                + F.bit_count(F.col("hi").bitwiseXOR(F.col("qhi")))
            ).cast("long").alias("hamming"),
        )
        .orderBy("hamming", "vec_id")
        .limit(10)
    )


def _pq_subrows(emb: DataFrame, m: int, sub_d: int) -> DataFrame:
    """(vec_id, sub, subvec) rows: each vector split into m
    contiguous subspaces of sub_d dims — one narrow explode, no
    shuffle."""
    subs = F.array(*[
        F.struct(
            F.lit(s).alias("sub"),
            F.slice("embedding", s * sub_d + 1, sub_d).alias("subvec"),
        )
        for s in range(m)
    ])
    return emb.select(
        "vec_id", F.explode(subs).alias("sp")
    ).select("vec_id", "sp.sub", "sp.subvec")


def _pq_assign(subrows: DataFrame, codebook: DataFrame) -> DataFrame:
    """Map-only nearest-codeword assignment per subspace: the m*ksub
    codewords collapse to one broadcast row of per-sub struct arrays;
    the L2 argmin runs as array_max over 2*dot(x,c) - dot(c,c)
    (dot(x,x) is constant per row) inside codegen — zero shuffle."""
    cents = codebook.groupBy("sub").agg(
        F.collect_list(
            F.struct(
                "cell", "centroid",
                dot("centroid", "centroid").alias("cc"),
            )
        ).alias("cents")
    )
    best = F.array_max(
        F.transform(
            "cents",
            lambda c: F.struct(
                (2 * dot("subvec", c["centroid"]) - c["cc"]).alias("s"),
                (-c["cell"]).alias("negc"),
                c["cell"].alias("cell"),
            ),
        )
    )
    return subrows.join(F.broadcast(cents), "sub").select(
        "vec_id", "sub", "subvec", best["cell"].alias("cell")
    )


def _pq_centroid_means(assigned: DataFrame) -> DataFrame:
    """Per-(sub, cell) mean subvectors in ONE shuffle (the
    ``_centroid_means`` Summarizer pattern keyed by subspace too)."""
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer

    return (
        assigned.select(
            "sub", "cell",
            array_to_vector(
                F.col("subvec").cast("array<double>")
            ).alias("v"),
        )
        .groupBy("sub", "cell")
        .agg(Summarizer.mean(F.col("v")).alias("m"))
        .select("sub", "cell", vector_to_array("m").alias("centroid"))
    )


def _pq_topk(
    spark: SparkSession, sf_dir: str, m: int = 8, ksub: int = 16,
    n_candidates: int | None = None,
) -> DataFrame:
    """Product-quantization ANN — THE embedding-compression standard
    for billion-vector stores: each vector's m subspaces quantize to
    one of ksub codewords (here 8x 8-dim subspaces, 16 codewords:
    64 floats -> 8 four-bit codes, a 64x compression), queries score the
    WHOLE corpus through an asymmetric-distance (ADC) table of just
    m*ksub query-codeword dot products, and the top candidates
    re-rank exactly.

    Declarative k-means per subspace: vec_id %% ksub seeds -> 2 Lloyd
    rounds, each a broadcast-argmin assignment (zero shuffle) plus
    one (sub, cell) mean aggregation.  The ADC scan is a broadcast
    hash join of the 4-row-per-vector code table against the
    m*ksub-row query table, then one sum per vec_id — no full-width
    embedding ever moves after encoding.  At 100 TB the codebook
    trains on a sample offline, codes are a bytes-per-vector column,
    and the ADC scan touches ONLY the code column — the point of PQ."""
    sub_d = 64 // m
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.size("embedding") == 64
    )
    # one materialization of the subvector explode: it feeds the seed
    # means, BOTH Lloyd rounds, and the final code assignment — without
    # it each consumer re-runs the scan + explode (4 full passes).  The
    # exploded form carries the same bytes as the input vectors (m
    # sub_d-dim slices of each 64-dim embedding), so the cache is
    # corpus-sized, not corpus-multiplied; at 100 TB the codebook
    # trains on a sample offline (docstring) and only the single
    # code-assignment pass touches the full corpus.
    # persist + the count below (r15, VERDICT r14 item 2): the eager
    # localCheckpoint was a BLOCKING job on top of the count's job —
    # persist materializes lazily inside the count the candidate
    # budget needs anyway (one job, not two), and keeps lineage for
    # executor-loss recovery (the ADVICE r14 cluster-safety note).
    # Alternating in-session A/B/C at sf0.1 (4 rounds each):
    # lazy 4-pass min 3.63 / persist min 3.08 / eager-ckpt min 2.96,
    # means 4.9 / 3.9 / 4.7 — persist wins the mean and ties the min
    # while doing strictly less work (no second blocking job).
    from pyspark import StorageLevel

    subrows = _pq_subrows(emb, m, sub_d).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if n_candidates is None:
        # re-rank budget scales with the corpus (12.5%, min 100): ADC
        # ordering is a pruning dial, and a fixed candidate count
        # would silently shrink the probed fraction as corpora grow.
        # On these WEAKLY-CLUSTERED synthetic embeddings recall is
        # largely bounded by probed mass (the IVF query documents the
        # same property); a deployment tunes the fraction against its
        # own recall target on real, clusterable vectors.  subrows
        # carries exactly m rows per vector, so the corpus size is a
        # cheap count over the materialized checkpoint — not a second
        # parquet scan of the embedding column.
        n_candidates = max(100, subrows.count() // m // 8)
    # seed codewords from a pure hash of vec_id, then 2 Lloyd rounds.
    # ONE materialization at the end of the chain: the intermediate
    # per-round checkpoints each cost a blocking job; the final
    # codebook is what both downstream consumers (code assignment and
    # the ADC table) reuse, and the full chain from the materialized
    # subrows is 3 mean-shuffles + 2 broadcast assigns computed once.
    codebook = _pq_centroid_means(
        subrows.withColumn("cell", F.col("vec_id") % ksub)
    )
    for _ in range(2):
        codebook = _pq_centroid_means(_pq_assign(subrows, codebook))
    codebook = codebook.localCheckpoint(eager=True)
    codes = _pq_assign(subrows, codebook).select("vec_id", "sub", "cell")
    # ADC table: the query's per-subspace dot with every codeword
    qsub = _pq_subrows(
        emb.filter(F.col("vec_id") == 0), m, sub_d
    ).select("sub", F.col("subvec").alias("qsub"))
    adc = codebook.join(F.broadcast(qsub), "sub").select(
        "sub", "cell", dot("centroid", "qsub").alias("part")
    )
    candidates = (
        codes.join(F.broadcast(adc), ["sub", "cell"])
        .groupBy("vec_id")
        .agg(F.sum("part").alias("adc_score"))
        .filter(F.col("vec_id") != 0)
        .orderBy(F.col("adc_score").desc(), "vec_id")
        .limit(n_candidates)
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    return (
        emb.join(F.broadcast(candidates.select("vec_id")), "vec_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", "label",
            F.round(dot("embedding", "qv"), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), "vec_id")
        .limit(10)
    )


@query(
    "ann_pq_search",
    oracle="""
    SELECT 10 AS k, 8 AS m_subspaces, 16 AS codewords,
           CAST(0.5 AS DOUBLE) AS recall_floor, TRUE AS recall_floor_met
    """,
)
def ann_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN recall@10 pin (the ann_ivf_search
    pattern): runs the full PQ pipeline (``_pq_topk`` — per-subspace
    k-means codebooks, 8 four-bit codes per vector, the
    asymmetric-distance scan over codes only, then an exact re-rank
    of the top 12.5% of the corpus — min 100 — by ADC score, so the
    re-rank budget grows with scale) AND the exact
    brute-force twin on the same fixed-dimension corpus, emitting a
    one-row summary asserting recall@10 >= 0.5.  The driver
    hash-checks the assertion: a refactor that guts codebook fidelity
    (ADC ordering collapses toward random) flips recall_floor_met and
    fails the round.  Measured 0.7-0.9 across scale factors on these
    synthetic embeddings (tests/test_ann_quality.py pins the same
    floor); the neighbor list itself stays engine-specific (codebook
    math), hence the pin rather than a row-set oracle."""
    emb64 = load_table(spark, sf_dir, "embeddings").filter(
        F.size("embedding") == 64
    )
    exact = emb64.filter(F.col("vec_id") != 0)
    qv = emb64.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    exact_top = (
        exact.crossJoin(F.broadcast(qv))
        .select("vec_id", dot("embedding", "qv").alias("s"))
        .orderBy(F.col("s").desc(), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    pq = _pq_topk(spark, sf_dir).select("vec_id")
    return _recall_summary(
        pq,
        exact_top,
        [
            F.lit(10).alias("k"),
            F.lit(8).alias("m_subspaces"),
            F.lit(16).alias("codewords"),
            F.lit(0.5).alias("recall_floor"),
        ],
        50,
    )


@query(
    "ann_lsh_bucketed",
    oracle="""
    SELECT 10 AS k, 4 AS n_hash_tables, CAST(0.7 AS DOUBLE) AS recall_floor,
           TRUE AS recall_floor_met
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN recall@10 pin (VERDICT r4 item 2): runs the seeded
    random-projection LSH search (``_lsh_topk``) and the exact
    brute-force twin, and emits a one-row summary asserting
    recall@10 ≥ 0.7 vs ``knn_bruteforce_cosine`` (euclidean and cosine
    rank identically on the L2-normalized fixture).  Floor matches
    tests/test_ann_quality.py (measured 0.9-1.0); the bucket family is
    engine-specific, hence the pin rather than a row-set oracle.
    """
    lsh = _lsh_topk(spark, sf_dir).select("vec_id")
    exact = knn_bruteforce_cosine(spark, sf_dir).select("vec_id")
    return _recall_summary(
        lsh,
        exact,
        [
            F.lit(10).alias("k"),
            F.lit(4).alias("n_hash_tables"),
            F.lit(0.7).alias("recall_floor"),
        ],
        70,
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS o
      FROM embeddings
    )
    SELECT COUNT(*) AS n_near_dup_pairs
    FROM (
      SELECT a.vec_id, b.vec_id AS vec_b,
             SUM(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS s
      FROM ex a JOIN ex b
        ON a.o = b.o AND a.label = b.label AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    )
    WHERE s >= 0.5
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup count: pairs with cosine ≥ 0.5 within a
    label block (the semantic-dedup criterion over the whole corpus)."""
    emb = load_table_compute(spark, sf_dir, "embeddings")
    a = emb.select("label", F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = emb.select(
        F.col("label").alias("lb"), F.col("vec_id").alias("vb"), F.col("embedding").alias("eb")
    )
    return (
        a.join(b, (F.col("label") == F.col("lb")) & (F.col("va") < F.col("vb")))
        .filter(dot("ea", "eb") >= 0.5)
        .agg(F.count("*").alias("n_near_dup_pairs"))
    )


@query(
    "embed_label_centroids",
    oracle="""
    SELECT label, CAST(o - 1 AS INT) AS dim,
           ROUND(AVG(CAST(v AS DOUBLE)), 6) AS centroid_component,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM (
      SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS o
      FROM embeddings
    )
    WHERE o <= 8
    GROUP BY label, o
    ORDER BY label, dim
    """,
)
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (first 8 dims shown): posexplode to
    (label, dim, component), then a plain grouped mean — the distributed
    centroid step of k-means/IVF training.  Partial aggregation shrinks
    the exploded stream map-side, so the shuffle carries |labels|·|dims|
    rows, not |vectors|·|dims|."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).filter(F.col("dim") < 8)
    return (
        exploded.groupBy("label", F.col("dim").cast("int").alias("dim"))
        .agg(
            F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_component"),
            F.count("*").cast("bigint").alias("n_vectors"),
        )
        .orderBy("label", "dim")
    )


@query(
    "embed_quantize_int8",
    # FLOOR(x + 0.5) instead of ROUND: floor on the binary double is
    # engine-identical, Spark/DuckDB ROUND are not (parity.py)
    oracle="""
    WITH scaled AS (
      SELECT vec_id, label,
        127.0 / list_max(list_transform(embedding,
                                        x -> abs(CAST(x AS DOUBLE)))) AS scale,
        embedding
      FROM embeddings
      WHERE len(embedding) > 0
    ), q AS (
      SELECT vec_id, label, scale,
        list_transform(embedding,
                       x -> CAST(FLOOR(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)) AS qv
      FROM scaled
    )
    SELECT vec_id, label, ROUND(scale, 6) AS scale_r,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(list_max(qv) AS BIGINT) AS q_max,
           CAST(list_sum(qv) AS BIGINT) AS q_sum
    FROM q
    ORDER BY vec_id
    """,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (the storage
    shrink before ANN serving): per-vector scale = 127/max|x|, components
    quantized via FLOOR(x·scale + 0.5).  All array math is JVM-side
    higher-order functions; the scale materializes as a column BEFORE the
    transform() lambda (transform bodies are not CSE'd).  Empty vectors
    are unquantizable (scale = 127/max|x| has no max) and are excluded
    identically on both engines."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.size("embedding") > 0)
    scaled = emb.withColumn(
        "scale",
        F.lit(127.0)
        / F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))),
    )
    q = scaled.withColumn(
        "qv",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.col("scale") + 0.5).cast("bigint"),
        ),
    )
    return (
        q.select(
            "vec_id",
            "label",
            F.round("scale", 6).alias("scale_r"),
            F.array_min("qv").cast("bigint").alias("q_min"),
            F.array_max("qv").cast("bigint").alias("q_max"),
            F.aggregate("qv", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        )
        .orderBy("vec_id")
    )


@query(
    "dedup_semantic_prune",
    oracle="""
    WITH nonempty AS (
      SELECT * FROM embeddings WHERE len(embedding) > 0
    ), dims AS (
      SELECT label, o, AVG(CAST(v AS DOUBLE)) AS c
      FROM (SELECT label, unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS o
            FROM nonempty)
      GROUP BY label, o
    ), cent AS (
      SELECT label, list(c ORDER BY o) AS centroid FROM dims GROUP BY label
    ), scored AS (
      SELECT e.label,
             ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          c.centroid), 6) AS cos_r
      FROM nonempty e JOIN cent c USING (label)
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN cos_r >= 0.25 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pruned
    FROM scored
    GROUP BY label
    ORDER BY label
    """,
)
def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, SemDeDup-style: cluster the corpus (the label
    column stands in for the k-means step, which ann_ivf_search builds
    for real), take each cluster's centroid, and prune vectors whose
    cosine to their centroid exceeds the redundancy threshold — the
    "too close to the cluster's semantic center to add information"
    criterion used to thin web-scale pretraining corpora.

    Scale shape: centroids are one grouped avg over the posexploded
    stream (shuffle carries |labels|·|dims| partials), then broadcast
    back — the corpus is scanned twice, never self-joined, so cost is
    linear where pairwise semantic dedup (dedup_embedding_cosine) is
    quadratic per block.  Cosines round to 6 before the threshold so the
    cross-engine flag can't flip on accumulation noise (threshold margin
    verified >= 1e-5 at every fixture SF vs ~1e-7 engine drift; per-value
    min/max cosines are deliberately NOT reported — a min sitting on a
    rounding boundary DID flip between engines).  Empty vectors are
    excluded before both the centroid build and the scoring pass
    (cosine to a zero-dim vector is undefined; DuckDB's
    list_cosine_similarity errors on it)."""
    emb = load_table_compute(spark, sf_dir, "embeddings").filter(
        F.size("embedding") > 0
    )
    cent = _mean_centroids(
        emb.select(F.col("label").alias("lbl"), "embedding"), "lbl"
    ).select(F.col("cell").alias("label"), "centroid")
    cos = dot("embedding", "centroid") / (
        F.sqrt(dot("embedding", "embedding")) * F.sqrt(dot("centroid", "centroid"))
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "label", F.round(cos, 6).alias("cos_r")
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.sum(F.when(F.col("cos_r") >= 0.25, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pruned"),
        )
        .orderBy("label")
    )


@query(
    "embed_covariance_block",
    oracle="""
    SELECT t1.i AS i, t2.j AS j,
           ROUND(covar_samp(e.embedding[t1.i + 1], e.embedding[t2.j + 1]), 6) AS cov
    FROM embeddings e, range(8) t1(i), range(8) t2(j)
    GROUP BY t1.i, t2.j
    ORDER BY i, j
    """,
)
def embed_covariance_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance matrix of the first 8 embedding dimensions, as (i, j,
    cov) rows — the feature-correlation profile behind whitening /
    dimensionality-reduction decisions on an embedding corpus.

    Built with CHAINED GENERATORS, not a self-join: posexplode the
    truncated vector to (i, xi) while carrying the array, then explode
    again to (j, xj) — the d² fan-out happens map-side inside codegen and
    the single shuffle carries 64 Welford accumulators, never the
    vectors.  Contrast with joining the exploded table to itself on
    vec_id, which would shuffle the corpus twice and blow up the join.
    At 100 TB: fan-out is d² per row (bounded by the block size, here 8),
    and covar_samp composes across partitions like any moment aggregate.
    """
    emb = load_table_compute(spark, sf_dir, "embeddings")
    head8 = F.slice(F.col("embedding"), 1, 8)
    step1 = emb.select(
        F.posexplode(head8).alias("i", "xi"), head8.alias("h8")
    )
    step2 = step1.select("i", "xi", F.posexplode("h8").alias("j", "xj"))
    return (
        step2.groupBy("i", "j")
        .agg(
            F.round(
                F.covar_samp(F.col("xi").cast("double"), F.col("xj").cast("double")), 6
            ).alias("cov")
        )
        .orderBy("i", "j")
    )


def _pca_power_oracle(rounds: int = 8) -> str:
    """DuckDB twin of embed_pca_power: the identical deterministic
    computation — Gram matrix G = X^T X over the modal-width vectors,
    ``rounds`` power iterations from the all-ones start with L2
    normalization, Rayleigh quotient / n — unrolled as chained CTEs.
    Iterative linear algebra IS ANSI-SQL-expressible when the iteration
    count is fixed and the state (a d-vector) is a relation."""
    steps = []
    prev = "v0"
    for t in range(1, rounds + 1):
        steps.append(
            f"u{t} AS MATERIALIZED (SELECT g.i, SUM(g.val * p.x) AS x FROM g "
            f"JOIN {prev} p ON g.j = p.i GROUP BY g.i), "
            f"v{t} AS MATERIALIZED (SELECT i, x / SQRT((SELECT SUM(x*x) FROM u{t})) AS x "
            f"FROM u{t})"
        )
        prev = f"v{t}"
    return f"""
    WITH modal AS (
      SELECT len(embedding) AS d FROM embeddings WHERE len(embedding) > 0
      GROUP BY 1 ORDER BY count(*) DESC, d DESC LIMIT 1
    ),
    ex AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS o
      FROM embeddings WHERE len(embedding) = (SELECT d FROM modal)
    ),
    g AS MATERIALIZED (
      SELECT a.o AS i, b.o AS j, SUM(a.v * b.v) AS val
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id
      GROUP BY a.o, b.o
    ),
    v0 AS (SELECT DISTINCT i, 1.0 AS x FROM g),
    {', '.join(steps)},
    gv AS (SELECT g.i, SUM(g.val * p.x) AS x FROM g
           JOIN {prev} p ON g.j = p.i GROUP BY g.i),
    ray AS (
      SELECT SUM(p.x * gv.x) / (SELECT COUNT(DISTINCT vec_id) FROM ex) AS lam
      FROM {prev} p JOIN gv ON p.i = gv.i
    )
    SELECT CAST(i - 1 AS INT) AS dim, ROUND(x, 6) AS component,
           ROUND((SELECT lam FROM ray), 4) AS eigenvalue
    FROM {prev} WHERE i <= 8 ORDER BY dim
    """


@query("embed_pca_power", oracle=_pca_power_oracle())
def embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (uncentered) embedding corpus by
    POWER ITERATION on a one-pass d x d Gram matrix: a single
    distributed scan accumulates G = X^T X as Arrow-batched numpy
    partials (d^2 = 4096 doubles per partition), partials tree-reduce
    in-engine, and the 8 power rounds run driver-side on the 32 KB G —
    so 100 TB is read ONCE, not once per round.  Deterministic all-ones
    start; differentially checked against the IDENTICAL numpy iteration
    in ``tests/test_ann_quality.py`` (the fixture's spectrum is nearly
    flat, so the test pins the computation, not eigen-convergence, plus
    Rayleigh-quotient bounds).  For d large enough that d^2 partials
    stop being small (d >~ 4096, G = 128 MB+), the engine reverts to
    Gram-free distributed rounds (broadcast-literal v, d sum
    accumulators per pass) at one scan per round.

    Value-checked by the driver since round 5: the iteration count is
    fixed and the state is a d-vector relation, so the WHOLE computation
    (modal-width Gram, 8 normalized power rounds, Rayleigh quotient)
    unrolls to chained CTEs in DuckDB (``_pca_power_oracle``).  Output:
    one row per leading dimension (first 8) of v plus the Rayleigh-
    quotient eigenvalue estimate.
    """
    emb = load_table_compute(spark, sf_dir, "embeddings").select("embedding")
    # ONE distributed pass builds the d x d Gram matrix G = X^T X as
    # Arrow-batched numpy partials per partition (the vectorized-linear-
    # algebra case pandas kernels exist for); partials reduce Spark-side
    # (posexplode + grouped sum), so the driver receives exactly d^2
    # doubles (32 KB at d=64) regardless of partition count.  All 8
    # power rounds then run on the driver against the tiny G — O(d^2)
    # each, microseconds.  Versus iterating distributed passes, this is
    # 1 scan of 100 TB instead of 9.  The in-engine multi-pass variant
    # (broadcast-literal v, d sum accumulators per round) remains the
    # stated path when d^2 partials stop being small (d >~ 4096).
    #
    # The vector width is NOT hardcoded: each partition accumulates one
    # partial PER DISTINCT WIDTH it sees (a regenerated fixture may change
    # d, and degenerate empty/off-width vectors must not poison the numpy
    # batch into a ragged object array), and the driver keeps the width
    # carrying the most vectors — width detection costs zero extra scans.
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    def gram_partial(batches):
        import numpy as np
        import pandas as pd

        acc: dict[int, list] = {}  # width -> [G, n]
        for pdf in batches:
            if not len(pdf):
                continue
            widths = pdf["embedding"].map(len)
            for w in widths.unique():
                if w == 0:
                    continue
                X = np.array(
                    pdf["embedding"][widths == w].tolist(), dtype=np.float64
                )
                if w not in acc:
                    acc[w] = [np.zeros((w, w)), 0]
                acc[w][0] += X.T @ X
                acc[w][1] += len(X)
        yield pd.DataFrame(
            {
                "d": [int(w) for w in acc],
                "g": [G.ravel().tolist() for G, _ in acc.values()],
                "n": [n for _, n in acc.values()],
            }
        )

    schema = StructType(
        [
            StructField("d", IntegerType()),
            StructField("g", ArrayType(DoubleType())),
            StructField("n", LongType()),
        ]
    )
    reduced = (
        emb.mapInPandas(gram_partial, schema)
        .select("d", "n", F.posexplode("g").alias("idx", "val"))
        .groupBy("d", "idx")
        .agg(
            F.sum("val").alias("s"),
            F.sum(F.when(F.col("idx") == 0, F.col("n"))).alias("n"),
        )
        .collect()
    )
    if not reduced:  # empty or all-degenerate corpus
        return spark.createDataFrame(
            [], "dim int, component double, eigenvalue double"
        )
    counts: dict[int, int] = {}
    for r in reduced:
        if r["idx"] == 0:
            counts[r["d"]] = counts.get(r["d"], 0) + r["n"]
    d = max(counts, key=lambda w: (counts[w], w))  # modal width, ties → larger
    flat = [0.0] * (d * d)
    n_rows = counts[d]
    for r in reduced:
        if r["d"] == d:
            flat[r["idx"]] = r["s"]
    G = [flat[i * d : (i + 1) * d] for i in range(d)]
    v = [1.0] * d
    for _ in range(8):
        vec = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
        norm = sum(x * x for x in vec) ** 0.5
        v = [x / norm for x in vec]
    # Rayleigh quotient lambda = v^T G v / n == sum((x.v)^2) / n
    gv = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
    ray = sum(v[i] * gv[i] for i in range(d)) / n_rows
    spark_rows = [(i, round(float(v[i]), 6)) for i in range(min(8, d))]
    out = spark.createDataFrame(spark_rows, "dim int, component double")
    return out.withColumn("eigenvalue", F.round(F.lit(float(ray)), 4)).orderBy("dim")


@query(
    "ann_topk_multiquery",
    oracle="""
    WITH q AS (
      SELECT vec_id AS qid, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS o
      FROM embeddings WHERE vec_id % 97 = 0 AND len(embedding) > 0
    ), c AS (
      SELECT vec_id, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS o
      FROM embeddings WHERE vec_id % 97 <> 0 AND len(embedding) > 0
    ), s AS (
      SELECT q.qid, c.vec_id,
             ROUND(SUM(CAST(c.v AS DOUBLE) * CAST(q.v AS DOUBLE)), 6)
               AS cosine_sim
      FROM c JOIN q ON c.o = q.o
      GROUP BY q.qid, c.vec_id
    )
    SELECT qid AS query_id, vec_id, cosine_sim, rk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cosine_sim DESC, vec_id
      ) AS rk FROM s
    )
    WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def ann_topk_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact top-k: EVERY query vector (vec_id % 97 = 0) against
    the corpus in one pass — the evaluation-harness shape (recall@k
    needs exact neighbors for a query batch, not one probe).

    The query batch broadcasts (it is small by construction — eval sets
    are), the corpus streams map-side through a codegen dot product per
    (row, query), and the only shuffle is the per-query top-k window on
    query_id.  At 100 TB the corpus side never shuffles; a query batch
    too big to broadcast degrades to a shuffle join, not an OOM.  Ranks
    are computed on the ROUNDED similarity in both engines so
    float-associativity noise cannot flip an order."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.size("embedding") > 0)
    qs = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") % 97 != 0).select("vec_id", "embedding")
    scored = corpus.crossJoin(F.broadcast(qs)).select(
        "query_id",
        "vec_id",
        F.round(dot("embedding", "qv"), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), "vec_id"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .orderBy("query_id", "rk")
    )


@query(
    "embed_prefix_topk_overlap",
    oracle="""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id % 97 = 0 AND len(embedding) >= 16
    ), c AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id % 97 <> 0 AND len(embedding) >= 16
    ), qx AS (
      SELECT qid, unnest(qv) AS v, generate_subscripts(qv, 1) AS o FROM q
    ), cx AS (
      SELECT vec_id, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS o FROM c
    ), full_ex AS (
      SELECT qx.qid, cx.vec_id,
             ROUND(SUM(CAST(cx.v AS DOUBLE) * CAST(qx.v AS DOUBLE)), 6) AS sim
      FROM cx JOIN qx ON cx.o = qx.o
      GROUP BY qx.qid, cx.vec_id
    ), pref_ex AS (
      SELECT qx.qid, cx.vec_id,
             ROUND(SUM(CAST(cx.v AS DOUBLE) * CAST(qx.v AS DOUBLE)), 6) AS sim
      FROM cx JOIN qx ON cx.o = qx.o AND cx.o <= 16 AND qx.o <= 16
      GROUP BY qx.qid, cx.vec_id
    ), full_top AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, row_number() OVER (
          PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk FROM full_ex
      ) WHERE rk <= 5
    ), pref_top AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, row_number() OVER (
          PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk FROM pref_ex
      ) WHERE rk <= 5
    )
    SELECT f.qid AS query_id,
           CAST(COUNT(p.vec_id) AS BIGINT) AS n_overlap
    FROM full_top f LEFT JOIN pref_top p
      ON f.qid = p.qid AND f.vec_id = p.vec_id
    GROUP BY f.qid
    ORDER BY query_id
    """,
)
def embed_prefix_topk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style prefix evaluation: how many of each query's
    exact top-5 neighbors (full 64-dim dot product) survive when
    similarity uses only the FIRST 16 dimensions — the measurement that
    decides whether a truncated-embedding index (cheap prefix filter,
    full-dim re-rank) is viable for this embedding family.

    Both rankings share one broadcast of the query batch; each is a
    map-side scored scan plus a per-query top-k window, and the overlap
    is a tiny top-k × top-k join.  The corpus is scanned twice rather
    than cached — at 100 TB a re-scan is cheaper than materializing a
    scored copy, and the two scans pipeline independently."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.size("embedding") >= 16)
    qs = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") % 97 != 0).select("vec_id", "embedding")

    def topk(corpus_col, query_col):
        scored = corpus.crossJoin(F.broadcast(qs)).select(
            "qid",
            "vec_id",
            F.round(dot(corpus_col, query_col), 6).alias("sim"),
        )
        w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "vec_id")
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("qid", "vec_id")
        )

    full_top = topk(F.col("embedding"), F.col("qv"))
    pref_top = topk(
        F.slice(F.col("embedding"), 1, 16), F.slice(F.col("qv"), 1, 16)
    )
    p = pref_top.select(
        F.col("qid").alias("p_qid"), F.col("vec_id").alias("p_vec")
    )
    return (
        full_top.join(
            p,
            (full_top.qid == p.p_qid) & (full_top.vec_id == p.p_vec),
            "left",
        )
        .groupBy("qid")
        .agg(F.count("p_vec").cast("bigint").alias("n_overlap"))
        .select(F.col("qid").alias("query_id"), "n_overlap")
        .orderBy("query_id")
    )
