"""Iterative graph analytics over relationship edges derived from the
warehouse (EXT, SURVEY.md §2B scale notes): PageRank on the
customer–supplier trade graph.

Companion to ``llm_dedup.dedup_connected_components`` (the other
iterative-graph operator): both run Pregel-style rounds as DataFrame
joins + grouped aggregation, with ``localCheckpoint`` truncating lineage
per round so plans stay constant-size across iterations.

Scale design (100 TB posture):
- edges live distributed end-to-end; each round is one shuffle join on
  src + one grouped sum on dst — hash-partitioned both times, no
  driver-side state beyond the scalar iteration counter;
- per-node out-degree is precomputed once and folded into the edge
  weight, so the iteration joins a (src, dst, w) frame with a (node,
  rank) frame — the minimal-width shuffle payload;
- rank mass is conserved by construction (undirected edges mean no
  dangling nodes), so convergence needs no global renormalization pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

DAMPING = 0.85
ROUNDS = 6


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected customer–supplier edges from order lineage,
    encoded as bigint node ids (customer = 2·custkey, supplier =
    2·suppkey + 1)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cust_node").alias("src"), F.col("supp_node").alias("dst"))
    rev = pairs.select(F.col("supp_node").alias("src"), F.col("cust_node").alias("dst"))
    return fwd.unionAll(rev)


def pagerank(spark: SparkSession, edges: DataFrame, rounds: int = ROUNDS) -> DataFrame:
    """The synchronous PageRank loop over an undirected (src, dst) edge
    frame — extracted so the scale probe (tools/scale_probe.py) can run
    the identical kernel on synthetic graphs 100x the fixture's key
    space.  Returns the final (dst, rank) frame; mass sums to 1 when
    every node has out-degree >= 1 (undirected edges guarantee it)."""
    # the node-sized degree frame is the cheap place to learn BOTH sizes:
    # sum(out_deg) = |E| and count = |V| (undirected edges ⇒ every node
    # appears as src).  Checkpointing deg (tiny) instead of a pre-
    # repartition edge frame halves the kernel's peak cached footprint —
    # the round-4 probe showed the 10M-key leg thrashing GC with TWO
    # |E|-sized checkpoints (pre- and post-repartition) pinned for the
    # whole loop plus a redundant |E|→|V| distinct for the node frame.
    deg = (
        edges.groupBy("src")
        .agg(F.count("*").alias("out_deg"))
        .localCheckpoint(eager=True)
    )
    stats = deg.agg(
        F.sum("out_deg").alias("e"), F.count("*").alias("v")
    ).first()
    n_edges, n_nodes = int(stats["e"]), int(stats["v"])
    # per-round shuffle load is O(|edges|); size the iteration partition
    # count from the edge count exactly like dedup_connected_components
    # (tiny rounds drown in task-launch overhead at the default count)
    iter_parts = max(8, min(-(-n_edges // 200_000), 4096))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(iter_parts))
    try:
        # hash-partition the weighted edge frame on src ONCE (single
        # |E|-sized checkpoint): the per-round join then re-shuffles only
        # the |nodes|-sized rank frame, never the |edges|-sized one — the
        # dominant per-round exchange disappears (measured ~20% off the
        # 6-round loop at sf0.1, and the saving grows with |edges|/|nodes|)
        wedges = (
            edges.join(deg, "src")
            .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
            .repartition(iter_parts, "src")
            .localCheckpoint(eager=True)
        )
        nodes = deg.select(F.col("src").alias("dst"))
        ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
        teleport = (1.0 - DAMPING) / n_nodes
        # The rank frame is |V|-sized and |V| is known EXACTLY here —
        # when it provably fits the broadcast policy cap (~24 B/row for
        # two 8-byte columns plus hash-relation overhead), broadcast it
        # into every round: the per-round join shuffle disappears and the
        # only remaining exchange is the |V|-sized post-combine grouped
        # sum.  Past the cap (billions of nodes at 100 TB) the loop falls
        # back to the src-copartitioned shuffle join unchanged.
        bcast_ranks = n_nodes * 24 < 32 * 1024 * 1024
        for _ in range(rounds):
            rank_side = ranks.withColumnRenamed("dst", "node")
            if bcast_ranks:
                rank_side = F.broadcast(rank_side)
            contribs = (
                wedges.join(rank_side, wedges.src == F.col("node"))
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w")).alias("inflow"))
            )
            # every node has out-degree >= 1 (undirected), so no dangling
            # mass: rank_new = teleport + d * inflow preserves sum(rank) = 1
            ranks = contribs.select(
                "dst",
                (F.lit(teleport) + F.lit(DAMPING) * F.col("inflow")).alias("rank"),
            ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return ranks


@query(
    "graph_pagerank",
    # the 6-round synchronous fixpoint IS ANSI-expressible: a recursive
    # CTE carries (iter, node, rank) and the recursive term is one
    # round's contribution aggregation.  Both engines round to 8dp
    # before the top-20 cut, so float-associativity noise (~1e-15 on
    # ~25-term sums) cannot flip an order.
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      UNION
      SELECT DISTINCT l.l_suppkey * 2 + 1, o.o_custkey * 2
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), wedges AS (
      SELECT src, dst, 1.0 / (COUNT(*) OVER (PARTITION BY src)) AS w
      FROM edges
    ), nodes AS (SELECT DISTINCT src AS node FROM edges),
    meta AS (SELECT COUNT(*) AS n FROM nodes),
    pr AS (
      SELECT 0 AS iter, node, 1.0 / (SELECT n FROM meta) AS rank FROM nodes
      UNION ALL
      SELECT p.iter + 1, w.dst AS node,
             (0.15 / (SELECT n FROM meta)) + 0.85 * SUM(p.rank * w.w)
      FROM pr p JOIN wedges w ON w.src = p.node
      WHERE p.iter < 6
      GROUP BY p.iter, w.dst
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           CAST(node // 2 AS BIGINT) AS key,
           ROUND(rank, 8) AS rank
    FROM pr WHERE iter = 6
    ORDER BY rank DESC, node_type, key
    LIMIT 20
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite customer–supplier trade graph
    (undirected: an order lineitem links both ways), damping 0.85,
    6 synchronous rounds — "which suppliers sit at the center of the
    purchase network" as a warehouse query.

    Each round: fold rank/out_degree into the edge, shuffle-join ranks
    on src, grouped-sum contributions on dst, add the teleport term.
    ``localCheckpoint`` after each round keeps the plan O(1) deep (the
    same pattern as dedup_connected_components).  The FIXED-round
    fixpoint has an exact ANSI twin — a recursive CTE whose recursive
    term is one round's contribution aggregation — so this is a full
    value-hash oracle check (upgraded from rows-only in round 4); the
    result is additionally checked against a dense numpy PageRank on
    the same edges in ``tests/test_graph.py``, with mass conservation
    (ranks sum to 1) asserted there too.

    Output: top 20 nodes by rank (node_type, key, rank rounded to 8dp).
    """
    edges = trade_edges(spark, sf_dir)
    ranks = pagerank(spark, edges, rounds=ROUNDS)
    return (
        ranks.select(
            F.when(F.col("dst") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            (F.col("dst") / 2).cast("bigint").alias("key"),
            F.round("rank", 8).alias("rank"),
        )
        .orderBy(F.desc("rank"), "node_type", "key")
        .limit(20)
    )
