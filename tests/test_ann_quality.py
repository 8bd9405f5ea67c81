"""Approximate-operator quality floors: the rows-only driver check only
proves these queries RUN; these tests pin how good the approximations
actually are against their exact baselines, so a refactor that silently
guts recall fails CI rather than shipping a fast-but-useless index.

Thresholds are deliberately below measured values (IVF 0.5-0.8, LSH
0.9-1.0, MinHash 1.0 at sf0.01) — they catch collapse, not noise.
"""

from __future__ import annotations

import pytest

from open_source_etl_spark.registry import all_queries

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    return all_queries()


@pytest.fixture(scope="module")
def exact_top10(spark, queries):
    return {r.vec_id for r in queries["knn_bruteforce_cosine"](spark, SF).collect()}


def test_ivf_recall_floor(spark, queries, exact_top10):
    ivf = {r.vec_id for r in queries["ann_ivf_search"](spark, SF).collect()}
    recall = len(exact_top10 & ivf) / len(exact_top10)
    assert recall >= 0.4, f"IVF recall@10 collapsed: {recall}"


def test_lsh_recall_floor(spark, queries, exact_top10):
    lsh = {r.vec_id for r in queries["ann_lsh_bucketed"](spark, SF).collect()}
    recall = len(exact_top10 & lsh) / len(exact_top10)
    assert recall >= 0.7, f"LSH recall@10 collapsed: {recall}"


def test_minhash_finds_high_jaccard_pairs(spark, queries):
    """Every strongly-near-dup pair (exact Jaccard >= 0.9 from the
    blocked quadratic baseline) must surface in the MinHash candidate
    output — banding is tuned to catch s>=0.9 with high probability, and
    missing true dups is the one failure mode a dedup pipeline can't
    tolerate."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in queries["dedup_jaccard_blocked"](spark, SF).collect()
        if r.jaccard >= 0.9
    }
    assert exact, "fixture should contain strong near-dup pairs"
    mh = {
        (r.doc_a, r.doc_b)
        for r in queries["dedup_minhash_candidates"](spark, SF).collect()
    }
    found = len(exact & mh) / len(exact)
    assert found >= 0.8, f"MinHash missed {1 - found:.0%} of J>=0.9 pairs"
