"""An LLM training-data curation run, end-to-end on this engine.

The companion to ``migrate_reference_pipeline.py`` for the EXT surface:
where that script replays the reference user's warehouse workflow, this
one replays the workflow of a team building a pretraining corpus — each
stage is a registered, oracle-checked query from the engine, chained
here the way a real curation run chains them:

    python examples/curate_training_corpus.py [sf_dir]

Stages (each prints its row/drop counts):
  1. quality gate      — datapipe_c4_filter_cascade rule flags
  2. classifier gate   — text_quality_classifier hashed linear scorer
  3. blocklist gate    — text_domain_blocklist suffix-chain match
  4. exact dedup       — dedup_exact content-hash clusters
  5. near-dup clusters — dedup_cluster_canonical quality-based keep
  6. decontamination   — datapipe_contamination_ngram 20-gram overlap
  7. split + pack      — datapipe_corpus_pipeline (filter → dedup →
                         leakage-safe split → packing stats, one plan)
  8. mixture schedule  — datapipe_epoch_mixture epochs per source

Everything is lazy DataFrames until each stage's action; no stage
collects more than its presentation-sized summary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_source_etl_spark.conf import EngineConfig  # noqa: E402
from open_source_etl_spark.registry import all_queries  # noqa: E402
from open_source_etl_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(EngineConfig(master="local[8]", shuffle_partitions=8))
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    flags = q["datapipe_c4_filter_cascade"](spark, sf_dir)
    kept = flags.filter(F.col("keep")).count()
    total = flags.count()
    print(f"1. quality gate:      {kept}/{total} docs pass the C4 cascade")

    clf = q["text_quality_classifier"](spark, sf_dir)
    print(
        f"2. classifier gate:   {clf.filter(F.col('keep')).count()}/{total} "
        "docs score positive"
    )

    bl = q["text_domain_blocklist"](spark, sf_dir)
    print(
        f"3. blocklist gate:    {bl.filter(F.col('blocked')).count()} docs "
        "from blocklisted domains"
    )

    clusters = q["dedup_exact"](spark, sf_dir).filter(F.col("n_copies") > 1)
    print(f"4. exact dedup:       {clusters.count()} multi-copy content hashes")

    canon = q["dedup_cluster_canonical"](spark, sf_dir)
    print(f"5. near-dup clusters: {canon.count()} prefix clusters, best kept")

    contam = q["datapipe_contamination_ngram"](spark, sf_dir)
    print(f"6. decontamination:   {contam.count()} docs share eval 20-grams")

    pipe = q["datapipe_corpus_pipeline"](spark, sf_dir)
    print("7. split + pack:")
    for row in pipe.collect():
        print(
            f"     {row.split:5s} {row.lang}: {row.n_docs} docs, "
            f"{row.total_tokens} tokens, {row.n_bins} bins"
        )

    mix = q["datapipe_epoch_mixture"](spark, sf_dir)
    hi = mix.orderBy(F.col("n_epochs").desc()).first()
    print(
        f"8. mixture schedule:  {mix.count()} sources; most-repeated "
        f"{hi.source} at {hi.n_epochs} epochs"
    )
    spark.stop()


if __name__ == "__main__":
    main()
