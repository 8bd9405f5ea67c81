"""Isolate where media-query time goes: synth stage vs decode stage vs
final collect (guide §1.4 — noop sink so the sink never bills the
computation; §1.5 — labeled jobs).

For each named media family this times, on one warm local session:
  synth   — synthesize_X(docs) → noop
  decode  — decode_X(synthesize_X(docs)) → noop  (includes synth cost)
  query   — the declared registry query → noop   (adds orderBy etc.)

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
       python tools/profile_media_kernels.py [name ...]
Names default to the heavy set below; any registered query name works
for the `query` row (synth/decode rows need a known family pairing).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# family → (synthesize fn name, decode fn name) in multimodal.decode
FAMILIES = {
    "multimodal_webp_vp8l_transform_decode": (
        "synthesize_webp_transform", "decode_webp"),
    "multimodal_h264_dpixel_decode": (
        "synthesize_h264_dpixel", "decode_h264_dpixel"),
    "multimodal_h264_submb_decode": (
        "synthesize_h264_submb", "decode_h264_submb"),
    "multimodal_h264_bpixel_decode": (
        "synthesize_h264_bpixel", "decode_h264_bpixel"),
    "multimodal_h264_wpixel_decode": (
        "synthesize_h264_wpixel", "decode_h264_wpixel"),
    "multimodal_h264_cavlc_decode": (
        "synthesize_h264_cavlc", "decode_h264_cavlc"),
    "multimodal_h264_chroma_decode": (
        "synthesize_h264_chroma", "decode_h264_chroma"),
    "multimodal_h264_fracpel_decode": (
        "synthesize_h264_fracpel", "decode_h264_fracpel"),
    "multimodal_flac_stereo_decode": (
        "synthesize_flac_stereo", "decode_flac_stereo"),
}


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    names = sys.argv[1:] or list(FAMILIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from open_source_etl_spark.catalog import load_table_compute
    from open_source_etl_spark.conf import EngineConfig
    from open_source_etl_spark.multimodal import decode as D
    from open_source_etl_spark.registry import all_queries
    from open_source_etl_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cfg = EngineConfig(master=f"local[{cpus}]", shuffle_partitions=max(int(cpus), 8))
    spark = build_session(cfg)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm: JVM + python workers
    spark.range(1000).mapInPandas(lambda it: it, "id long").collect()
    queries = all_queries()
    docs = load_table_compute(spark, sf_dir, "documents")

    print(f"{'query':44s} {'synth':>8s} {'decode':>8s} {'full':>8s}")
    for name in names:
        fam = FAMILIES.get(name)
        t_s = t_d = float("nan")
        if fam:
            synth = getattr(D, fam[0])
            dec = getattr(D, fam[1])
            sc.setJobDescription(f"profile:{name}:synth")
            t_s = noop(synth(docs))
            sc.setJobDescription(f"profile:{name}:decode")
            t_d = noop(dec(synth(docs)))
        sc.setJobDescription(f"profile:{name}:full")
        t_q = noop(queries[name](spark, sf_dir))
        sc.setJobDescription(None)
        print(f"{name:44s} {t_s:8.2f} {t_d:8.2f} {t_q:8.2f}")

    spark.stop()


if __name__ == "__main__":
    main()
