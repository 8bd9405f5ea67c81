"""Adversarial fixture perturbation for oracle-parity robustness.

The driver REGENERATES fixtures between rounds (ADVICE r01 #4: an oracle
that is "only correct because the current fixture has no NULL user_ids"
breaks on the next drop).  Both sides of the differential oracle read the
same parquet, so parity must hold on ANY data the generator could emit —
not just today's draw.  This module writes a perturbed copy of a fixture
dir that front-loads the nasty cases:

- NULLs in every nullable non-key column that is plausibly generator-
  varied (events.user_id / events.value, documents.lang, customer.c_acctbal,
  embeddings.label);
- heavy TIES: many orders share one o_totalprice, event timestamps
  truncated to the hour (equal ts within a user) — flushes out top-k /
  window queries whose engines could pick different tie rows;
- degenerate documents: empty text, whitespace-only text, unicode text
  (n_chars kept consistent = length(text), as the generator derives it);
- empty embedding vectors.

All perturbations are deterministic (key-modulus selected), so the
perturbed tables are stable across runs.  Usage:

    python tools/perturb_fixtures.py [src_dir] [dst_dir]

or programmatically: ``perturb(src_dir, dst_dir)``.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Per-table SELECT rewriting the raw scan (aliased t) into its perturbed
# form.  Tables not listed are copied verbatim.
_PERTURB_SQL: dict[str, str] = {
    "customer": """
        SELECT c_custkey, c_name,
               -- tier 2: dangling FK (nation 99 does not exist) — joins
               -- must drop these identically on both engines
               CASE WHEN c_custkey % 179 = 0 THEN 99 ELSE c_nationkey END
                 AS c_nationkey,
               CASE WHEN c_custkey % 71 = 0 THEN NULL ELSE c_acctbal END
                 AS c_acctbal,
               c_mktsegment
        FROM t
    """,
    "orders": """
        SELECT o_orderkey,
               -- tier 2: orphan orders (custkey outside the customer set)
               CASE WHEN o_orderkey % 173 = 0
                    THEN o_custkey + 20000000 ELSE o_custkey END AS o_custkey,
               o_orderstatus,
               CASE WHEN o_orderkey % 61 = 0
                    THEN CAST(12345.67 AS DOUBLE) ELSE o_totalprice END
                 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM t
    """,
    "lineitem": """
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
               l_quantity, l_extendedprice,
               CASE WHEN l_orderkey % 113 = 0 THEN NULL ELSE l_discount END
                 AS l_discount,
               CASE WHEN l_orderkey % 127 = 0 THEN NULL ELSE l_tax END
                 AS l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM t
    """,
    "part": """
        SELECT p_partkey, p_name, p_brand, p_type,
               CASE WHEN p_partkey % 109 = 0 THEN NULL ELSE p_size END
                 AS p_size,
               p_retailprice
        FROM t
    """,
    "supplier": """
        SELECT s_suppkey, s_name, s_nationkey,
               CASE WHEN s_suppkey % 53 = 0 THEN NULL ELSE s_acctbal END
                 AS s_acctbal
        FROM t
    """,
    "events": """
        SELECT event_id,
               CASE WHEN event_id % 59 = 0
                    THEN date_trunc('hour', ts) ELSE ts END AS ts,
               CASE WHEN event_id % 37 = 0 THEN NULL ELSE user_id END
                 AS user_id,
               event_type,
               CASE WHEN event_id % 41 = 0 THEN NULL ELSE value END AS value,
               -- tier 5: broken property bags — Spark's JSON readers NULL
               -- on malformed input where DuckDB's json_* functions ERROR,
               -- so every oracle must guard with json_valid
               CASE WHEN event_id % 211 = 0 THEN '{"k": 17'
                    WHEN event_id % 223 = 0 THEN ''
                    WHEN event_id % 227 = 0 THEN NULL
                    ELSE props END AS props
        FROM t
    """,
    "documents": """
        SELECT doc_id, text, lang, source,
               -- tier 6: n_chars-vs-text disagreement — the pristine
               -- generator keeps n_chars = length(text), but queries must
               -- stay ENGINE-CONSISTENT (Spark result == oracle result)
               -- even when the two columns disagree, since both engines
               -- read the same parquet
               CASE WHEN doc_id % 137 = 0 THEN CAST(0 AS BIGINT)
                    WHEN doc_id % 139 = 0 THEN CAST(length(text) + 7 AS BIGINT)
                    ELSE CAST(length(text) AS BIGINT) END AS n_chars
        FROM (
          SELECT doc_id,
                 CASE
                   WHEN doc_id % 89 = 0 THEN ''
                   WHEN doc_id % 97 = 0 THEN '  '
                   WHEN doc_id % 101 = 0
                     THEN 'naïve café über-σχῆμα 数据 déjà-vu ' || text
                   -- short-document band (round-3 phantom-shingle bug
                   -- class): zero-length at high density, sub-shingle
                   -- lengths, and the 19-char boundary one below the
                   -- 20-char shingle width
                   WHEN doc_id % 47 = 0 THEN ''
                   WHEN doc_id % 43 = 0 THEN substr(text, 1, 11)
                   WHEN doc_id % 59 = 0 THEN substr(text, 1, 19)
                   ELSE text
                 END AS text,
                 CASE WHEN doc_id % 83 = 0 THEN NULL ELSE lang END AS lang,
                 source
          FROM t
        ) p
    """,
    "embeddings": """
        SELECT vec_id,
               CASE WHEN vec_id % 151 = 0
                    THEN CAST([] AS FLOAT[]) ELSE embedding END AS embedding,
               CASE WHEN vec_id % 103 = 0 THEN NULL ELSE label END AS label
        FROM t
    """,
}


def perturb(src_dir: str, dst_dir: str) -> str:
    # start from an EMPTY destination: fixtures regenerate between
    # rounds, and a stale table left from a previous run (or a table
    # later dropped from TABLES) must never mask a parity break
    # (VERDICT r4 hygiene item 8)
    if os.path.isdir(dst_dir):
        shutil.rmtree(dst_dir)
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    for name in TABLES:
        src = os.path.join(src_dir, f"{name}.parquet")
        dst = os.path.join(dst_dir, f"{name}.parquet")
        body = _PERTURB_SQL.get(name, "SELECT * FROM t")
        con.execute(
            f"""
            COPY (
              WITH t AS (SELECT * FROM read_parquet('{src}'))
              {body}
            ) TO '{dst}' (FORMAT PARQUET)
            """
        )
    con.close()
    _rewrite_events_ts_nanos(os.path.join(dst_dir, "events.parquet"))
    return dst_dir


def _rewrite_events_ts_nanos(path: str) -> None:
    """Store events.ts as TIMESTAMP(NANOS) — the alternate physical form
    fixture drops have shipped (catalog.load_table normalizes it via
    ``spark.sql.legacy.parquet.nanosAsLong`` + ``timestamp_micros(ts div
    1000)``; DuckDB truncates ns→µs in CAST).  Exercising it continuously
    keeps both readers' normalization honest."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    idx = t.schema.get_field_index("ts")
    t = t.set_column(idx, "ts", t.column("ts").cast(pa.timestamp("ns")))
    pq.write_table(t, path, store_schema=False, coerce_timestamps=None)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/osetl-perturbed-sf0.001"
    print(perturb(src, dst))
