"""Generate an sf1 fixture (10x sf0.1) for scale-evidence runs.

VERDICT r9 #8: all bench numbers so far are sf0.1; SCALING.md argued
design, not measurement. This tool manufactures an sf1 dataset from the
driver's sf0.1 fixture by REPLICATION WITH KEY REMAPPING — 10 disjoint
copies whose primary AND foreign keys are offset by copy*BASE, so every
referential relationship of the original replicates per copy and
cross-copy joins produce nothing. Content columns that drive
content-addressed operators are made copy-distinct on purpose:

  * documents.text: every token is prefixed with the copy tag, so no
    window/shingle/simhash collides across copies — each copy carries
    exactly sf0.1's duplicate structure. (Leaving text identical would
    make every duplicate class 10x bigger and the pair/cluster work
    O(copies^2) — a DIFFERENT experiment than corpus growth.)
  * embeddings.embedding: component-rotated by the copy index, so
    cross-copy cosines are incidental rather than exactly 1.0.
  * customer/supplier names: copy-tagged first token (blocking keys
    stay sf0.1-shaped instead of merging into 10x blocks).

Everything else (timestamps, categorical columns, numeric measures) is
copied verbatim: event density per time window genuinely grows 10x,
which is the realistic shape of "same period, more traffic".

Usage: python tools/make_sf1.py [SRC_SF_DIR] [DST_DIR]
Defaults: /root/testdata/sf0.1 -> <repo>/testdata_sf1 (gitignored).
"""

from __future__ import annotations

import os
import sys

import duckdb

COPIES = 10
BASE = 100_000_000  # id offset per copy; far above any sf0.1 key

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "testdata_sf1")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def gen(table: str, select_for_copy) -> None:
        parts = [select_for_copy(k) for k in range(COPIES)]
        sql = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows", flush=True)

    def src_t(t: str) -> str:
        return f"read_parquet('{src}/{t}.parquet')"

    # Fixed-size dimensions: copied verbatim (their domains are the
    # point — nation/region keys are shared by every copy).
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {src_t(t)}) TO '{dst}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
        print(f"{t}: copied", flush=True)

    gen("customer", lambda k: f"""
        SELECT c_custkey + {k * BASE} AS c_custkey,
               {"c_name" if k == 0 else f"'k{k} ' || c_name"} AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src_t('customer')}""")
    gen("supplier", lambda k: f"""
        SELECT s_suppkey + {k * BASE} AS s_suppkey,
               {"s_name" if k == 0 else f"'k{k} ' || s_name"} AS s_name,
               s_nationkey, s_acctbal
        FROM {src_t('supplier')}""")
    gen("part", lambda k: f"""
        SELECT p_partkey + {k * BASE} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {src_t('part')}""")
    gen("orders", lambda k: f"""
        SELECT o_orderkey + {k * BASE} AS o_orderkey,
               o_custkey + {k * BASE} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src_t('orders')}""")
    gen("lineitem", lambda k: f"""
        SELECT l_orderkey + {k * BASE} AS l_orderkey,
               l_partkey + {k * BASE} AS l_partkey,
               l_suppkey + {k * BASE} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src_t('lineitem')}""")
    gen("events", lambda k: f"""
        SELECT event_id + {k * BASE} AS event_id, ts,
               user_id + {k * BASE} AS user_id,
               event_type, value, props
        FROM {src_t('events')}""")
    gen("documents", lambda k: f"""
        SELECT doc_id + {k * BASE} AS doc_id,
               {"text" if k == 0 else
                f"CASE WHEN text = '' THEN '' ELSE"
                f" 'c{k}' || replace(text, ' ', ' c{k}') END"} AS text,
               lang, source,
               {"n_chars" if k == 0 else
                f"CAST(length(CASE WHEN text = '' THEN '' ELSE"
                f" 'c{k}' || replace(text, ' ', ' c{k}') END)"
                " AS BIGINT)"} AS n_chars
        FROM {src_t('documents')}""")
    gen("embeddings", lambda k: f"""
        SELECT vec_id + {k * BASE} AS vec_id,
               {"embedding" if k == 0 else
                f"embedding[{k + 1}:] || embedding[1:{k}]"} AS embedding,
               label
        FROM {src_t('embeddings')}""")
    print(f"sf1 fixture written to {dst}", flush=True)


if __name__ == "__main__":
    main()
