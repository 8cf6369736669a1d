#!/usr/bin/env python3
"""Build a ~10x replica of an SF dir for scale-curve benchmarking.

Replication preserves join structure and duplicate/similarity
DISTRIBUTION instead of naively copying rows (naive copies turn every
document into a 10-clique of exact dups, which inflates dedup outputs
~45x and contaminates the scaling measurement):

- TPC-H-ish facts (lineitem/orders/customer/supplier): keys remapped
  key*10+r so each replica keeps its own consistent join graph;
  selectivities and per-key fanouts are unchanged.
- documents: doc_id*10+r; for r>0 every 3rd word gets a replica
  suffix, so every word-3-shingle window differs -> replicas are NOT
  near-dups of each other, while near-dup pairs WITHIN a replica are
  preserved (the pair count scales ~10x like the data).
- embeddings: vec_id*10+r; for r>0 the vector is circularly shifted
  by r*7 positions — another near-uniform unit vector with ~0 cosine
  to its source, so the near-dup graph scales instead of cliquing.
- region/nation/part: copied verbatim (dimensions don't scale).
- events: event_id/user_id remapped key*F+r (disjoint user
  populations per replica, identical temporal patterns) with ts
  copied through — per-user session/funnel/retention structure is
  preserved exactly while counts scale ~F. (Earlier testdata
  generations wrote TIMESTAMP_NS, which DuckDB round-tripped
  lossily; the current generation is TIMESTAMP_US end-to-end, so
  events now replicate like every other fact table.)

Usage: python3 tools/scale_up.py /root/testdata/sf0.1 /tmp/graft_sf1 10
"""
import shutil
import sys

import duckdb

src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
import os
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.sql(f"CREATE VIEW r AS SELECT unnest(range(0, {factor})) AS r")

def emit(name, sql):
    con.sql(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

emit("lineitem", f"""
  SELECT l_orderkey*{factor}+r AS l_orderkey, l_partkey,
         l_suppkey*{factor}+r AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM '{src}/lineitem.parquet' CROSS JOIN r""")
emit("orders", f"""
  SELECT o_orderkey*{factor}+r AS o_orderkey, o_custkey*{factor}+r AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet' CROSS JOIN r""")
emit("customer", f"""
  SELECT c_custkey*{factor}+r AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM '{src}/customer.parquet' CROSS JOIN r""")
emit("supplier", f"""
  SELECT s_suppkey*{factor}+r AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{src}/supplier.parquet' CROSS JOIN r""")
emit("documents", f"""
  SELECT doc_id*{factor}+r AS doc_id,
         CASE WHEN r = 0 THEN text
              ELSE array_to_string(list_transform(string_split(text, ' '),
                     (w, i) -> CASE WHEN i % 3 = 0 THEN w || 'q' || r ELSE w END), ' ')
         END AS text,
         lang, source,
         length(CASE WHEN r = 0 THEN text
              ELSE array_to_string(list_transform(string_split(text, ' '),
                     (w, i) -> CASE WHEN i % 3 = 0 THEN w || 'q' || r ELSE w END), ' ')
         END) AS n_chars
  FROM '{src}/documents.parquet' CROSS JOIN r""")
emit("embeddings", f"""
  SELECT vec_id*{factor}+r AS vec_id,
         CASE WHEN r = 0 THEN embedding
              ELSE CAST(list_concat(embedding[(r*7) % 64 + 1:],
                                    embedding[1:(r*7) % 64]) AS FLOAT[])
         END AS embedding,
         label
  FROM '{src}/embeddings.parquet' CROSS JOIN r""")

emit("events", f"""
  SELECT event_id*{factor}+r AS event_id, ts,
         user_id*{factor}+r AS user_id, event_type, value, props
  FROM '{src}/events.parquet' CROSS JOIN r""")

for t in ["region", "nation", "part"]:
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"{t}: copied verbatim")
