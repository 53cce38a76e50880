#!/usr/bin/env python3
"""Generate the 100x relational scaling set (15 M orders, 60 M
lineitems) the same way gen_rel10x.py builds the 10x one: 100
deterministically key-shifted copies of the sf0.1 orders + lineitem,
the other tables copied verbatim, written to /tmp/graft_rel100x_dir.

Copy k shifts o_orderkey/l_orderkey by 1e6*k — the join graph stays
valid (each customer carries 100x orders, each order its original
lineitems) and per-key window history (q_winfuncs per custkey,
q_scd2_apply per orderkey % 997) deepens 100x. o_orderdate keeps its
value: window tie-break is (o_orderdate, o_orderkey), deterministic
across copies.

Driver-side tooling only (duckdb is not on the Spark classpath).
"""
import os
import shutil

import duckdb

OUT_DIR = "/tmp/graft_rel100x_dir"
SRC = "/root/testdata/sf0.1"

os.makedirs(OUT_DIR, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT o_orderkey + 1000000*k.k AS o_orderkey, o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'
  CROSS JOIN (SELECT UNNEST(range(0, 100)) AS k) k
) TO '{OUT_DIR}/orders.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT l_orderkey + 1000000*k.k AS l_orderkey, * EXCLUDE (l_orderkey)
  FROM '{SRC}/lineitem.parquet'
  CROSS JOIN (SELECT UNNEST(range(0, 100)) AS k) k
) TO '{OUT_DIR}/lineitem.parquet' (FORMAT PARQUET)
""")
for t in ["region", "nation", "customer", "supplier", "part", "events",
          "documents", "embeddings"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT_DIR}/{t}.parquet")
for t in ["orders", "lineitem"]:
    n = con.execute(f"SELECT count(*) FROM '{OUT_DIR}/{t}.parquet'").fetchone()[0]
    print(f"wrote {OUT_DIR}/{t}.parquet: {n} rows")
