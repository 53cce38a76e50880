#!/usr/bin/env python3
"""Generate the 100x embeddings scaling set for the ANN-serving-family
receipts in BASELINE.md: 100 deterministically jittered copies of the
sf0.1 embeddings (200 000 vectors), written to
/tmp/graft_emb100x_dir/embeddings.parquet so
`SPARK_GRAFT_SF_DIR=/tmp/graft_emb100x_dir SPARK_GRAFT_ONLY=ann_ivfpq
tools/run.sh Bench` reproduces the 100x point (same construction as
gen_emb10x.py, k in range(0, 100)).

Driver-side tooling only (duckdb is not on the Spark classpath).
"""
import os
import duckdb

OUT_DIR = "/tmp/graft_emb100x_dir"
SRC = "/root/testdata/sf0.1/embeddings.parquet"

os.makedirs(OUT_DIR, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT e.vec_id + 2000*k.k AS vec_id,
         list_transform(e.embedding,
           x -> CAST(x + 0.0001 * k.k *
                     (CAST(e.vec_id % 13 AS FLOAT) - 6.0) AS FLOAT))
           AS embedding,
         e.label
  FROM '{SRC}' e
  CROSS JOIN (SELECT UNNEST(range(0, 100)) AS k) k
) TO '{OUT_DIR}/embeddings.parquet' (FORMAT PARQUET)
""")
n, lo, hi = con.execute(
    f"SELECT count(*), min(vec_id), max(vec_id) "
    f"FROM '{OUT_DIR}/embeddings.parquet'").fetchone()
print(f"wrote {OUT_DIR}/embeddings.parquet: {n} vectors, ids [{lo}, {hi}]")
