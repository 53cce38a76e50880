#!/usr/bin/env python3
"""Generate the 100x documents scaling set (500 000 docs) used by
BASELINE.md's session-4 heavy-family sweep: 100 deterministically
word-rotated copies of the sf0.1 documents, written to
/tmp/graft_docs100x_dir/documents.parquet. Same construction as
gen_docs10x.py (copy k rotates each doc's leading k tokens to the end,
preserving token multisets so tf/df statistics stay corpus-shaped while
doc_ids shift by 5000*k).

Driver-side tooling only (duckdb is not on the Spark classpath).
"""
import os
import duckdb

OUT_DIR = "/tmp/graft_docs100x_dir"
SRC = "/root/testdata/sf0.1/documents.parquet"

os.makedirs(OUT_DIR, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  WITH base AS (
    SELECT *, list_filter(regexp_split_to_array(text, '\\s+'),
                          x -> x <> '') AS tk
    FROM '{SRC}')
  SELECT doc_id + 5000*k.k AS doc_id, text2 AS text,
         lang, source, CAST(length(text2) AS BIGINT) AS n_chars
  FROM (
    SELECT b.*, k.k,
           CASE WHEN k.k = 0 OR len(tk) = 0 THEN text
                ELSE array_to_string(
                       list_concat(tk[(k.k % len(tk)) + 1:],
                                   tk[1:(k.k % len(tk))]), ' ')
           END AS text2
    FROM base b
    CROSS JOIN (SELECT UNNEST(range(0, 100)) AS k) k) k
) TO '{OUT_DIR}/documents.parquet' (FORMAT PARQUET)
""")
n, lo, hi = con.execute(
    f"SELECT count(*), min(doc_id), max(doc_id) "
    f"FROM '{OUT_DIR}/documents.parquet'").fetchone()
print(f"wrote {OUT_DIR}/documents.parquet: {n} docs, ids [{lo}, {hi}]")
