#!/usr/bin/env python3
"""Generate the 10x documents scaling set used by BASELINE.md's
retrieval/LM sweeps: 10 deterministically word-rotated copies of the
sf0.1 documents (50 000 docs), written to
/tmp/graft_docs10x_dir/documents.parquet so
`SPARK_GRAFT_SF_DIR=/tmp/graft_docs10x_dir SPARK_GRAFT_ONLY=text_bm25
tools/run.sh Bench` reproduces the 10x point.

Copy k=0 is the source corpus verbatim; copy k>0 rotates each
document's leading k tokens to the end — preserving the token MULTISET
(so tf/df/unigram/bigram statistics stay corpus-shaped; bigrams change
only at the rotation seam) while doc_ids shift by 5000·k, so
dedup-style structure does not collapse the copies. n_chars is
recomputed from the rewritten text so the column invariant
(n_chars = length(text)) holds across all copies.

Driver-side tooling only (duckdb is not on the Spark classpath).
"""
import os
import duckdb

OUT_DIR = "/tmp/graft_docs10x_dir"
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
    CROSS JOIN (SELECT UNNEST(range(0, 10)) AS k) k) k
) TO '{OUT_DIR}/documents.parquet' (FORMAT PARQUET)
""")
n, lo, hi = con.execute(
    f"SELECT count(*), min(doc_id), max(doc_id) "
    f"FROM '{OUT_DIR}/documents.parquet'").fetchone()
print(f"wrote {OUT_DIR}/documents.parquet: {n} docs, ids [{lo}, {hi}]")
