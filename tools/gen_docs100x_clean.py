#!/usr/bin/env python3
"""Generate the 100x documents set with a NON-SATURATING benchmark
slice (r10): same 100 word-rotated copies per sf0.1 document as
gen_docs100x.py, but copies (k > 0) get ids of the form
1_000_000 + 97*(doc_id*100 + k) + 1 — never congruent 0 mod 97 — so
the pipe gates' benchmark slice stays the ~51 ORIGINAL %97 docs. In
the original id scheme (doc_id + 5000k) the %97 slice lands on ~5 000
rotated copies covering essentially every duplicate family, so the
decontamination stage (correctly) drops the whole corpus and every
post-filter stage of the pipeline runs EMPTY — fine for stage-1-6
walls, useless as a non-degenerate 100x pipeline receipt. Here only
the bench originals' own rotation families are contaminated (~1% of
the corpus), which is the production shape.

Driver-side tooling only (duckdb is not on the Spark classpath).
"""
import os
import duckdb

OUT_DIR = "/tmp/graft_docs100xc_dir"
SRC = "/root/testdata/sf0.1/documents.parquet"

os.makedirs(OUT_DIR, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  WITH base AS (
    SELECT *, list_filter(regexp_split_to_array(text, '\\s+'),
                          x -> x <> '') AS tk
    FROM '{SRC}')
  SELECT CASE WHEN k = 0 THEN doc_id
              ELSE 1000000 + 97*(doc_id*100 + k) + 1 END AS doc_id,
         text2 AS text,
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
n, nb = con.execute(
    f"SELECT count(*), count(*) FILTER (WHERE doc_id % 97 = 0) "
    f"FROM '{OUT_DIR}/documents.parquet'").fetchone()
print(f"wrote {OUT_DIR}/documents.parquet: {n} docs, {nb} bench docs")
