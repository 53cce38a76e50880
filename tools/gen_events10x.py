#!/usr/bin/env python3
"""Generate the 10x events scaling set for BASELINE.md's temporal
sweeps: 10 deterministically shifted copies of the sf0.1 events
(1 000 000 rows), written to /tmp/graft_events10x_dir/events.parquet so
`SPARK_GRAFT_SF_DIR=/tmp/graft_events10x_dir SPARK_GRAFT_ONLY=q_asof_join
tools/run.sh Bench` reproduces the 10x point.

Copy k shifts user_id by 100000·k (so the per-user session/as-of
structure replicates rather than densifies — per-key history length
stays realistic while key cardinality scales 10x), event_id by 1e6·k,
and ts by k microseconds (keeps per-copy tie structure distinct).

Driver-side tooling only (duckdb is not on the Spark classpath).
"""
import os
import duckdb

OUT_DIR = "/tmp/graft_events10x_dir"
SRC = "/root/testdata/sf0.1/events.parquet"

os.makedirs(OUT_DIR, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT event_id + 1000000*k.k AS event_id,
         ts + to_microseconds(k.k) AS ts,
         user_id + 100000*k.k AS user_id,
         event_type, value, props
  FROM '{SRC}'
  CROSS JOIN (SELECT UNNEST(range(0, 10)) AS k) k
) TO '{OUT_DIR}/events.parquet' (FORMAT PARQUET)
""")
n, lo, hi = con.execute(
    f"SELECT count(*), min(event_id), max(event_id) "
    f"FROM '{OUT_DIR}/events.parquet'").fetchone()
print(f"wrote {OUT_DIR}/events.parquet: {n} events, ids [{lo}, {hi}]")
