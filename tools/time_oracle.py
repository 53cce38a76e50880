#!/usr/bin/env python3
"""Time DuckDB oracle SQL for named gates against an sf-dir's parquet
tables — the same-box oracle side of BASELINE.md's receipts.

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir> gate1 [gate2 ...]
  (verifyOutDir must hold an oracle_sql.json from graft.Verify)

Runs each statement twice (cold, then warm) with 32 threads and prints
both walls; BASELINE.md records the warm number. A statement exceeding
GRAFT_ORACLE_TIMEOUT_S (default 900) is killed via DuckDB's interrupt
and recorded as DNF.

Driver-side tooling only (duckdb is not on the Spark classpath).
"""
import json, os, sys, threading, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
TIMEOUT = float(os.environ.get("GRAFT_ORACLE_TIMEOUT_S", "900"))


def main():
    sf_dir, out_dir, *gates = sys.argv[1:]
    sqls = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    for g in gates:
        if g not in sqls:
            print(f"{g}: no oracle SQL")
            continue
        walls = []
        for run in ("cold", "warm"):
            timer = threading.Timer(TIMEOUT, con.interrupt)
            timer.start()
            t0 = time.time()
            try:
                con.execute(sqls[g]).fetchall()
                walls.append(f"{run} {time.time() - t0:.2f}s")
            except duckdb.InterruptException:
                walls.append(f"{run} DNF>{TIMEOUT:.0f}s")
                timer.cancel()
                break
            finally:
                timer.cancel()
        print(f"{g}: " + ", ".join(walls), flush=True)


if __name__ == "__main__":
    main()
