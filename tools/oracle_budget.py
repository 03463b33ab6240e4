#!/usr/bin/env python3
"""Per-query wall-clock budget for the oracle SQL twins.

Runs every query in an oracle_sql.json through DuckDB against the sf-dir
parquet tables and interrupts any query that exceeds the ceiling. This is
the pre-flight that makes an oracle-side pathology (e.g. a chained-CTE
twin that DuckDB inlines into a ~100x re-evaluation, the round-12
correctness-gate killer) fail a local test instead of zeroing a round.

Usage: oracle_budget.py <sfDir> <oracleJson> <ceilingSec> [query ...]

Prints one line per query (OK/OVER/ERR) and exits 1 if any query errored
or ran over budget.
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def attempt(sf_dir, sql, ceiling):
    """Run one query under the ceiling on a fresh connection.
    Returns ('ok', secs) | ('over', ceiling) | ('err', msg)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    err = []

    def run():
        try:
            con.execute(sql).fetchall()
        except Exception as e:  # noqa: BLE001 — reported below
            err.append(str(e))

    t0 = time.monotonic()
    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(ceiling)
    out = ("ok", time.monotonic() - t0)
    if th.is_alive():
        con.interrupt()
        th.join(30)
        out = ("over", ceiling)
    elif err:
        out = ("err", err[0][:300])
    try:
        con.close()
    except Exception:  # noqa: BLE001 — already recorded
        pass
    return out


def main():
    sf_dir, path, ceiling = sys.argv[1], sys.argv[2], float(sys.argv[3])
    only = set(sys.argv[4:])
    oracle = json.load(open(path))
    bad = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        status, detail = attempt(sf_dir, sql, ceiling)
        retried = False
        if status == "over":
            # one retry after a pause: a transient host-contention
            # spike (the suite's Spark JVM gc'ing, a concurrent build)
            # passes the second attempt; a true plan pathology — the
            # markov-twin class this gate exists for — fails both
            time.sleep(2.0)
            status, detail = attempt(sf_dir, sql, ceiling)
            retried = True
        if status == "over":
            print(f"OVER {name}: exceeded {ceiling}s twice")
            bad.append(name)
        elif status == "err":
            print(f"ERR {name}: {detail}")
            bad.append(name)
        else:
            note = " (retry; first attempt over under load)" \
                if retried else ""
            print(f"OK {name}: {detail:.2f}s{note}")
    if bad:
        print(f"OVER-BUDGET/ERROR: {len(bad)}: {' '.join(sorted(bad))}")
        sys.exit(1)
    print(f"all {len(oracle) if not only else len(only)} twins in budget")


if __name__ == "__main__":
    main()
