#!/usr/bin/env python3
"""Local dev-loop oracle check (mirrors the driver's t2 gate).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads oracle_sql.json from the verify output dir, registers the sfDir
parquet tables as DuckDB views, runs each oracle SQL, and compares
(row count, column names, sorted values) against the parquet the Spark
Verify main wrote. NOT part of the Scala library — python/duckdb are
driver-side tools.

GRAFT_CHECK_TIMEOUT=<seconds> bounds each ORACLE query (sf10 probe:
DuckDB's interpreted list_reduce distance folds grind on the 200k-vec
IVF CTEs); a timed-out query prints TIMEOUT and counts neither pass
nor fail — the probe artifact records it as unswept.
"""
import json, math, os, sys, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # optional: regex filter + reverse order, so two instances can sweep
    # a long (sf1) registry from both ends concurrently — DuckDB's heavy
    # recursive-CTE queries leave most cores idle
    import re as _re
    name_re = sys.argv[3] if len(sys.argv) > 3 and sys.argv[3] != "-" else None
    reverse = "--reverse" in sys.argv
    items = sorted(oracles.items(), reverse=reverse)
    if name_re:
        items = [(n, s) for n, s in items if _re.search(name_re, n)]
    timeout = float(os.environ.get("GRAFT_CHECK_TIMEOUT", "0")) or None
    n_pass = n_fail = n_timeout = 0
    for name, sql in items:
        try:
            timer = None
            if timeout:
                timer = threading.Timer(timeout, con.interrupt)
                timer.start()
            try:
                exp = con.sql(sql).fetchall()
                cols_exp = [d[0] for d in con.sql(sql).description]
            except (duckdb.InterruptException, RuntimeError) as ix:
                if timer and not timer.is_alive():
                    print(f"TIMEOUT {name}: oracle exceeded {timeout:.0f}s in DuckDB")
                    n_timeout += 1
                    continue
                raise ix
            finally:
                if timer:
                    timer.cancel()
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got = got_rel.fetchall()
            cols_got = [d[0] for d in got_rel.description]
            # sort columns by name (driver semantics), then sort rows
            def norm(rows, cols):
                idx = [cols.index(c) for c in sorted(cols)]
                return sorted(tuple(canon(r[i]) for i in idx) for r in rows)
            if sorted(cols_exp) != sorted(cols_got):
                print(f"FAIL {name}: cols oracle={sorted(cols_exp)} spark={sorted(cols_got)}")
                n_fail += 1
            elif norm(exp, cols_exp) != norm(got, cols_got):
                e, g = norm(exp, cols_exp), norm(got, cols_got)
                diff = next(((i, a, b) for i, (a, b) in enumerate(zip(e, g)) if a != b),
                            ("len", len(e), len(g)))
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)} first-diff={diff}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(exp)} rows)")
                n_pass += 1
        except Exception as ex:
            print(f"ERROR {name}: {ex}")
            n_fail += 1
    tmo = f", {n_timeout} oracle-timeout" if n_timeout else ""
    print(f"== {n_pass} pass, {n_fail} fail{tmo} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
