#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each Verify.scala
result parquet, run the corresponding oracle SQL in DuckDB over the same
source tables, and compare (sorted rows, exact values).

Usage: python3 tools/check_oracles.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_glob:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({res_glob!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        g_cols, w_cols = sorted(got.columns), sorted(want.columns)
        if g_cols != w_cols:
            print(f"FAIL {name}: columns {g_cols} != {w_cols}")
            n_fail += 1
            continue
        g = got[g_cols].sort_values(g_cols, ignore_index=True)
        w = want[w_cols].sort_values(w_cols, ignore_index=True)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        # exact value compare, column by column
        bad = None
        for c in g_cols:
            gv, wv = g[c].tolist(), w[c].tolist()
            if gv != wv:
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(gv, wv))
                         if a != b and not (a != a and b != b)][:3]
                if diffs:
                    bad = (c, diffs)
                    break
        if bad:
            print(f"FAIL {name}: col {bad[0]} diffs {bad[1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
