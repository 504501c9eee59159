#!/usr/bin/env python3
"""Dtype-strict stand-in for the driver's correctness gate.

The driver sorts columns by name, sorts rows, and HASHES the values — a
compare that is sensitive to dtype/format (int64 vs float64 vs Decimal), not
just numeric equality. tools/check_oracles.py compares Python values (where
1 == 1.0), which let 6 dtype mismatches through in rounds 1-2. This checker
fails on ANY of:
  - pandas dtype mismatch between Spark-result and oracle frames,
  - bit-level value mismatch (floats compared via struct-packed bits),
  - pd.util.hash_pandas_object digest mismatch,
and it checks the Spark parquet through BOTH read paths (duckdb and pyarrow)
since we don't know which the driver uses.

Usage: python3 tools/check_oracles_strict.py <sfDir> <outDir>
"""
import sys, json, glob, os, struct
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    return df.sort_values(cols, ignore_index=True)


def frame_sig(df):
    """Per-column (dtype, value-bits) signature; floats by IEEE bit pattern."""
    sig = {}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            vals = tuple(None if v != v else struct.pack("<d", v)
                         for v in s.tolist())
        else:
            vals = tuple(repr(v) for v in s.tolist())
        sig[c] = (str(s.dtype), vals)
    return sig


def diff_sigs(name, a, b, la, lb):
    ok = True
    for c in a:
        da, va = a[c]
        db, vb = b[c]
        if da != db:
            print(f"FAIL {name}: col {c} dtype {la}={da} != {lb}={db}")
            ok = False
        elif va != vb:
            n = sum(1 for x, y in zip(va, vb) if x != y)
            i = next(i for i, (x, y) in enumerate(zip(va, vb)) if x != y)
            print(f"FAIL {name}: col {c} {n} value diffs ({la} vs {lb}), "
                  f"first at row {i}: {va[i]!r} != {vb[i]!r}")
            ok = False
    return ok


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_glob:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        try:
            got_dd = con.execute(
                f"SELECT * FROM read_parquet({res_glob!r})").fetchdf()
            got_pa = pq.read_table(res_glob[0]).to_pandas()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(got_dd.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got_dd.columns)} != "
                  f"{sorted(want.columns)}")
            n_fail += 1
            continue
        if len(got_dd) != len(want):
            print(f"FAIL {name}: rows {len(got_dd)} != {len(want)}")
            n_fail += 1
            continue
        w = frame_sig(canon(want))
        ok = diff_sigs(name, frame_sig(canon(got_dd)), w, "spark.duckdb",
                       "oracle")
        ok &= diff_sigs(name, frame_sig(canon(got_pa)), w, "spark.pyarrow",
                        "oracle")
        if ok:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
