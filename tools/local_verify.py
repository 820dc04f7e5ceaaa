#!/usr/bin/env python3
"""Local parity harness mirroring the driver's DuckDB oracle check.

Usage: python3 tools/local_verify.py <sf_dir> <verify_out_dir> [query ...]

Reads each <verify_out_dir>/<name> parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB over the raw tables, then
compares: column set (sorted by name), row count, and exact values after
sorting rows. Reports per-query PASS/FAIL with a diff summary.
"""
import duckdb
import json
import math
import sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        sdf = sdf[scols].sort_values(scols, ignore_index=True)
        odf = odf[ocols].sort_values(ocols, ignore_index=True)
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        bad = []
        for c in scols:
            sv, ov = sdf[c], odf[c]
            if sv.dtype.kind == 'f' or ov.dtype.kind == 'f':
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sv, ov))
                         if not (a == b or (isinstance(a, float) and isinstance(b, float)
                                            and math.isnan(a) and math.isnan(b)))]
            else:
                neq = sv.astype(str) != ov.astype(str)
                diffs = [(i, sv[i], ov[i]) for i in neq[neq].index]
            if diffs:
                i, a, b = diffs[0]
                bad.append(f"{c}: {len(diffs)} diffs, first@{i}: spark={a!r} oracle={b!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
