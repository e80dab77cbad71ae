#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]

Runs each oracle SQL from outdir/oracle_sql.json in DuckDB against the
parquet tables in sfdir, loads the Spark result parquet from outdir/<name>/,
sorts columns by name and rows by value, and diffs. Exit 0 iff all match.
"""
import json, sys, glob, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle SQL error: {e}"); continue
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: spark result missing: {e}"); continue
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        fails.append(name)
        print(f"FAIL {name}: columns differ: oracle={ocols} spark={scols}")
        continue
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    if len(o) != len(s):
        fails.append(name)
        print(f"FAIL {name}: row count differs: oracle={len(o)} spark={len(s)}")
        continue
    diff_cells = []
    for c in ocols:
        ov, sv = o[c].tolist(), s[c].tolist()
        for i, (a, b) in enumerate(zip(ov, sv)):
            same = (a == b) or (
                isinstance(a, float) and isinstance(b, float)
                and (math.isnan(a) and math.isnan(b) or a == b))
            if not same:
                diff_cells.append((c, i, a, b))
                if len(diff_cells) > 4: break
        if len(diff_cells) > 4: break
    if diff_cells:
        fails.append(name)
        print(f"FAIL {name}: {len(diff_cells)}+ cell diffs, e.g. {diff_cells[:3]}")
    else:
        print(f"OK   {name} ({len(o)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
