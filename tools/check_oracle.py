#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle check.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

For each query in <verify_out_dir>/oracle_sql.json: run the SQL in DuckDB
(tables = parquet files of <sf_dir>), load the Spark parquet result, sort
columns by name, compare row-by-row. Doubles must match EXACTLY — any
non-exact double fails the query (stricter than a tolerance check, so a
local PASS can't hide noise the driver might flag); mismatches under 1e-9
relative are tagged "close" in the failure detail for triage.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if not list(Path(out_dir).glob(f"{name}/*.parquet")):
            continue  # filtered Verify run — only check what was dumped
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sdf = duckdb.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        odf = odf[sorted(odf.columns)]
        sdf = sdf[sorted(sdf.columns)]
        if list(odf.columns) != list(sdf.columns):
            print(f"FAIL {name}: columns differ: oracle={list(odf.columns)} "
                  f"spark={list(sdf.columns)}")
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: row count differ: oracle={len(odf)} "
                  f"spark={len(sdf)}")
            n_fail += 1
            continue
        bad = []
        for i in range(len(odf)):
            for c in odf.columns:
                a, b = odf[c].iloc[i], sdf[c].iloc[i]
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    # the driver hashes BYTES: -0.0 and 0.0 are == here
                    # but hash-differ there (round-10 q318 incident)
                    if a == b == 0.0 and math.copysign(1, a) != math.copysign(1, b):
                        bad.append((i, c, repr(a), repr(b), "neg-zero"))
                        continue
                    if a != b:
                        bad.append((i, c, a, b,
                                    "close" if abs(a - b) <= 1e-9 * max(1, abs(a)) else "FAR"))
                else:
                    if str(a) != str(b):
                        bad.append((i, c, a, b, "type/val"))
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatches, first 5: {bad[:5]}")
            n_fail += 1
        else:
            # also verify dtype compatibility
            print(f"PASS {name} rows={len(odf)}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} with oracle ==")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
