#!/usr/bin/env python3
"""Row-for-row comparison of two graft.Verify dumps — the
partitioning-determinism probe (SPARK_GRAFT_CPUS A vs B must produce
IDENTICAL results for every query: exact decimal sums + explicit
rounding + total ORDER BY make this hold by construction).

Usage: compare_dumps.py DUMP_A DUMP_B
Prints one line per query (rows + identical/DIFF) and a summary with
exact counts, so the probe's denominator is auditable.
"""
import sys
import os
import pandas as pd


def load(qdir):
    parts = sorted(
        os.path.join(qdir, f) for f in os.listdir(qdir)
        if f.endswith(".parquet"))
    if not parts:
        raise RuntimeError(f"no parquet in {qdir}")
    df = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
    # column-name order + full row sort: physical order is not part of
    # the contract being probed, value identity is
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(a_root, b_root):
    qs = sorted(d for d in os.listdir(a_root)
                if os.path.isdir(os.path.join(a_root, d)))
    qs_b = {d for d in os.listdir(b_root)
            if os.path.isdir(os.path.join(b_root, d))}
    missing = [q for q in qs if q not in qs_b] + \
        [q for q in sorted(qs_b) if q not in qs]
    same, diff = [], []
    for q in qs:
        if q not in qs_b:
            continue
        da, db = load(os.path.join(a_root, q)), load(os.path.join(b_root, q))
        ok = (list(da.columns) == list(db.columns)
              and len(da) == len(db)
              and da.equals(db))
        print(f"{'OK  ' if ok else 'DIFF'} {q} rows={len(da)}")
        (same if ok else diff).append(q)
    print(f"== {len(same)} identical, {len(diff)} different, "
          f"{len(missing)} missing ==")
    if missing:
        print("missing:", ", ".join(missing))
    if diff:
        print("different:", ", ".join(diff))
        sys.exit(1)
    if missing:
        sys.exit(2)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
