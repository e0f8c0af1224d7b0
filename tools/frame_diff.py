#!/usr/bin/env python3
"""Transitive certification between two graft.Verify/ScaleVerify dump
dirs (dev tool, driver-side only — the engine is pure Scala/Spark).

When a DuckDB compare has already certified dump A (a multi-hour oracle
at replica scale) and the engine is rebuilt at a later HEAD whose changes
should not touch those queries, re-running the whole DuckDB compare is
waste: dump the SAME queries at the new HEAD into dir B and prove, per
query, that B's frame equals A's frame (sorted columns, sorted rows,
exact values — the same normalization check_oracle.py applies before its
value compare). Then B == A and A == oracle together certify B == oracle
without re-running DuckDB. Any query whose frame drifts is listed and
MUST be re-oracled the slow way.

Usage: python3 tools/frame_diff.py <dirA> <dirB> [name1,name2,…]
  (names default to every query dir present in BOTH, excluding `tables`)
Exit 0 iff every compared query is frame-equal.
"""
import sys

import pandas as pd

from check_oracle import normalize


def main(dir_a: str, dir_b: str, only=None) -> int:
    import os
    names = sorted(
        n for n in os.listdir(dir_a)
        if os.path.isdir(os.path.join(dir_a, n)) and n != "tables"
        and os.path.isdir(os.path.join(dir_b, n)))
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = 0
    for name in names:
        a = normalize(pd.read_parquet(f"{dir_a}/{name}"))
        b = normalize(pd.read_parquet(f"{dir_b}/{name}"))
        if list(a.columns) != list(b.columns):
            print(f"DRIFT {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"DRIFT {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        bad = [c for c in a.columns
               if not ((a[c] == b[c]) | (a[c].isna() & b[c].isna())).all()]
        if bad:
            print(f"DRIFT {name}: value drift in cols {bad}")
            n_fail += 1
        else:
            print(f"EQUAL {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} equal, {n_fail} drifted ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
