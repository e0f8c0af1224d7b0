#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only — the
engine itself is pure Scala/Spark; this script just lets us run the same
DuckDB-oracle comparison the driver runs, between rounds).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [name1,name2,…]

For each query dumped by graft.Verify into <verifyOutDir>/<name>/ (parquet)
with SQL in <verifyOutDir>/oracle_sql.json, runs the SQL in DuckDB over the
same testdata tables and compares: column names (sorted), row count, and
values (exact; floats reported with max-abs-diff when not bit-equal).
"""
import datetime
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp resolutions (ns vs us) to us
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # Spark DATE columns arrive as object-dtype datetime.date while
            # DuckDB DATEs arrive as datetime64 — the driver treats these as
            # the same logical type (date-typed queries are driver-green),
            # so coerce before the dtype-kind gate below sees them.
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], datetime.date) \
                    and not isinstance(sample.iloc[0], datetime.datetime):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].map(
                    lambda v: tuple(v.tolist()) if hasattr(v, "tolist")
                    else (tuple(v) if isinstance(v, list) else v))
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="last")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # partial table dirs are fine (a ScaleVerify replica ships only
        # the tables its queries read); a query against a missing view
        # still fails loudly below. Spark-written tables are DIRECTORIES
        # of part files — glob those.
        for src in (f"{sf_dir}/{t}.parquet", f"{sf_dir}/{t}.parquet/*.parquet"):
            try:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
                break
            except Exception:
                pass
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    results = {}  # name -> row dict, dumped if CHECK_ORACLE_JSON is set

    def record(name, ok, why, rows=None):
        results[name] = {"pass": ok, "rows": rows, "err": why}

    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark dump unreadable: {e}")
            record(name, False, f"spark dump unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, False, f"oracle SQL error: {e}")
            n_fail += 1
            continue
        got, want = normalize(got), normalize(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} "
                  f"duck={list(want.columns)}")
            record(name, False, "column mismatch")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
            record(name, False, f"rows spark={len(got)} duck={len(want)}")
            n_fail += 1
            continue
        # Dtype gate: the driver hashes TYPED values, so a DuckDB HUGEINT
        # (sum of BIGINT) that pandas materializes as float64 hash-diverges
        # from Spark's int64 even when every value is numerically equal —
        # and `==` below cannot see it (1234567 == 1234567.0 is True).
        # This is exactly what let x26 ship driver-red for three rounds
        # while staying green here. Fail on dtype-KIND mismatch (int vs
        # float, numeric vs object) before value comparison.
        kind_bad = []
        for c in got.columns:
            ka, kb = got[c].dtype.kind, want[c].dtype.kind
            if ka != kb and not ({ka, kb} <= {"i", "u"}):
                kind_bad.append(f"col {c}: spark={got[c].dtype} duck={want[c].dtype}")
        if kind_bad:
            print(f"FAIL {name}: dtype mismatch (driver hash would diverge): "
                  + "; ".join(kind_bad))
            record(name, False, "dtype mismatch: " + "; ".join(kind_bad))
            n_fail += 1
            continue
        diffs = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                bad = (~eq).sum()
                detail = ""
                if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                    detail = f" maxabsdiff={(a - b).abs().max():.3e}"
                i = (~eq).idxmax()
                detail += f" first@{i}: spark={a[i]!r} duck={b[i]!r}"
                diffs.append(f"col {c}: {bad} mismatches{detail}")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs))
            record(name, False, "; ".join(diffs), rows=len(got))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            record(name, True, None, rows=len(got))
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    import os
    json_out = os.environ.get("CHECK_ORACLE_JSON")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    names = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], names))
