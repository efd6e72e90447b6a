#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir
parquet tables, sorts columns by name (mirroring the driver), sorts
rows, and compares values. Prints PASS/FAIL per query.

Dev-tool only (driver-side python); not part of the Spark library.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b, exact=False) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if exact:
            return fa == fb
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(
            values_equal(x, y, exact) for x, y in zip(la, lb))
    return a == b or str(a) == str(b)


def compare(name, got: pd.DataFrame, want: pd.DataFrame):
    """Returns (error, n_inexact): error is None on pass; n_inexact counts
    values equal only within tolerance — a risk flag for the driver's
    hash-based compare."""
    if sorted(got.columns) != sorted(want.columns):
        return (f"COLUMNS differ: spark={sorted(got.columns)} "
                f"oracle={sorted(want.columns)}"), 0
    if len(got) != len(want):
        return f"ROWS differ: spark={len(got)} oracle={len(want)}", 0
    g, w = canon(got), canon(want)
    n_inexact = 0
    for col in g.columns:
        gv, wv = g[col].tolist(), w[col].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            pa = a is None or (isinstance(a, float) and math.isnan(a))
            pb = b is None or (isinstance(b, float) and math.isnan(b))
            if pa and pb:
                continue
            if pa != pb or not values_equal(a, b):
                return (f"VALUE differ col={col} row={i}: "
                        f"spark={a!r} oracle={b!r}"), n_inexact
            if not values_equal(a, b, exact=True):
                n_inexact += 1
    return None, n_inexact


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "NO SPARK OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                        ignore_index=True)
        if name not in oracles:
            results[name] = f"rows-only: {len(got)} rows (no oracle)"
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        err, n_inexact = compare(name, got, want)
        if err:
            results[name] = err
        elif n_inexact:
            results[name] = f"PASS (⚠ {n_inexact} values only tolerance-equal)"
        else:
            results[name] = "PASS"
    width = max(len(n) for n in results) if results else 0
    n_pass = 0
    for name in sorted(results):
        r = results[name]
        ok = r.startswith("PASS") or r.startswith("rows-only")
        n_pass += int(r.startswith("PASS"))
        print(f"{'✓' if ok else '✗'} {name:<{width}}  {r}")
    n_oracle = sum(1 for n in results if n in oracles)
    print(f"\n{n_pass}/{n_oracle} oracle queries pass; "
          f"{len(results) - n_oracle} rows-only")
    sys.exit(0 if n_pass == n_oracle else 1)


if __name__ == "__main__":
    main()
