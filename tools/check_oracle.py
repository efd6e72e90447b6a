#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [--exact]

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir
parquet tables, sorts columns by name (mirroring the driver), sorts
rows, and compares values. Prints PASS/FAIL per query.

--exact mirrors the driver's exact-hash gate: float values must be
bit-equal (no 1e-9 tolerance), and a column whose pandas dtype kind is
integer on one side but float on the other FAILS even when every value
compares equal as a float (the q188 class: DuckDB HUGEINT rendered as
float64 vs Spark int64 — the driver hashes the rendering, so "1" vs
"1.0" mismatches). Without --exact those dtype divergences are
reported as warnings.

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


def dtype_mismatches(g: pd.DataFrame, w: pd.DataFrame):
    """Columns whose numeric kind diverges (int on one side, float on the
    other) — the class the driver's exact hash fails on even when every
    value is tolerance-equal (int64 1 renders "1", float64 1.0 renders
    "1.0")."""
    bad = []
    for col in g.columns:
        gk, wk = g[col].dtype.kind, w[col].dtype.kind
        num = {"i", "u", "f"}
        if gk in num and wk in num and (gk == "f") != (wk == "f"):
            bad.append(f"{col}: spark={g[col].dtype} oracle={w[col].dtype}")
    return bad


def compare(name, got: pd.DataFrame, want: pd.DataFrame, exact=False):
    """Returns (error, warns): error is None on pass; warns lists risk
    flags for the driver's hash-based compare (tolerance-only equality,
    int-vs-float dtype divergence). With exact=True those risks ARE
    errors, mirroring the driver."""
    if sorted(got.columns) != sorted(want.columns):
        return (f"COLUMNS differ: spark={sorted(got.columns)} "
                f"oracle={sorted(want.columns)}"), []
    if len(got) != len(want):
        return f"ROWS differ: spark={len(got)} oracle={len(want)}", []
    g, w = canon(got), canon(want)
    warns = []
    dt = dtype_mismatches(g, w)
    if dt:
        if exact:
            return f"DTYPE differ (int vs float): {'; '.join(dt)}", []
        warns.append(f"{len(dt)} int-vs-float dtype col(s): {'; '.join(dt)}")
    n_inexact = 0
    for col in g.columns:
        gv, wv = g[col].tolist(), w[col].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            pa = a is None or (isinstance(a, float) and math.isnan(a))
            pb = b is None or (isinstance(b, float) and math.isnan(b))
            if pa and pb:
                continue
            if pa != pb or not values_equal(a, b, exact):
                return (f"VALUE differ col={col} row={i}: "
                        f"spark={a!r} oracle={b!r}"), warns
            if not values_equal(a, b, exact=True):
                n_inexact += 1
    if n_inexact:
        warns.append(f"{n_inexact} values only tolerance-equal")
    return None, warns


def main():
    exact = "--exact" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--exact"]
    out_dir, sf_dir = args[0], args[1]
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
        err, warns = compare(name, got, want, exact)
        if err:
            results[name] = err
        elif warns:
            results[name] = f"PASS (⚠ {'; '.join(warns)})"
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
