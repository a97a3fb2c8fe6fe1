#!/usr/bin/env python3
"""Driver-faithful local parity harness (dev only — mirrors the driver's t2).

Round-1 lesson (VERDICT.md "What's wrong" #4): the old harness read the
SPARK parquet back through DuckDB and string-compared, which silently
coerced DECIMAL->float64 on both sides and passed 12 queries the driver
fails. The driver instead reads the Spark parquet directly (Decimal objects
survive), runs the oracle through DuckDB's fetchdf() (DECIMAL becomes
float64), pandas-lexsorts both frames, and hashes them — so a dtype
divergence IS a failure even when the printed values are equal, and an
ARRAY-typed output column crashes the sort outright.

This harness reproduces that behavior:
  - Spark side: pandas.read_parquet (pyarrow), NO DuckDB round-trip.
  - Oracle side: duckdb.execute(sql).fetchdf().
  - Canonicalize: columns sorted by name, rows lexsorted by all columns
    (raises on ndarray cells, like the driver -> reported as [ERR]).
  - Compare: dtype-faithful. Numeric kind/width mismatches (Decimal-object
    vs float64, int32 vs int64) are failures. Date/datetime representations
    are normalized to datetime64[ns] first (the driver's hash is satisfied
    by equal date values across date-object/Timestamp encodings — every
    r01 date-emitting query passed while every Decimal-emitting one failed).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import datetime
import glob
import json
import sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    # The driver's pandas lexsort: ndarray cells raise TypeError here,
    # exactly as they do in the driver (CORRECTNESS_r01 'err' entries).
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def is_dateish(series):
    vals = [v for v in series if v is not None and not (isinstance(v, float) and v != v)]
    return bool(vals) and all(isinstance(v, (datetime.date, datetime.datetime)) for v in vals)


def norm_dateish(series):
    return pd.to_datetime(series).values.astype("datetime64[ns]")


def column_diff(name, o, s):
    """Return None if the driver would hash these columns equal, else a reason."""
    # NOTE: treating date-object vs datetime64 encodings as hash-equal is
    # an EMPIRICAL inference from round-1 driver behavior (every r01
    # date-emitting query passed), not read from the driver's hash code.
    # If a date-emitting query ever fails driver-side while locally green,
    # re-check this branch first (ADVICE r2).
    o_date = o.dtype.kind == "M" or (o.dtype.kind == "O" and is_dateish(o))
    s_date = s.dtype.kind == "M" or (s.dtype.kind == "O" and is_dateish(s))
    if o_date and s_date:
        # int64 view: NaT becomes a sentinel that compares equal to itself
        ov, sv = norm_dateish(o).astype("int64"), norm_dateish(s).astype("int64")
        if not np.array_equal(ov, sv):
            i = int(np.argmax(ov != sv))
            return f"col={name} row={i} oracle={ov[i]} spark={sv[i]} (ns since epoch)"
        return None
    if o.dtype.kind != s.dtype.kind:
        return f"col={name} dtype kind mismatch: oracle={o.dtype} spark={s.dtype}"
    if o.dtype.kind == "O":
        for i, (a, b) in enumerate(zip(o.values, s.values)):
            a_null = a is None or (isinstance(a, float) and a != a)
            b_null = b is None or (isinstance(b, float) and b != b)
            if a_null or b_null:
                if a_null != b_null:
                    return f"col={name} row={i} oracle={a!r} spark={b!r}"
                continue
            if isinstance(a, Decimal) != isinstance(b, Decimal):
                return (f"col={name} row={i} value-type mismatch: "
                        f"oracle={type(a).__name__}({a!r}) spark={type(b).__name__}({b!r})")
            if a != b:
                return f"col={name} row={i} oracle={a!r} spark={b!r}"
        return None
    if o.dtype != s.dtype:
        return f"col={name} dtype mismatch: oracle={o.dtype} spark={s.dtype}"
    ov, sv = o.values, s.values
    eq = np.array_equal(ov, sv, equal_nan=True) if o.dtype.kind == "f" \
        else np.array_equal(ov, sv)
    if not eq:
        neq = ~(ov == sv)
        if o.dtype.kind == "f":
            neq &= ~(np.isnan(ov) & np.isnan(sv))
        i = int(np.argmax(neq))
        return f"col={name} row={i} oracle={ov[i]!r} spark={sv[i]!r}"
    return None


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"[MISS]   {name}: no spark output"); fail += 1; continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[ORACLE] {name}: {e}"); fail += 1; continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        except Exception as e:
            print(f"[SPARK]  {name}: {e}"); fail += 1; continue
        if sorted(odf.columns) != sorted(sdf.columns):
            print(f"[SCHEMA] {name}: oracle={sorted(odf.columns)} spark={sorted(sdf.columns)}")
            fail += 1; continue
        if len(odf) != len(sdf):
            print(f"[ROWS]   {name}: oracle={len(odf)} spark={len(sdf)}"); fail += 1; continue
        try:
            o, s = canon(odf), canon(sdf)
        except Exception as e:
            print(f"[ERR]    {name}: driver-style sort crashed: {type(e).__name__}: {e}")
            fail += 1; continue
        bad = None
        for c in o.columns:
            bad = column_diff(c, o[c], s[c])
            if bad:
                break
        if bad:
            print(f"[HASH]   {name}: {bad}"); fail += 1
        else:
            print(f"[OK]     {name} ({len(o)} rows)"); ok += 1
    # No-oracle queries: the driver still reads + lexsorts the Spark output
    # for its rows-only check, so an ARRAY-typed column crashes there too.
    import os
    declared = sorted(d for d in os.listdir(outdir)
                      if os.path.isdir(f"{outdir}/{d}") and d not in oracle)
    for name in declared:
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"[MISS]   {name}: no spark output"); fail += 1; continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            canon(sdf)
        except Exception as e:
            print(f"[ERR]    {name}: no-oracle sort crashed: {type(e).__name__}: {e}")
            fail += 1; continue
        print(f"[OK-no]  {name} ({len(sdf)} rows, rows-only)"); ok += 1
    print(f"== {ok} ok, {fail} fail ==")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
