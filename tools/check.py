#!/usr/bin/env python3
"""Local oracle-parity harness (dev only — mirrors the driver's t2 check).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
fixture parquet tables, loads the Spark result parquet written by
graft.Verify, sorts columns by name, and compares cell-by-cell.
"""
import duckdb, json, sys, glob

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

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
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"[MISS]   {name}: no spark output"); fail += 1; continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[ORACLE] {name}: {e}"); fail += 1; continue
        try:
            sdf = con.execute(f"SELECT * FROM read_parquet('{files[0]}')").fetchdf()
        except Exception as e:
            print(f"[SPARK]  {name}: {e}"); fail += 1; continue
        o = odf[sorted(odf.columns)]
        s = sdf[sorted(sdf.columns)]
        if list(o.columns) != list(s.columns):
            print(f"[SCHEMA] {name}: oracle={list(o.columns)} spark={list(s.columns)}")
            fail += 1; continue
        if len(o) != len(s):
            print(f"[ROWS]   {name}: oracle={len(o)} spark={len(s)}"); fail += 1; continue
        bad = None
        for c in o.columns:
            ov = o[c].astype(str).values
            sv = s[c].astype(str).values
            neq = ov != sv
            if neq.any():
                i = int(neq.argmax())
                bad = (c, i, ov[i], sv[i])
                break
        if bad:
            c, i, a, b = bad
            print(f"[VALUE]  {name}: col={c} row={i} oracle={a!r} spark={b!r}")
            fail += 1
        else:
            print(f"[OK]     {name} ({len(o)} rows)")
            ok += 1
    print(f"== {ok} ok, {fail} fail ==")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
