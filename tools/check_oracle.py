#!/usr/bin/env python3
"""Local imitation of the driver's correctness gate: run graft.Verify output
against DuckDB executing SparkEntry.oracleSql on the same parquet tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Compares, per query: row count, sorted-by-name column set, and cell values
(exact for non-floats, tolerant for floats — the real driver hashes, so we
also report whether the EXACT comparison holds).
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), out

def approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(approx_eq(x, y) for x, y in zip(a, b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet"); failures += 1; continue
        rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_cols, s_rows = canon(rel.fetchall(), list(rel.columns))
        if name not in oracle:
            print(f"okro {name}: rows-only ({len(s_rows)} rows, no oracle)")
            continue
        try:
            orel = con.sql(oracle[name])
            o_cols, o_rows = canon(orel.fetchall(), list(orel.columns))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); failures += 1; continue
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
            failures += 1; continue
        # driver's hash is type-sensitive (e.g. DuckDB HUGEINT vs BIGINT)
        s_types = dict(zip(rel.columns, map(str, rel.types)))
        o_types = dict(zip(orel.columns, map(str, orel.types)))
        tdiff = {c: (s_types[c], o_types[c]) for c in s_types
                 if c in o_types and s_types[c] != o_types[c]}
        if tdiff:
            print(f"FAIL {name}: column types differ spark-vs-oracle: {tdiff}")
            failures += 1; continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            failures += 1; continue
        exact = s_rows == o_rows
        # row-order-insensitive + float-tolerant fallback diagnostics
        if not exact:
            sr, orr = sorted(s_rows, key=repr), sorted(o_rows, key=repr)
            unordered = sr == orr
            approx = all(approx_eq(a, b) for a, b in zip(s_rows, o_rows))
            if not (unordered or approx):
                bad = next((i, a, b) for i, (a, b) in
                           enumerate(zip(s_rows, o_rows)) if not approx_eq(a, b))
                print(f"FAIL {name}: values differ, first at row {bad[0]}:\n"
                      f"  spark : {bad[1]}\n  oracle: {bad[2]}")
                failures += 1; continue
            print(f"WARN {name}: not exact (unordered_match={unordered}, "
                  f"approx_match={approx}) — driver hash may fail")
            failures += 1; continue
        print(f"ok   {name}: {len(s_rows)} rows, exact match")
    print(f"\n{len(names)} queries, {failures} failures")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
