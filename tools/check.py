#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Reads the Verify output directory (spark parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same testdata parquet tables, and
compares: schema (column names sorted), row count, and values (rows sorted
by all columns, column order normalized by name). Exact compare, with a
tiny epsilon report for floats so rounding hazards surface early.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, math, hashlib
import duckdb

def frame_hash(df):
    """md5 over the sorted frame, serialized so that integer-vs-float
    representation differences change the hash (like the driver's)."""
    h = hashlib.md5()
    for _, row in df.iterrows():
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                s = "<null>"
            else:
                s = str(v)
            h.update(s.encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {e}"
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            results[name] = f"SCHEMA-MISMATCH spark={s_cols} duck={d_cols}"
            continue
        if len(spark_df) != len(duck_df):
            results[name] = f"ROWS-MISMATCH spark={len(spark_df)} duck={len(duck_df)}"
            continue
        a = spark_df[s_cols].sort_values(by=s_cols, na_position="first").reset_index(drop=True)
        b = duck_df[d_cols].sort_values(by=d_cols, na_position="first").reset_index(drop=True)
        diffs = []
        for c in s_cols:
            av, bv = a[c], b[c]
            for i in range(len(av)):
                x, y = av.iloc[i], bv.iloc[i]
                if x is None and y is None:
                    continue
                try:
                    if isinstance(x, float) or isinstance(y, float):
                        xf = float('nan') if x is None else float(x)
                        yf = float('nan') if y is None else float(y)
                        if math.isnan(xf) and math.isnan(yf):
                            continue
                        if xf != yf:
                            diffs.append((c, i, x, y, abs(xf - yf)))
                    elif str(x) != str(y):
                        diffs.append((c, i, x, y, None))
                except Exception:
                    diffs.append((c, i, x, y, None))
                if len(diffs) > 5:
                    break
            if len(diffs) > 5:
                break
        if diffs:
            results[name] = f"VALUE-MISMATCH {diffs[:3]}"
            continue
        # Hash stage: mirror the driver's md5-over-sorted-values compare.
        # Numeric value-compare above forgives representation differences
        # (int64 1 vs float64 1.0 from a DuckDB HUGEINT) that the driver's
        # hash does NOT forgive — so serialize dtype-sensitively.
        ha, hb = frame_hash(a), frame_hash(b)
        if ha != hb:
            dt = [(c, str(a[c].dtype), str(b[c].dtype)) for c in s_cols
                  if str(a[c].dtype) != str(b[c].dtype)]
            results[name] = f"HASH-MISMATCH dtype-diffs={dt}"
        else:
            results[name] = f"OK rows={len(spark_df)}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    noor = sum(1 for v in results.values() if v.startswith("NO-ORACLE"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith(('OK','NO-ORACLE')) else 'FAIL':4} {k}: {v}")
    print(f"\n{ok} OK, {noor} no-oracle, {len(results)-ok-noor} failing, {len(results)} total")
    sys.exit(0 if ok + noor == len(results) else 1)

if __name__ == "__main__":
    main()
