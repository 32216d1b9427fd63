#!/usr/bin/env python3
"""Local correctness pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads outDir/<name>/ parquet (written by graft.Verify) and outDir/oracle_sql.json,
runs each oracle SQL in DuckDB with the sfDir tables registered as views,
and compares row counts, sorted column names, and value hashes (rounded-str).
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = con.execute(sql)
            want_rows = want.fetchall()
            want_cols = [d[0] for d in want.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_rows = got.fetchall()
            got_cols = [d[0] for d in got.description]
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            n_fail += 1
            continue
        if len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(want_rows)}")
            n_fail += 1
            continue
        # Driver-compare emulation: if the driver fetches via pandas, a
        # DuckDB HUGEINT (sum of ints, hugeint %) becomes float64 -> "5.0"
        # vs Spark's int64 "5" -> hash mismatch on every row even though
        # fetchall values are identical. Flag any float-vs-int dtype split.
        try:
            odf = con.execute(sql).df()
            sdf = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            bad = [c for c in odf.columns if c in sdf.columns
                   and (("float" in str(odf[c].dtype)) != ("float" in str(sdf[c].dtype)))]
            if bad:
                print(f"FAIL {name}: float/int dtype split (pandas-mode driver hazard): "
                      + ", ".join(f"{c} oracle={odf[c].dtype} spark={sdf[c].dtype}" for c in bad))
                n_fail += 1
                continue
        except Exception as e:
            print(f"WARN {name}: dtype probe failed: {e}")
        hg, hw = table_hash(got_rows, got_cols), table_hash(want_rows, want_cols)
        if hg != hw:
            print(f"FAIL {name}: hash mismatch ({len(got_rows)} rows)")
            # show first differing line
            og = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            ow = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
            gl = sorted("|".join(canon(r[i]) for i in og) for r in got_rows)
            wl = sorted("|".join(canon(r[i]) for i in ow) for r in want_rows)
            for a, b in zip(gl, wl):
                if a != b:
                    print(f"  spark : {a}\n  oracle: {b}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
