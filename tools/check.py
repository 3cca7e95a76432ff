#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the shared
testdata tables, sorts columns by name and rows by value, and compares.
"""
import duckdb, glob, json, math, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (2, "NaN")
        return (1, round(v, 9))
    return (1, str(v)) if not isinstance(v, (int, str, bool, bytes)) else (1, v)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING {name}: no spark output")
            n_bad += 1
            continue
        try:
            # Portability lint FIRST: the driver loads results through
            # pandas, which renders HUGEINT as float64 (hash mismatch vs
            # Spark's int64) and crashes sorting list/struct cells
            # ("unhashable numpy.ndarray"). tools/check.py used to
            # stringify both, silently passing queries the driver rejects
            # (the r6 meta-bug: 5 red rows the local gate called green).
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
            bad_types = [(c, t) for c, t, *_ in desc
                         if "HUGEINT" in t.upper()
                         or any(k in t.upper()
                                for k in ("[]", "STRUCT", "MAP(", "LIST"))]
            if bad_types:
                print(f"PORTABILITY {name}: driver-unsafe oracle column types "
                      f"{bad_types} (CAST to BIGINT / serialize to string)")
                n_bad += 1
                continue
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {str(e).splitlines()[0][:160]}")
            n_bad += 1
            continue
        s_desc = con.execute(
            f"DESCRIBE (SELECT * FROM '{out_dir}/{name}/*.parquet')").fetchall()
        s_bad = [(c, t) for c, t, *_ in s_desc
                 if any(k in t.upper() for k in ("[]", "STRUCT", "MAP(", "LIST"))]
        if s_bad:
            print(f"PORTABILITY {name}: driver-unsafe SPARK column types "
                  f"{s_bad} (serialize to string before writing)")
            n_bad += 1
            continue
        s = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_cols = [d[0] for d in s.description]
        s_rows = s.fetchall()
        if sorted(o_cols) != sorted(s_cols):
            print(f"SCHEMA  {name}: oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            n_bad += 1
            continue
        o_ix = [o_cols.index(c) for c in sorted(o_cols)]
        s_ix = [s_cols.index(c) for c in sorted(s_cols)]
        o_set = sorted(tuple(norm(r[i]) for i in o_ix) for r in o_rows)
        s_set = sorted(tuple(norm(r[i]) for i in s_ix) for r in s_rows)
        if o_set == s_set:
            print(f"OK      {name}: {len(s_rows)} rows")
            n_ok += 1
        else:
            print(f"MISMATCH {name}: oracle {len(o_rows)} rows vs spark {len(s_rows)} rows")
            only_o = [r for r in o_set if r not in s_set][:3]
            only_s = [r for r in s_set if r not in o_set][:3]
            print(f"  cols: {sorted(o_cols)}")
            print(f"  only-oracle: {only_o}")
            print(f"  only-spark:  {only_s}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
