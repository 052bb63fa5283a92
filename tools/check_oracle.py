#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate (SURVEY.md §5 t2).

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each dumped result parquet, executes the matching oracle SQL in DuckDB
over the same fixture tables and compares row count, column names, and a
canonical value hash (columns sorted by name, rows sorted, values stringified).

Dev-only tool — the shipped Scala library has no Python dependency.
Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result dumped")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0])
        s_cols = sorted(spark_tbl.column_names)
        s_rows = [tuple(d[c] for c in spark_tbl.column_names)
                  for d in spark_tbl.to_pylist()]
        try:
            res = con.execute(oracles[name])
            d_cols_raw = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        d_cols = sorted(d_cols_raw)
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duckdb={d_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duckdb={len(d_rows)}")
            n_fail += 1
            continue
        hs = table_hash(spark_tbl.column_names, s_rows)
        hd = table_hash(d_cols_raw, d_rows)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(s_rows)} rows)")
            # show first differing row for debugging
            so = sorted("\x01".join(canon(r[i]) for i in sorted(range(len(spark_tbl.column_names)), key=lambda i: spark_tbl.column_names[i])) for r in s_rows)
            do = sorted("\x01".join(canon(r[i]) for i in sorted(range(len(d_cols_raw)), key=lambda i: d_cols_raw[i])) for r in d_rows)
            for a, b in zip(so, do):
                if a != b:
                    print(f"  spark : {a[:300]}")
                    print(f"  duckdb: {b[:300]}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
