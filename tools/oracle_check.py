#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate (NOT part of the
shipped library — the engine itself is pure Scala/Spark).

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads <out>/oracle_sql.json, runs each SQL in DuckDB against the parquet
fixtures, and compares with the Spark parquet dump in <out>/<name>/:
column names (sorted), row count, and a canonical value hash.
"""
import sys, json, glob, hashlib
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]

def main(out_dir, sf_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            srel = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})")
            scols = [d[0] for d in srel.description]
            srows = srel.fetchall()
            orel = con.execute(sql)
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
            # separate statement AFTER fetchall: con.execute shares one
            # cursor, so an interleaved DESCRIBE would clobber orel
            # fetchall, not .df(): keep this script pandas-free
            otypes = [str(r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        # The real driver may fetch through pandas/arrow, where DuckDB
        # HUGEINT (e.g. an uncast SUM over integers) renders as float or
        # Decimal and hash-mismatches Spark's BIGINT even when the values
        # are equal via fetchall. Surface those as loud warnings.
        for c, t in zip(ocols, otypes):
            if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL"):
                print(f"WARN {name}: oracle column {c} is {t} — cast it "
                      f"(BIGINT/DOUBLE) or the driver's pandas fetch may mismatch")
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
        elif table_hash(srows, scols) != table_hash(orows, ocols):
            print(f"FAIL {name}: hash mismatch ({len(srows)} rows)")
            # show first differing line
            so = sorted("|".join(canon(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows)
            oo = sorted("|".join(canon(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows)
            for a, b in zip(so, oo):
                if a != b:
                    print(f"  spark:  {a[:200]}\n  oracle: {b[:200]}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
