#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query output
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the same sf directory and compare row-for-row (columns sorted by name,
rows sorted, values compared with exact equality for non-floats and
1e-9-relative tolerance reporting for floats so we can see HOW close)."""
import json, math, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    pdir = f"{out_dir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        results[name] = "NO_SPARK_OUTPUT"
        continue
    try:
        exp = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    got = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").fetch_arrow_table()
    # sort columns by name (driver semantics), then sort rows
    ecols = sorted(exp.column_names)
    gcols = sorted(got.column_names)
    if ecols != gcols:
        results[name] = f"SCHEMA_MISMATCH spark={gcols} oracle={ecols}"
        continue
    def skey(row):  # None-safe, mixed-type-safe sort key
        return tuple((v is None, str(type(v)), str(v)) for v in row)
    e_rows = sorted([tuple(r[c] for c in ecols) for r in exp.select(ecols).to_pylist()], key=skey)
    g_rows = sorted([tuple(r[c] for c in gcols) for r in got.select(gcols).to_pylist()], key=skey)
    if len(e_rows) != len(g_rows):
        results[name] = f"ROWCOUNT spark={len(g_rows)} oracle={len(e_rows)}"
        continue
    bad = None
    for i, (er, gr) in enumerate(zip(e_rows, g_rows)):
        for c, (ev, gv) in zip(ecols, zip(er, gr)):
            if ev == gv:
                continue
            if isinstance(ev, float) and isinstance(gv, float):
                if ev == gv or (math.isnan(ev) and math.isnan(gv)):
                    continue
                rel = abs(ev - gv) / max(1e-300, abs(ev))
                bad = f"FLOAT_DIFF row{i} col={c} oracle={ev!r} spark={gv!r} rel={rel:.2e}"
            else:
                bad = f"VALUE_DIFF row{i} col={c} oracle={ev!r} spark={gv!r}"
            break
        if bad:
            break
    results[name] = bad or "OK"

n_ok = sum(1 for v in results.values() if v == "OK")
for name, v in sorted(results.items()):
    print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else "  " + str(v)))
print(f"\n{n_ok}/{len(results)} oracle-checked queries pass")
# queries with no oracle: report rows-only
declared = set(oracle)
for pdir in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(pdir.rstrip("/"))
    if name not in declared:
        try:
            n = con.execute(f"SELECT count(*) FROM '{pdir}/*.parquet'").fetchone()[0]
            print(f"ROWS-ONLY {name}: {n} rows")
        except Exception as e:
            print(f"ROWS-ONLY {name}: ERROR {e}")
