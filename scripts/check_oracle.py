#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare to the Verify parquet dumps
(columns sorted by name, rows sorted, value hash)."""
import duckdb, glob, json, sys, os

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    # probe for spark output BEFORE running the oracle — a filtered
    # SPARK_GRAFT_VERIFY_ONLY run dumps a subset, and the corpus-wide
    # all-pairs oracles take an hour each; don't pay that for absent dumps
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fail += 1
        continue
    got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    schema_exp = [(c, str(exp[c].dtype)) for c in exp.columns]
    schema_got = [(c, str(got[c].dtype)) for c in got.columns]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fail += 1
        continue
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    eq = es.astype(str).equals(gs.astype(str))
    if not eq:
        diff = (es.astype(str) != gs.astype(str))
        bad = diff.any(axis=1)
        print(f"FAIL {name}: value mismatch ({bad.sum()} rows); first:")
        print("  exp:", es[bad].head(3).to_dict("records"))
        print("  got:", gs[bad].head(3).to_dict("records"))
        fail += 1
        continue
    stype = "" if schema_exp == schema_got else f" [dtype diff: {[(a,b) for a,b in zip(schema_exp,schema_got) if a!=b]}]"
    print(f"OK   {name}: {len(exp)} rows{stype}")
print(f"\n{len(oracle)-fail}/{len(oracle)} passed")
sys.exit(1 if fail else 0)
