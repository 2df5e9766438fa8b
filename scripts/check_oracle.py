#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs DuckDB oracle."""
import duckdb, json, sys
out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['lineitem','orders','customer','documents','embeddings','events','part','supplier','nation','region']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
if len(sys.argv) > 3:  # optional comma-separated query-name filter (dev)
    names = set(sys.argv[3].split(','))
    oracle = {k: v for k, v in oracle.items() if k in names}
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        got = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
        exp = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
        got = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
        ok = exp.shape == got.shape and list(exp.columns) == list(got.columns) and \
             list(exp.dtypes) == list(got.dtypes) and exp.equals(got)
        print(f"{name}: {'OK' if ok else 'MISMATCH'} shape={exp.shape}/{got.shape}")
        if not ok:
            fails += 1
            print("  dtypes exp:", dict(exp.dtypes.astype(str)), "got:", dict(got.dtypes.astype(str)))
            if exp.shape == got.shape and list(exp.columns) == list(got.columns):
                diff = (exp != got) & ~(exp.isna() & got.isna())
                idx = diff.any(axis=1)
                if idx.any():
                    print("  exp:", exp[idx].head(3).to_dict('records'))
                    print("  got:", got[idx].head(3).to_dict('records'))
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {e}")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
