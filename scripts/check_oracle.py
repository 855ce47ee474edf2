#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.
Usage: check_oracle.py <verify_out_dir> [sf_dir]"""
import duckdb, json, sys, os
out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_r1'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for tbl in ['region','nation','customer','supplier','part','orders','lineitem',
            'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf}/{tbl}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    d = f'{out}/{name}'
    if not os.path.exists(d):
        fails.append((name, 'missing spark output')); continue
    sdf = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
    try:
        ddf = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f'duckdb error: {e}')); continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1).astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    a, b = norm(sdf), norm(ddf)
    if list(a.columns) != list(b.columns):
        fails.append((name, f'cols {list(a.columns)} vs {list(b.columns)}')); continue
    if len(a) != len(b):
        fails.append((name, f'rows {len(a)} vs {len(b)}')); continue
    if not a.equals(b):
        fails.append((name, f'value diff:\n{a.compare(b).head(3)}'))
    else:
        print(f'OK   {name} ({len(a)} rows)')
for n, m in fails: print(f'FAIL {n}: {m}')
print(f'\n{len(oracle)-len(fails)}/{len(oracle)} match')
sys.exit(1 if fails else 0)
