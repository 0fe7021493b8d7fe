import duckdb, json, glob, os, sys
import pandas as pd

sf = '/root/testdata/sf0.01'
out = '/tmp/vout'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    spark_df = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    duck_df = con.sql(sql).df()
    def norm(df):
        df = df[sorted(df.columns)]
        for c in df.columns:
            if df[c].dtype == object: df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    a, b = norm(spark_df), norm(duck_df)
    schema_a = [(c, str(a[c].dtype)) for c in a.columns]
    schema_b = [(c, str(b[c].dtype)) for c in b.columns]
    ok_schema = [c for c,_ in schema_a] == [c for c,_ in schema_b]
    ok_rows = len(a) == len(b)
    ok_vals = ok_schema and ok_rows and a.equals(b)
    status = 'OK' if ok_vals else 'MISMATCH'
    if not ok_vals:
        fails.append(name)
        print(f"{name}: {status} rows={len(a)}/{len(b)} cols={schema_a}/{schema_b}")
        if ok_schema and ok_rows:
            diff = (a != b) & ~(a.isna() & b.isna())
            idx = diff.any(axis=1)
            print('  first diffs:'); print(a[idx].head(3)); print(b[idx].head(3))
    else:
        print(f"{name}: OK ({len(a)} rows)")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match; fails: {fails}")
