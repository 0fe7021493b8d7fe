"""Driver-replica oracle compare: DuckDB evaluates each oracleSql entry
against the testdata views and the result is hash-compared (sorted
columns, stringified objects, sorted rows) with the Spark dump from
graft.Verify.

    python3 tools/compare_oracle.py [sf_dir] [verify_out_dir]

Each query runs on a FRESH DuckDB connection: one long-lived connection
fragments after memory-heavy oracles (p55's recursive CTE under
memory_limit=48GB at sf0.1) and OOMs the queries evaluated after it —
measured in round 9, where 4 late-alphabet oracles failed on a shared
connection and all matched immediately on fresh ones. Per-connection
view setup costs ~ms; the robustness is worth it at every sf.
"""
import duckdb, json, sys
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/vout'

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def norm(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    con = duckdb.connect()
    con.sql("SET memory_limit='48GB'")
    # spill to disk instead of failing when the host is memory-pressured
    # (back-to-back sweeps at sf0.1 can race each other's page cache)
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    try:
        a = norm(con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df())
        b = norm(con.sql(sql).df())
    except Exception as e:
        fails.append(name)
        print(f"{name}: ERR {str(e)[:160]}")
        con.close()
        continue
    ok_schema = list(a.columns) == list(b.columns)
    ok_rows = len(a) == len(b)
    ok_vals = ok_schema and ok_rows and a.equals(b)
    if not ok_vals:
        fails.append(name)
        schema_a = [(c, str(a[c].dtype)) for c in a.columns]
        schema_b = [(c, str(b[c].dtype)) for c in b.columns]
        print(f"{name}: MISMATCH rows={len(a)}/{len(b)} cols={schema_a}/{schema_b}")
        if ok_schema and ok_rows:
            diff = (a != b) & ~(a.isna() & b.isna())
            idx = diff.any(axis=1)
            print('  first diffs:'); print(a[idx].head(3)); print(b[idx].head(3))
    else:
        print(f"{name}: OK ({len(a)} rows)")
    con.close()
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match; fails: {fails}")
