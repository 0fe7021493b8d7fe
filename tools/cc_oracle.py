"""Split-oracle check for the dedup-survivor queries whose DuckDB replay
dies on the RECURSIVE closure at large scale (p36 at the derived sf1:
`reach` materializes |component|^2 rows over ~2.4M verified edges —
BASELINE.md round-11).

The delicate part of those oracles is everything BEFORE the closure:
candidate generation and the cosine-verification numerics. The closure
itself (connected components + min-id survivor) is 20 lines of
union-find. So: DuckDB replays the oracle's own CTE chain up to
`verified` (the SQL is taken verbatim from the dump's oracle_sql.json
and truncated at the first closure CTE — no second copy to drift), a
Python union-find replays the closure, and the survivor set is compared
exactly with the Spark dump.

Validated by construction: at every scale where the FULL recursive
oracle runs (sf0.001/sf0.01/sf0.1, green in compare_oracle), this tool
must agree with it, since both consume the same `verified` edges — run
it there first, then at the scale that needs it.

    GRAFT_ORACLE_MEM=100GB python3 tools/cc_oracle.py <sf_dir> <verify_out_dir> [query]
"""
import json
import re
import os
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/vout'
name = sys.argv[3] if len(sys.argv) > 3 else 'p36_semantic_dedup'

# Only the min-id-survivor oracles apply: the replay hardcodes the
# component-min-id keep policy and a vec_id/doc_id universe. p76's
# quality-keyed survivor (max n_chars, tie min id) ALSO has a `sym AS`
# cut point, so without this guard it would "run" and report a spurious
# MISMATCH at exactly the scale where no full oracle can disambiguate.
APPLICABLE = {'p36_semantic_dedup', 'p11_neardup_dedup', 'p17_neardup_star'}
if name not in APPLICABLE:
    sys.exit(f"{name}: not a min-id-survivor oracle this tool can replay "
             f"(applicable: {sorted(APPLICABLE)})")

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']

sql = json.load(open(f'{out}/oracle_sql.json'))[name]
# cut the oracle at its closure: the survivor oracles all follow
# `verified` with a `sym AS` (undirected edge doubling) CTE; cut at the
# comma that introduces it (whitespace/newline may separate the two)
m = re.search(r',\s*sym\s+AS\b', sql)
if m is None:
    sys.exit(f"{name}: oracle has no closure CTE (`sym AS`) to replace")
head = sql[:m.start()]
# WITH RECURSIVE with no recursive CTE left is still valid SQL in DuckDB
edges_sql = head + ' SELECT id_a, id_b FROM verified'

con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('GRAFT_ORACLE_MEM', '48GB')}'")
con.sql("SET temp_directory='/tmp/duckdb_spill'")
for t in TABLES:
    p = f'{sf}/{t}.parquet'
    if not os.path.exists(p):
        continue  # heavy-family probe dirs carry only documents/embeddings
    src = p + '/*.parquet' if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

edges = con.sql(edges_sql).fetchall()
# the survivor oracles end `SELECT <id> FROM <table> ... LEFT JOIN comp
# ... WHERE comp.id IS NULL UNION ALL SELECT <id> FROM keep`: the
# universe is every id of the dumped id column's source table
id_col = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet' LIMIT 0").columns[0]
table = {'vec_id': 'embeddings', 'doc_id': 'documents'}[id_col]
universe = [r[0] for r in con.sql(f'SELECT {id_col} FROM {table}').fetchall()]

# union-find over the verified edges
parent = {}


def find(x):
    r = x
    while parent.get(r, r) != r:
        r = parent[r]
    while parent.get(x, x) != x:  # path compression
        parent[x], x = r, parent[x]
    return r


for a, b in edges:
    ra, rb = find(a), find(b)
    if ra != rb:
        # union by min id keeps the root the component minimum
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra

in_graph = set()
for a, b in edges:
    in_graph.add(a)
    in_graph.add(b)
survivors = sorted(x for x in universe
                   if x not in in_graph or find(x) == x)

got = sorted(r[0] for r in
             con.sql(f"SELECT {id_col} FROM '{out}/{name}/*.parquet'").fetchall())
ok = got == survivors
extra, missing = [], []
if not ok:
    ss, gs = set(survivors), set(got)
    extra = [x for x in got if x not in ss][:5]
    missing = [x for x in survivors if x not in gs][:5]
print(f"{name}: {'OK' if ok else 'MISMATCH'} "
      f"edges={len(edges)} components={len({find(x) for x in in_graph})} "
      f"survivors={len(survivors)} spark={len(got)}"
      + ('' if ok else f" extra={extra} missing={missing}"))
sys.exit(0 if ok else 1)
