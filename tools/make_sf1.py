"""Derive a 10x-replicated "sf1" dataset from sf0.1 for NUMERIC-ROBUSTNESS
probes (a local tool, not a driver artifact): each replicated table is
concatenated 10 times with its key columns shifted by i*OFFSET for copy
i, so uniqueness and within-copy join integrity hold; fixed dims
(region, nation) copy as-is. pyarrow round-trips the driver's physical
types exactly (the ns-timestamp columns Spark reads under
spark.sql.legacy.parquet.nanosAsLong must stay ns — a DuckDB rewrite
would quietly retype them).

    python3 tools/make_sf1.py [src_sf_dir] [dst_dir] [copies] [tables_csv]

The optional tables_csv restricts generation to a subset (e.g.
"documents,embeddings" for the sf10 heavy-family probe, where
replicating lineitem 100x would buy nothing).

The point of the probe (VERDICT r9 item 6): magnitudes — counts, sums,
df/idf numerators, quantized-rational intermediates — grow 10x past the
driver's sf0.1 sweep, so any conversion/overflow divergence class (the
q21 ulp class, the p64/p65 decimal-presentation class) surfaces here
before the driver's next scale jump.
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
DST = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_sf1'
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
TABLES = set(sys.argv[4].split(',')) if len(sys.argv) > 4 else None
# far above any sf0.1 key (max l_orderkey ~ 6e5), far below 2^63/10
OFFSET = 1_000_000_000

SHIFT = {
    'customer': ['c_custkey'],
    'supplier': ['s_suppkey'],
    'part': ['p_partkey'],
    'orders': ['o_orderkey', 'o_custkey'],
    'lineitem': ['l_orderkey', 'l_partkey', 'l_suppkey'],
    'events': ['event_id', 'user_id'],
    'documents': ['doc_id'],
    'embeddings': ['vec_id'],
}
COPY_AS_IS = ['region', 'nation']



def write_multifile(out, path, files=16):
    """Write a table as a DIRECTORY of `files` parquet parts (the
    many-file shape production inputs actually have): a single-file
    table gives Spark ~rows/65536 splittable row groups and a sea of
    empty byte-range tasks, which poisons scan-stage task medians."""
    import shutil
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)
    os.makedirs(path)
    n = out.num_rows
    step = (n + files - 1) // files
    for i in range(files):
        lo = i * step
        if lo >= n:
            break
        pq.write_table(out.slice(lo, step), f'{path}/part-{i:03d}.parquet',
                       row_group_size=65536)

def main():
    os.makedirs(DST, exist_ok=True)
    for t in COPY_AS_IS:
        if TABLES and t not in TABLES:
            continue
        shutil.copyfile(f'{SRC}/{t}.parquet', f'{DST}/{t}.parquet')
        print(f'{t}: copied')
    for t, keys in SHIFT.items():
        if TABLES and t not in TABLES:
            continue
        tab = pq.read_table(f'{SRC}/{t}.parquet')
        parts = [tab]
        for i in range(1, COPIES):
            shifted = tab
            for k in keys:
                idx = shifted.schema.get_field_index(k)
                newcol = pc.add(shifted.column(k), i * OFFSET)
                shifted = shifted.set_column(idx, shifted.schema.field(idx), newcol)
            parts.append(shifted)
        out = pa.concat_tables(parts)
        write_multifile(out, f'{DST}/{t}.parquet')
        print(f'{t}: {tab.num_rows} -> {out.num_rows} rows')


if __name__ == '__main__':
    main()
