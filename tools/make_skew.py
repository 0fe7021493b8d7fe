"""Derive a SKEWED twin of an sf dir (a local tool, not a driver
artifact): same tables, same row counts, zipfian key mass + a near-dup
mega-family — the "real corpora are zipfian" execution axis (VERDICT
r12 item 3). The full oracle gate must still pass on it (every query is
recomputed by DuckDB from the same files), so this axis tests the
ENGINE's behavior under skew — straggler tasks, hot LSH buckets, giant
duplicate clusters — with correctness held fixed.

    python3 tools/make_skew.py [src_sf_dir] [dst_dir] [tables_csv]

The optional tables_csv restricts derivation to a subset (e.g.
"documents,embeddings" to skew the sf10 heavy-family corpus — the
skew x 100x-scale composition, BASELINE round-13). Rewritten tables are
written as 16-file dirs like the other generators (see write_multifile
there); untouched dimension tables are copied as-is, file or dir.

What it skews (deterministic: every table draws from its own PCG64
seeded on md5("42:<table>"), so a tables_csv subset run produces
bit-identical skew for each table it does generate — ADVICE r13):
 - orders.o_custkey, events.user_id, lineitem.l_suppkey: remapped to a
   zipf(a=1.3) draw over the existing key set — one viral customer /
   user / supplier carries ~30-40% of the fact rows, so every join or
   group on those keys sees a hot key.
 - documents: 5% of docs (doc_id % 20 == 7) become one NEAR-DUP
   mega-family — the min doc's text plus a tiny per-doc tail (so they
   are near- not exact-duplicates); n_chars recomputed. LSH banding
   collides the whole family into shared buckets; the duplicate graph
   gets one giant cluster.
 - embeddings: the same 5% become copies of the min vec's embedding —
   one hot IVF/LSH cell.

pyarrow round-trips the driver's physical types exactly (ns timestamps
stay ns)."""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import hashlib

SRC = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
DST = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_sf01_skew'
TABLES = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None


def want(t):
    return TABLES is None or t in TABLES


def table_rng(name):
    """Per-table generator so each table's skew is invariant to which
    OTHER tables a tables_csv subset run skips (ADVICE r13: one shared
    stream meant tables_csv=lineitem drew different zipf values than a
    full run). md5, not hash(): Python's hash() is salted per-process."""
    seed = int.from_bytes(hashlib.md5(f'42:{name}'.encode()).digest()[:8], 'little')
    return np.random.Generator(np.random.PCG64(seed))


def copy_table(src, dst):
    """Copy a table that may be a single parquet file OR the 16-file
    directory shape the scale-twin generators emit (ADVICE r13:
    shutil.copyfile raises IsADirectoryError on the latter)."""
    import os
    import shutil
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    elif os.path.exists(dst):
        os.remove(dst)
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copyfile(src, dst)


def write_multifile(out, path, files=16):
    import os
    import shutil
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)
    os.makedirs(path)
    step = (out.num_rows + files - 1) // files
    for i in range(files):
        lo = i * step
        if lo >= out.num_rows:
            break
        pq.write_table(out.slice(lo, step), f'{path}/part-{i:03d}.parquet',
                       row_group_size=65536)

ZIPF_A = 1.3


def zipf_remap(rng, keys, n):
    """n zipf draws over the sorted unique key array (rank 1 = hottest)."""
    uniq = np.sort(np.unique(keys))
    draws = rng.zipf(ZIPF_A, size=n)
    return uniq[(draws - 1) % len(uniq)]


def set_col(tab, name, values, typ=None):
    idx = tab.schema.get_field_index(name)
    arr = pa.array(values, type=typ or tab.schema.field(idx).type)
    return tab.set_column(idx, tab.schema.field(idx), arr)


def main():
    import os
    os.makedirs(DST, exist_ok=True)

    for t in ['region', 'nation', 'customer', 'supplier', 'part']:
        if not want(t):
            continue
        copy_table(f'{SRC}/{t}.parquet', f'{DST}/{t}.parquet')
        print(f'{t}: copied')

    if want('orders'):
        cust = pq.read_table(f'{SRC}/customer.parquet').column('c_custkey').to_numpy()
        orders = pq.read_table(f'{SRC}/orders.parquet')
        ck = zipf_remap(table_rng('orders'), cust, orders.num_rows)
        orders = set_col(orders, 'o_custkey', ck)
        write_multifile(orders, f'{DST}/orders.parquet')
        top = np.bincount(np.searchsorted(np.sort(np.unique(cust)), ck)).max()
        print(f'orders: o_custkey zipfed, hottest customer holds {top}/{orders.num_rows} rows')

    if want('lineitem'):
        supp2 = pq.read_table(f'{SRC}/supplier.parquet').column('s_suppkey').to_numpy()
        li = pq.read_table(f'{SRC}/lineitem.parquet')
        sk = zipf_remap(table_rng('lineitem'), supp2, li.num_rows)
        li = set_col(li, 'l_suppkey', sk)
        write_multifile(li, f'{DST}/lineitem.parquet')
        print(f'lineitem: l_suppkey zipfed over {len(np.unique(supp2))} suppliers')

    if want('events'):
        ev = pq.read_table(f'{SRC}/events.parquet')
        users = ev.column('user_id').to_numpy()
        uk = zipf_remap(table_rng('events'), users, ev.num_rows)
        ev = set_col(ev, 'user_id', uk)
        write_multifile(ev, f'{DST}/events.parquet')
        topu = np.bincount(np.searchsorted(np.sort(np.unique(users)), uk)).max()
        print(f'events: user_id zipfed, hottest user holds {topu}/{ev.num_rows} rows')

    if want('documents'):
        docs = pq.read_table(f'{SRC}/documents.parquet')
        ids = docs.column('doc_id').to_numpy()
        texts = docs.column('text').to_pylist()
        fam = (ids % 20) == 7
        base_text = texts[int(np.argmin(ids))]
        out_texts = [
            (base_text + f' tail {int(i) % 11}') if f else t
            for t, f, i in zip(texts, fam, ids)
        ]
        docs = set_col(docs, 'text', out_texts, pa.string())
        if 'n_chars' in docs.schema.names:
            docs = set_col(docs, 'n_chars', [len(t) for t in out_texts])
        write_multifile(docs, f'{DST}/documents.parquet')
        print(f'documents: {int(fam.sum())}/{len(ids)} docs -> one near-dup mega-family')

    if want('embeddings'):
        # independent of the documents block (ADVICE r13: an
        # embeddings-only subset must not read — or require — documents)
        embt = pq.read_table(f'{SRC}/embeddings.parquet')
        vids = embt.column('vec_id').to_numpy()
        vecs = embt.column('embedding').to_pylist()
        vfam = (vids % 20) == 7
        base_vec = vecs[int(np.argmin(vids))]
        out_vecs = [base_vec if f else v for v, f in zip(vecs, vfam)]
        embt = set_col(embt, 'embedding', out_vecs)
        write_multifile(embt, f'{DST}/embeddings.parquet')
        print(f'embeddings: {int(vfam.sum())}/{len(vids)} vectors -> one hot cell')


if __name__ == '__main__':
    main()
