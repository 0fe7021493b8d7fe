"""Derive a C-copy "fresh-content" scale twin of documents/embeddings.

`make_sf1.py` replicates VERBATIM: every source doc gains C-1 exact
twins, so near-dup families grow C x and candidate PAIRS grow C^2 x —
the right stress for the mega-duplicate path (see make_skew.py), but
the wrong shape for measuring engine scaling, where the realistic
contract is "C x more data, SAME duplicate rate".

This tool keeps copy 0 verbatim and MUTATES copies 1..C-1 so that
cross-copy similarity falls below every near-dup threshold the engine
uses, while within-copy structure (the driver's planted near-twin
families, token-length profile, n_chars, vector norms) is preserved:

  - documents: each token is independently replaced, with probability
    MUT_RATE keyed on md5(token, position, copy), by a same-LENGTH
    pseudo-token (md5-derived lowercase letters). Two copies then share
    ~(1-r)^2 of token positions => Jaccard ~ 0.3 at r=0.45, far under
    the 0.7/0.8 near-dup thresholds, while a copy's own planted
    near-twins mutate IDENTICALLY (same doc text => same mutation) and
    so keep their within-copy similarity.
  - embeddings: each copy applies one seeded coordinate permutation to
    every vector. Norms and component distributions are untouched, and
    cross-copy cosine drops well below the usual ~0.8+ dup thresholds.
    NOTE: it does NOT drop below p36's deliberately-low 0.2 threshold
    (the driver's vectors are structured, so permuted copies keep
    residual correlation) — at C=10, p36's sub-cap cells do all-pairs
    and the corpus collapses to one survivor per cell (confirmed by the
    split oracle: 8 = 8); at C=100 the 25k-vector cells engage the
    hot-cell star-edge guard, which is the path the probe measures.

    python3 tools/make_sf_fresh.py [src_sf_dir] [dst_dir] [copies]

Key shift matches make_sf1.py (i * 1_000_000_000) so the same probe
queries run unchanged.
"""
import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
DST = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_sf10f'
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 100
OFFSET = 1_000_000_000
MUT_RATE = 0.45
ALPHA = 'abcdefghijklmnopqrstuvwxyz'



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

def pseudo_token(tok: str, pos: int, copy: int) -> str:
    h = hashlib.md5(f'{tok}\x00{pos}\x00{copy}'.encode()).digest()
    # same length as the original so n_chars stays exact
    need = len(tok)
    out = []
    i = 0
    while len(out) < need:
        out.append(ALPHA[h[i % 16] % 26])
        i += 1
        if i % 16 == 0:
            h = hashlib.md5(h).digest()
    return ''.join(out)


def mutate_text(text: str, copy: int) -> str:
    toks = text.split(' ')
    out = []
    for pos, tok in enumerate(toks):
        gate = hashlib.md5(f'{tok}\x01{pos}\x01{copy}'.encode()).digest()[0]
        if tok and gate < MUT_RATE * 256:
            out.append(pseudo_token(tok, pos, copy))
        else:
            out.append(tok)
    return ' '.join(out)


def documents():
    tab = pq.read_table(f'{SRC}/documents.parquet')
    parts = [tab]
    texts = tab.column('text').to_pylist()
    for i in range(1, COPIES):
        shifted = tab.set_column(
            tab.schema.get_field_index('doc_id'), tab.schema.field('doc_id'),
            pc.add(tab.column('doc_id'), i * OFFSET))
        mutated = pa.array([mutate_text(t, i) for t in texts], pa.string())
        shifted = shifted.set_column(
            shifted.schema.get_field_index('text'),
            shifted.schema.field('text'), mutated)
        parts.append(shifted)
    out = pa.concat_tables(parts)
    write_multifile(out, f'{DST}/documents.parquet')
    print(f'documents: {tab.num_rows} -> {out.num_rows} rows')


def embeddings():
    tab = pq.read_table(f'{SRC}/embeddings.parquet')
    vecs = np.array(tab.column('embedding').to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    parts = [tab]
    for i in range(1, COPIES):
        rng = np.random.default_rng(1234 + i)
        perm = rng.permutation(dim)
        permuted = vecs[:, perm]
        emb = pa.array(list(permuted), pa.list_(pa.float32()))
        t = tab.set_column(
            tab.schema.get_field_index('vec_id'), tab.schema.field('vec_id'),
            pc.add(tab.column('vec_id'), i * OFFSET))
        t = t.set_column(t.schema.get_field_index('embedding'),
                         t.schema.field('embedding'), emb)
        parts.append(t)
    out = pa.concat_tables(parts)
    write_multifile(out, f'{DST}/embeddings.parquet')
    print(f'embeddings: {tab.num_rows} -> {out.num_rows} rows')


if __name__ == '__main__':
    os.makedirs(DST, exist_ok=True)
    documents()
    embeddings()
