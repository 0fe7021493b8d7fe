"""Probe-debris janitor (VERDICT r14 hygiene): sf10 probe corpora and
verify dumps accumulate in /tmp (graft_sf10full 1.9G, v10full 3.7G, a
dozen smaller vout/v1f/staged dirs) and, combined with a stranded
DuckDB spill, contributed to the round-14 disk squeeze. Run this at
probe start — or any time — to list and (with --delete) remove them.

    python3 tools/janitor.py            # dry run: list debris + sizes
    python3 tools/janitor.py --delete   # remove it
    python3 tools/janitor.py --delete --keep graft_sf10full,v10full

--keep names (comma-separated basenames) survive a --delete — derived
corpora are ~30 min to regenerate, so keep the ones the current round
still reads. The DuckDB spill dir is handled separately by
duck_env.py (per-pid subdirs, swept on exit, dead-pid reaped) and is
only listed here for visibility.

Standing keeps live in tools/keep_manifest.txt (`<basename> <round
recorded> <why>` per line, '#' comments) — the regression-baseline
corpora the NEXT round diffs against, so "what can I delete" never
needs archaeology. Manifest entries are merged with --keep;
--no-manifest ignores the file for a full sweep.
"""
import os
import shutil
import sys

# every probe-artifact family the round tooling writes under /tmp
PATTERNS = ('graft_sf', 'graft_skew', 'graft_test_', 'graft-', 'v10',
            'v1f', 'vout', 'staged_', 'duckdb_spill', 'graft_pub_stage')


def du(path):
    total = 0
    for root, _, files in os.walk(path, onerror=lambda e: None):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'keep_manifest.txt')


def manifest_keeps():
    if not os.path.exists(MANIFEST):
        return {}
    out = {}
    with open(MANIFEST) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            parts = line.split(None, 2)
            out[parts[0]] = parts[2] if len(parts) > 2 else ''
    return out


def main():
    delete = '--delete' in sys.argv
    keep = set()
    manifest = {} if '--no-manifest' in sys.argv else manifest_keeps()
    keep |= set(manifest)
    for i, a in enumerate(sys.argv):
        if a == '--keep' and i + 1 < len(sys.argv):
            keep |= set(sys.argv[i + 1].split(','))
        elif a.startswith('--keep='):
            keep |= set(a.split('=', 1)[1].split(','))
    hits = []
    for d in sorted(os.listdir('/tmp')):
        p = os.path.join('/tmp', d)
        if not os.path.isdir(p):
            continue
        if any(d.startswith(pat) for pat in PATTERNS):
            hits.append((p, du(p), d in keep))
    total = 0
    spill_total = 0
    for p, sz, kept in hits:
        base = os.path.basename(p)
        mark = 'KEEP' if kept else ('DELETE' if delete else 'would-delete')
        if kept and base in manifest:
            mark = 'KEEP (manifest)' 
        if d_is_spill(p):
            mark = 'spill (duck_env-managed)'
        print(f'{sz / (1 << 30):8.2f} GB  {mark:24s} {p}')
        if delete and not kept and not d_is_spill(p):
            shutil.rmtree(p, ignore_errors=True)
        # the spill dir is never touched by --delete (duck_env owns it),
        # so it must not count toward the deleted/reclaimable figure
        if d_is_spill(p):
            spill_total += sz
        elif not kept:
            total += sz
    print(f'{total / (1 << 30):8.2f} GB  total '
          f'{"deleted" if delete else "reclaimable (dry run; --delete)"}')
    if spill_total:
        print(f'{spill_total / (1 << 30):8.2f} GB  duckdb spill '
              f'(managed by duck_env.py, not touched here)')


def d_is_spill(p):
    return os.path.basename(p) == 'duckdb_spill'


if __name__ == '__main__':
    main()
