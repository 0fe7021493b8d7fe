"""Re-record the STREAMING-family bench_ref entries from a fresh-JVM-
per-query artifact (round-14 methodology change, VERDICT r13 item #1).

Why: the round-12 reference recorded p82–p91 IN-SUITE, where ~450 prior
executions leave state-store/shuffle/JIT residue — r12 and r13 each
burned a judge re-run refuting a >2x flag that a fresh JVM contradicted.
Bench now measures every *_stream* query in its own child JVM (solo,
warmup + min-of-2), which is reproducible by construction; comparing
those numbers against in-suite-frame references is meaningless in both
directions (p86's ref is inflated by residue, p82's is deflated by suite
warmth). This tool maps the artifact's streaming values into the
reference's host frame (same per-position leg interpolation
bench_ratio.py uses) and rewrites exactly those entries + adds p95,
leaving every non-streaming entry untouched.

    python3 tools/rerecord_stream_ref.py <headline.json> [ref.json]
"""
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / 'tools'))
from bench_ratio import host_legs, load_headline, positions  # noqa: E402

STREAM_KEYS = {'p82', 'p83', 'p84', 'p85', 'p86', 'p87', 'p88', 'p89',
               'p90', 'p91', 'p95'}


def main():
    art = load_headline(sys.argv[1])
    ref_path = sys.argv[2] if len(sys.argv) > 2 else str(REPO / 'tools/bench_ref.json')
    ref = json.load(open(ref_path))
    sa, ea, _ = host_legs(art)
    sr, er, _ = host_legs(ref)
    pos = positions(art['queries'])
    changed = {}
    for q, t in art['queries'].items():
        if q not in STREAM_KEYS:
            continue
        fa = sa + pos[q] * (ea - sa)
        fr = sr + pos[q] * (er - sr)
        v = round(t * fr / fa, 2)
        changed[q] = (ref['queries'].get(q), v)
        ref['queries'][q] = v
    ref['note'] = (ref.get('note', '') +
        ' Round-14: streaming-family entries (p82-p91, +p95 new) '
        're-recorded from a fresh-JVM-per-query artifact mapped into '
        'this record\'s host frame (leg interpolation) — Bench now '
        'isolates each *_stream* query in its own child JVM, so the '
        'in-suite-frame values would misread both ways.')
    ref['value'] = round(sum(ref['queries'].values()), 1)
    json.dump(ref, open(ref_path, 'w'), indent=1)
    for q, (old, new) in sorted(changed.items()):
        print(f'{q}: {old} -> {new}')


if __name__ == '__main__':
    main()
