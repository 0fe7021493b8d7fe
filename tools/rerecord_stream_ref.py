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
reference's host frame and rewrites exactly those entries, leaving every
non-streaming entry untouched.

Frame mapping (ADVICE r14): each isolated query ran in its OWN child
JVM, so its time is normalized by that child's OWN canary legs —
Bench's aux line now carries `"child_cal":{"<full_name>":[s,e],...}`.
Pass a bench LOG (aux lines + headline) and the per-child legs are
used; a headline-only file falls back to the parent-frame leg
interpolation with a warning (the pre-r15 behavior, which mixed the
parent artifact's host frame into child-measured times).

    python3 tools/rerecord_stream_ref.py <bench_log_or_headline.json> [ref.json]
"""
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / 'tools'))
from bench_ratio import host_legs, load_headline, positions  # noqa: E402

STREAM_KEYS = {'p82', 'p83', 'p84', 'p85', 'p86', 'p87', 'p88', 'p89',
               'p90', 'p91', 'p95'}


def load_lines(path):
    """(headline, aux_steady_or_None): scans the file for the last
    {"metric"... line and the last {"steady_full"... line; a file that
    is one bare JSON object still resolves through load_headline."""
    aux = None
    head = None
    try:
        for line in open(path):
            t = line.strip()
            if t.startswith('{"steady_full"'):
                aux = json.loads(t)
            elif t.startswith('{"metric"'):
                head = json.loads(t)
    except (json.JSONDecodeError, UnicodeDecodeError):
        pass
    if head is None:
        head = load_headline(path)
    return head, aux


def main():
    art, aux = load_lines(sys.argv[1])
    ref_path = sys.argv[2] if len(sys.argv) > 2 else str(REPO / 'tools/bench_ref.json')
    ref = json.load(open(ref_path))
    sa, ea, _ = host_legs(art)
    sr, er, _ = host_legs(ref)
    const = (art.get('host_cal') or [0, 0, 0.53])[-1] or 0.53
    child_cal = (aux or {}).get('child_cal')
    if isinstance(child_cal, dict):
        # keyed by FULL query name; headline keys are the short prefix
        child_by_short = {k.split('_')[0]: v for k, v in child_cal.items()}
    else:
        child_by_short = {}
        print('WARNING: no per-child child_cal map found (headline-only '
              'artifact?) — falling back to parent-frame leg '
              'interpolation, which mixes frames for child-measured '
              'times', file=sys.stderr)
    pos = positions(art['queries'])
    changed = {}
    for q, t in art['queries'].items():
        if q not in STREAM_KEYS:
            continue
        legs = child_by_short.get(q)
        if legs and len(legs) == 2 and const:
            # the child's own frame: mean of its two canary legs
            fa = ((legs[0] + legs[1]) / 2.0) / const
        else:
            fa = sa + pos[q] * (ea - sa)
        fr = sr + pos[q] * (er - sr)
        v = round(t * fr / fa, 2)
        changed[q] = (ref['queries'].get(q), v)
        ref['queries'][q] = v
    ref['note'] = (ref.get('note', '') +
        ' Round-15: streaming-family entries re-recorded using each '
        'child JVM\'s OWN canary legs (child_cal map) mapped into this '
        'record\'s host frame — the r14 leg interpolation mixed the '
        'parent artifact\'s frame into child-measured times.')
    ref['value'] = round(sum(ref['queries'].values()), 1)
    json.dump(ref, open(ref_path, 'w'), indent=1)
    for q, (old, new) in sorted(changed.items()):
        print(f'{q}: {old} -> {new}')


if __name__ == '__main__':
    main()
