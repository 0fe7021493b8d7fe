"""Combine N same-tree sf1-tier runs into tools/bench_ref_sf1.json.

    python3 tools/rerecord_sf1.py run1.json [run2.json ...] \
        [--out tools/bench_ref_sf1.json] [--note "..."]

Inputs are SF1_latest.json files (or full bench logs containing the
{"sf1":...} aux line). Same model as rerecord_ref.py: each run's
per-query seconds are normalized into CANONICAL CANARY UNITS by the
run's own leg-interpolated host factor (sf1_cal legs / 0.53), then the
reference takes the per-query MIN across runs. The stored record
carries sf1_cal [0.53, 0.53] so factors are 1.0 by construction.

The point (VERDICT r17 #2): every tier query runs multi-second at sf1,
so a single-run ratio against this reference is engine signal — the
sub-2s sf0.1 tail that produced 100+ false regressions two rounds
running never enters it.
"""
import json
import sys

CANARY = 0.53


def parse(path):
    for line in open(path):
        line = line.strip()
        if line.startswith('{"sf1"'):
            d = json.loads(line)
            return d["sf1"], d["sf1_cal"]
    raise SystemExit(f"{path}: no sf1 aux record found")


def normalize(res, cal):
    fs, fe = cal[0] / CANARY, cal[1] / CANARY
    total = sum(res.values()) or 1.0
    out, cum = {}, 0.0
    for q, t in res.items():
        pos = (cum + t / 2.0) / total
        cum += t
        out[q] = t / (fs + pos * (fe - fs))
    return out


def main():
    argv = sys.argv[1:]
    out_path, note, logs = "tools/bench_ref_sf1.json", None, []
    i = 0
    while i < len(argv):
        if argv[i] == "--out":
            out_path = argv[i + 1]; i += 2
        elif argv[i] == "--note":
            note = argv[i + 1]; i += 2
        else:
            logs.append(argv[i]); i += 1
    if len(logs) < 2:
        raise SystemExit("need >= 2 run records")
    runs = [parse(p) for p in logs]
    keys = list(runs[0][0].keys())
    for r, _ in runs[1:]:
        if set(r) != set(keys):
            raise SystemExit(f"runs disagree on the query set: {set(keys) ^ set(r)}")
    normed = [normalize(r, c) for r, c in runs]
    ref_q = {q: round(min(n[q] for n in normed), 3) for q in keys}
    spread = {q: max(n[q] for n in normed) / max(min(n[q] for n in normed), 1e-9)
              for q in keys}
    worst = sorted(spread.items(), key=lambda kv: -kv[1])[:8]
    total = round(sum(ref_q.values()), 1)
    cals = [c for _, c in runs]
    auto = (f"sf1 heavy-tier reference: {len(logs)} same-tree runs, per-query "
            f"min in canonical canary units (sf1_cal [0.53,0.53] so factors "
            f"are 1.0 by construction). Single-pass warm-from-sf0.1 count() "
            f"methodology, 10x key-shifted input derived fresh per run. Run "
            f"host legs: "
            + "; ".join(f"[{c[0]:.2f},{c[1]:.2f}]" for c in cals)
            + ". Worst cross-run spreads: "
            + ", ".join(f"{q} {s:.2f}x" for q, s in worst) + ".")
    doc = {
        "sf1_cal": [CANARY, CANARY],
        "note": (note + " " + auto) if note else auto,
        "value": total,
        "queries": ref_q,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}: {len(ref_q)} queries, canonical total {total}s")
    print("worst cross-run spreads:",
          ", ".join(f"{q} {s:.2f}x" for q, s in worst))


if __name__ == "__main__":
    main()
