"""Combine N same-tree bench runs into tools/bench_ref.json.

    python3 tools/rerecord_ref.py run1.log run2.log [run3.log ...] \
        [--out tools/bench_ref.json] [--note "..."]

Round-3 precedent, floor-2.0 methodology (VERDICT r16 #1): each run's
per-query steady value is normalized into CANONICAL CANARY UNITS by the
run's own leg-interpolated host factor (same model as bench_ratio.py:
factor = host_cal leg / 0.53, interpolated linearly in cumulative
steady time), then the reference takes the per-query MIN across runs —
the quietest-host measurement of each plan. The stored record carries
host_cal [0.53, 0.53, 0.53] so its factors are 1.0 BY CONSTRUCTION
(values are already in canonical units; the note says so), plus the
timing tag so bench_ratio can flag estimator mismatches.

Reads the full-precision `steady_full` aux line (execution-ordered) and
`host_cal_full` from each log — the headline's 2-decimal values would
add up to 17% rounding error to sub-0.3s rows.
"""
import json, re, sys

CANARY = 0.53


def parse_log(path):
    steady, cal = None, None
    for line in open(path):
        line = line.strip()
        if line.startswith('{"steady_full"'):
            d = json.loads(line)
            steady = d["steady_full"]          # insertion order = execution order
            cal = d.get("host_cal_full")
    if not steady or not cal or len(cal) < 2:
        raise SystemExit(f"{path}: no steady_full/host_cal_full aux line")
    return steady, cal


def normalize(steady, cal):
    fs, fe = cal[0] / CANARY, cal[1] / CANARY
    total = sum(steady.values()) or 1.0
    out, cum = {}, 0.0
    for q, t in steady.items():
        pos = (cum + t / 2.0) / total
        cum += t
        out[q] = t / (fs + pos * (fe - fs))
    return out


def short_keys(steady):
    """Same scheme as Bench's headline: unique qNN/pNN prefix."""
    pref = {n: n.split("_")[0] for n in steady}
    counts = {}
    for p in pref.values():
        counts[p] = counts.get(p, 0) + 1
    return {n: (p if counts[p] == 1 else n) for n, p in pref.items()}


def main():
    argv = sys.argv[1:]
    out_path, note = "tools/bench_ref.json", None
    logs = []
    i = 0
    while i < len(argv):
        if argv[i] == "--out":
            out_path = argv[i + 1]; i += 2
        elif argv[i] == "--note":
            note = argv[i + 1]; i += 2
        else:
            logs.append(argv[i]); i += 1
    if len(logs) < 2:
        raise SystemExit("need >= 2 run logs")
    runs = [parse_log(p) for p in logs]
    normed = [normalize(s, c) for s, c in runs]
    keys = list(runs[0][0].keys())
    for s, _ in runs[1:]:
        if set(s) != set(keys):
            raise SystemExit("runs disagree on the query set: "
                             f"{set(keys) ^ set(s)}")
    sk = short_keys(runs[0][0])
    ref_q = {sk[q]: round(min(n[q] for n in normed), 3) for q in keys}
    spread = {sk[q]: max(n[q] for n in normed) / max(min(n[q] for n in normed), 1e-9)
              for q in keys}
    worst = sorted(spread.items(), key=lambda kv: -kv[1])[:8]
    total = round(sum(ref_q.values()), 1)
    cals = [c for _, c in runs]
    auto = (f"round-17 reference re-record: {len(logs)} same-tree runs, "
            f"per-query min in canonical canary units (values already "
            f"leg-normalized; host_cal is [0.53,0.53,0.53] so factors are "
            f"1.0 by construction). Methodology min_warm2_floor2.0 with "
            f"in-run recheck disabled. Run host legs: "
            + "; ".join(f"[{c[0]:.2f},{c[1]:.2f}]" for c in cals)
            + ". Worst cross-run per-query spreads: "
            + ", ".join(f"{q} {s:.2f}x" for q, s in worst) + ".")
    doc = {
        "host_cal": [CANARY, CANARY, CANARY],
        "timing": "min_warm2_floor2.0",
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
