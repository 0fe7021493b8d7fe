"""Host-normalized bench comparison: one command instead of a judge re-run.

    python3 tools/bench_ratio.py BENCH_r09.json [ref.json]

Reads a driver bench artifact (the `parsed` object, or the last headline
JSON line found in `tail`), computes each run's host factor from its
embedded canary (`host_cal = [start, end, recorded_constant]`, factor =
mean(start, end) / constant), and prints per-query ratios vs the
reference record (default tools/bench_ref.json) after dividing each
side's times by its own host factor. Queries missing on either side are
listed, not silently dropped.
"""
import json, statistics, sys


def load_headline(path):
    with open(path) as f:
        d = json.load(f)
    if isinstance(d, dict) and d.get("parsed"):
        return d["parsed"]
    if isinstance(d, dict) and "queries" in d:
        return d
    for line in reversed(d.get("tail", "").splitlines()):
        if line.strip().startswith('{"metric"'):
            return json.loads(line)
    raise SystemExit(f"{path}: no parseable headline")


def host_factor(h):
    cal = h.get("host_cal")
    if not cal or len(cal) < 3 or not cal[2]:
        return 1.0, False
    return statistics.mean(cal[:2]) / cal[2], True


def main():
    art = load_headline(sys.argv[1])
    ref = load_headline(sys.argv[2] if len(sys.argv) > 2 else "tools/bench_ref.json")
    hf_a, cal_a = host_factor(art)
    hf_r, cal_r = host_factor(ref)
    print(f"artifact host factor {hf_a:.2f} (cal={cal_a}), "
          f"reference host factor {hf_r:.2f} (cal={cal_r})")
    qa, qr = art["queries"], ref["queries"]
    shared = sorted(set(qa) & set(qr))
    rows = []
    for q in shared:
        na, nr = qa[q] / hf_a, qr[q] / hf_r
        rows.append((q, qa[q], na, nr, na / nr if nr else float("inf")))
    rows.sort(key=lambda r: -r[4])
    print(f"{'query':<8} {'raw':>6} {'norm':>7} {'ref':>7} {'ratio':>6}")
    for q, raw, na, nr, ratio in rows:
        flag = "  <-- >2x" if ratio > 2 else ""
        print(f"{q:<8} {raw:>6.2f} {na:>7.2f} {nr:>7.2f} {ratio:>6.2f}{flag}")
    tot_a = sum(qa[q] for q in shared) / hf_a
    tot_r = sum(qr[q] for q in shared) / hf_r
    print(f"\nnormalized totals over {len(shared)} shared queries: "
          f"{tot_a:.1f}s vs ref {tot_r:.1f}s = {tot_a / tot_r:.2f}x; "
          f"{sum(1 for r in rows if r[4] > 2)} queries >2x")
    only_a = sorted(set(qa) - set(qr))
    only_r = sorted(set(qr) - set(qa))
    if only_a:
        print("new (no reference):", ", ".join(only_a))
    if only_r:
        print("MISSING from artifact:", ", ".join(only_r))
    if art.get("errors"):
        print("artifact errors:", json.dumps(art["errors"])[:400])


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piped into head
        pass
