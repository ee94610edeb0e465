"""Benchmark judgement — compare two ``suite.py --json`` outputs.

The PR-time regression gate, mirroring the reference's
``BenchmarkCI.judge(baseline="origin/main")`` (.github/workflows/Benchmark.yml:
22-31): run the suite on the baseline ref and on the candidate, then

    python benchmarks/judge.py baseline.json candidate.json [--threshold 1.25]

prints a per-benchmark ratio table and exits nonzero if any benchmark
regressed by more than the threshold (default: 25% slower — CI machines are
noisy; tune down on dedicated hardware).
"""

import argparse
import json
import sys


def load(path: str) -> dict:
    """suite.py --json rows → {"<solver>/<mode>/<metric>": ms}."""
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            stem = f"{r['solver']}/{r['mode']}"
            rows[f"{stem}/loss_fwd"] = float(r["loss_fwd_ms"])
            rows[f"{stem}/loss_grad"] = float(r["loss_grad_ms"])
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("candidate")
    ap.add_argument("--threshold", type=float, default=1.25)
    args = ap.parse_args()

    base = load(args.baseline)
    cand = load(args.candidate)

    worst = 0.0
    failed = []
    print(f"{'benchmark':<40} {'base ms':>10} {'cand ms':>10} {'ratio':>7}")
    for name in sorted(base):
        if name not in cand:
            print(f"{name:<40} {'(missing in candidate)':>29}")
            failed.append(name)
            continue
        ratio = cand[name] / base[name]
        worst = max(worst, ratio)
        flag = "  << REGRESSION" if ratio > args.threshold else ""
        print(f"{name:<40} {base[name]:>10.3f} {cand[name]:>10.3f} {ratio:>7.2f}{flag}")
        if ratio > args.threshold:
            failed.append(name)

    if failed:
        print(f"\nFAIL: {len(failed)} benchmark(s) regressed beyond "
              f"{args.threshold:.2f}x: {', '.join(failed)}")
        return 1
    print(f"\nOK: worst ratio {worst:.2f}x (threshold {args.threshold:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
