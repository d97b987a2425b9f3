#!/usr/bin/env python3
"""Cross-record bench adjudication: uniform-ratio analysis.

Usage: python3 tools/bench_ratio.py OLD.json NEW.json [floor_sec]

Compares two BENCH records' per-query medians over their shared
queries (medians >= floor, default 0.3 s). A CODE regression shows up
as a ratio outlier on the touched queries; a BUSY/THROTTLED BOX shows
up as a near-uniform ratio across queries whose code did not change —
the median ratio IS the environmental factor, and per-query medians
stay comparable after dividing it out. Round-15 learning: two
same-code sf0.1 runs measured 1.38x apart with median ratios uniform
across 155 untouched queries — without this analysis that reads as a
global regression.
"""
import json
import statistics
import sys


def main() -> None:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    qo, qn = old["queries"], new["queries"]
    shared = sorted(k for k in qo.keys() & qn.keys() if qo[k] >= floor)
    ratios = sorted((qn[k] / qo[k], k) for k in shared)
    med = statistics.median(r for r, _ in ratios)
    spread = statistics.quantiles(
        [r for r, _ in ratios], n=4) if len(ratios) >= 4 else []
    print(f"shared queries >= {floor}s: {len(shared)}")
    print(f"median ratio new/old: {med:.3f}"
          + (f"  IQR [{spread[0]:.3f}, {spread[2]:.3f}]" if spread else ""))
    print(f"shared totals: old {sum(qo[k] for k in shared):.1f}s"
          f"  new {sum(qn[k] for k in shared):.1f}s")
    print("normalized outliers (ratio / median, > 1.5x):")
    for r, k in ratios[::-1]:
        if r / med > 1.5:
            print(f"  {k}: {qo[k]:.2f} -> {qn[k]:.2f}  ({r / med:.2f}x"
                  " above the environmental factor)")
    print("only-in-new:", sorted(qn.keys() - qo.keys()))
    print("only-in-old:", sorted(qo.keys() - qn.keys()))


if __name__ == "__main__":
    main()
