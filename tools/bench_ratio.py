#!/usr/bin/env python3
"""Cross-record bench adjudication: uniform-ratio analysis.

Usage: python3 tools/bench_ratio.py OLD.json NEW.json [floor_sec] [--raw]

Compares two BENCH records' per-query values over their shared
queries (values >= floor, default 0.3 s). A CODE regression shows up
as a ratio outlier on the touched queries; a BUSY/THROTTLED BOX shows
up as a near-uniform ratio across queries whose code did not change —
the median ratio IS the environmental factor, and per-query values
stay comparable after dividing it out. Round-15 learning: two
same-code sf0.1 runs measured 1.38x apart with median ratios uniform
across 155 untouched queries — without this analysis that reads as a
global regression.

Per-query values are ADJUDICATED by default (round-16; round-15
verdict "What's wrong" #2): a flagged query with a successful
fresh-JVM re-measure contributes min(median, remeasured) — the same
rule Bench.scala's value_adjudicated headline applies — so the ratio
analysis never feeds on a contaminated median the record itself
already adjudicated away. Pass --raw to read the raw medians instead.
"""
import json
import statistics
import sys


def load(path: str, raw: bool) -> dict:
    rec = json.load(open(path))
    if "queries" not in rec and rec.get("parsed"):
        rec = rec["parsed"]  # driver BENCH_r{N}.json wraps the record
        # the wrapped stdout line is BUDGET-TRUNCATED: its queries map
        # holds only the slowest headline entries and its remeasured
        # map at most 12 — a comparison fed from it silently covers a
        # subset (round-16 ADVICE). Say so loudly.
        n_declared = rec.get("n_queries")
        if n_declared is not None and n_declared != len(rec.get("queries", {})):
            print(f"NOTE: {path} is a driver tail-capture wrapper — its "
                  f"queries map holds {len(rec.get('queries', {}))} headline "
                  f"entries of {n_declared} measured; this comparison "
                  "covers only that subset (use the full BENCH.json "
                  "snapshot for complete coverage)")
    if "queries" not in rec:
        print(f"{path}: no queries map (driver tail-capture failed?)")
        sys.exit(1)
    qs = dict(rec["queries"])
    if not raw:
        for name, val in rec.get("remeasured", {}).items():
            if name in qs and isinstance(val, (int, float)) and val > 0:
                qs[name] = min(qs[name], val)
    return qs


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--raw"]
    raw = "--raw" in sys.argv[1:]
    qo, qn = load(args[0], raw), load(args[1], raw)
    floor = float(args[2]) if len(args) > 2 else 0.3
    shared = sorted(k for k in qo.keys() & qn.keys() if qo[k] >= floor)
    if not shared:
        print(f"no shared queries >= {floor}s between the two records — "
              "different suites, or lower the floor argument")
        sys.exit(1)
    ratios = sorted((qn[k] / qo[k], k) for k in shared)
    med = statistics.median(r for r, _ in ratios)
    spread = statistics.quantiles(
        [r for r, _ in ratios], n=4) if len(ratios) >= 4 else []
    print(f"per-query values: {'raw medians' if raw else 'adjudicated'}")
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
