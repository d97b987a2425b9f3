#!/usr/bin/env python3
"""Extract per-query plan sections from PLANS.md into plans/<round>/ files.

Usage: python3 tools/extract_plans.py <round-dir> <suffix> [query ...]

For each named query (default: every query that already has a
`<q>_before.txt` in the round dir), writes plans/<round>/<q>_<suffix>.txt
containing that query's `## q_name` section from PLANS.md — the same
formatted AQE-final plan text the judge checks plan claims against.
"""
import re
import sys
import pathlib

repo = pathlib.Path(__file__).resolve().parent.parent
plans_md = (repo / "PLANS.md").read_text()

round_dir = repo / "plans" / sys.argv[1]
suffix = sys.argv[2]
queries = sys.argv[3:]
if not queries:
    queries = sorted({p.name.rsplit("_before.txt", 1)[0]
                      for p in round_dir.glob("*_before.txt")})

# Split PLANS.md on "## <name>" headings.
sections = {}
cur = None
buf = []
for line in plans_md.splitlines(keepends=True):
    m = re.match(r"^## (\S+)", line)
    if m:
        if cur:
            sections[cur] = "".join(buf)
        cur = m.group(1)
        buf = [line]
    elif cur:
        buf.append(line)
if cur:
    sections[cur] = "".join(buf)

missing = [q for q in queries if q not in sections]
if missing:
    sys.exit(f"not in PLANS.md: {missing}")
for q in queries:
    (round_dir / f"{q}_{suffix}.txt").write_text(sections[q])
    print(f"wrote {q}_{suffix}.txt ({len(sections[q])} bytes)")
