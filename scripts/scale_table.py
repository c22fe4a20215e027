#!/usr/bin/env python3
"""Fold tmp_scale/probe_results.jsonl (tagged graft.ScaleProbe lines) into
the per-size min-of-3 table BASELINE.md quotes: one row per daily path,
one column per standing-corpus size, ratios vs x1."""
import json
import sys
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else "tmp_scale/probe_results.jsonl"
mins = defaultdict(dict)  # path -> size -> min sec
meta = {}
for line in open(path):
    r = json.loads(line)
    sz = r["size"]
    meta[sz] = (r["corpus_docs"], r["corpus_embeddings"], r["increment_docs"])
    for k, v in r["sec"].items():
        cur = mins[k].get(sz)
        mins[k][sz] = v if cur is None else min(cur, v)

sizes = sorted(meta, key=lambda s: meta[s][0])
print("sizes:", {s: meta[s] for s in sizes})
hdr = ["daily path"] + [f"{s} min" for s in sizes] + [
    f"{s}/x1" for s in sizes if s != "x1"]
print("| " + " | ".join(hdr) + " |")
print("|" + "---|" * len(hdr))
for k, by in mins.items():
    row = [k] + [f"{by.get(s, float('nan')):.2f} s" for s in sizes]
    base = by.get("x1")
    for s in sizes:
        if s != "x1":
            row.append(f"{by[s] / base:.2f}×" if base and s in by else "—")
    print("| " + " | ".join(row) + " |")
