#!/usr/bin/env python3
"""Family-total variance between two Bench JSON outputs.

Usage: python3 tools/bench_family_diff.py A.json B.json [band]

Prints a markdown table of per-family totals (family = leading letters
of the query name) over the SHARED query set and flags families whose
B/A ratio falls outside the band (default 0.10 = ±10%). This is the
round-10 "variance band" check: two consecutive full passes should
agree within the band, so a noisy rerun can't read as a regression.
"""
import collections
import json
import re
import sys

a = json.load(open(sys.argv[1]))["queries"]
b = json.load(open(sys.argv[2]))["queries"]
band = float(sys.argv[3]) if len(sys.argv) > 3 else 0.10

fam = collections.defaultdict(lambda: [0.0, 0.0])
for k in set(a) & set(b):
    f = re.match(r"([a-z]+)", k).group(1)
    fam[f][0] += a[k]
    fam[f][1] += b[k]

print("| family | A (s) | B (s) | B/A |")
print("|---|---|---|---|")
n_out = 0
for f, (x, y) in sorted(fam.items()):
    r = y / x if x else float("nan")
    flag = "" if abs(r - 1) <= band else " **outside band**"
    n_out += 0 if abs(r - 1) <= band else 1
    print(f"| {f} | {x:.1f} | {y:.1f} | {r:.2f}{flag} |")
ta = sum(v[0] for v in fam.values())
tb = sum(v[1] for v in fam.values())
print(f"\nshared totals: A={ta:.1f}s B={tb:.1f}s ratio={tb/ta:.3f}; "
      f"{n_out} families outside ±{band:.0%}")
sys.exit(0 if n_out == 0 else 1)
