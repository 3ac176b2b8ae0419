#!/usr/bin/env python3
"""Build the canonical elementwise-min composite from N full bench
passes, RETAINING the per-query pass-to-pass spread.

The composite's `queries` block is the elementwise min over the passes
(each pass is itself Bench's min-of-2 / min-of-3-for-st*), which is the
round protocol's noise floor. What the min alone throws away is how
noisy each query IS across passes — exactly what a reader needs to
tell a real regression from scheduler jitter at the ~0.3 s floor. So
the composite now carries, per query:

  spread: {min, max, n, band}   band = max/min across the passes

`bench_compare.py` reads the band and classifies a ratio that exceeds
the regression threshold but sits inside the band as noise(spread=..)
instead of REGRESSED — a claim like "no query regressed above 1.2x"
then cites a measured band instead of asserting an absolute.

host_probe: elementwise min over passes (fastest clean observation of
the host). value: sum of the composed per-query walls.

CANONICAL PASS COUNT: 4. The elementwise min deepens with every extra
pass, so composites built from different pass counts are not
comparable (r13's 8-pass min vs r14's 4-pass min read as a phantom
1.04x median drift on untouched code). The canonical round composite
is built from exactly 4 passes; the output records `n_passes` and
bench_compare.py warns on a mismatch. Other counts still build (for
ad-hoc use) but print a loud warning.

Usage: bench_composite.py OUT.json PASS1.json PASS2.json [...]
"""
import json
import sys

CANONICAL_PASSES = 4


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    out, passes = sys.argv[1], sys.argv[2:]
    if len(passes) != CANONICAL_PASSES:
        sys.stderr.write(
            f"WARNING: {len(passes)} passes; the canonical composite is "
            f"{CANONICAL_PASSES} (min-depth affects cross-round medians — "
            "do not compare this artifact against a canonical one)\n")
    ds = [json.load(open(p)) for p in passes]
    names = set()
    for d in ds:
        names |= set(d.get("queries", {}))
    queries, spread = {}, {}
    for q in sorted(names):
        ts = [d["queries"][q] for d in ds
              if d.get("queries", {}).get(q, -1) > 0]
        if not ts:
            queries[q] = -1
            continue
        queries[q] = min(ts)
        spread[q] = {
            "min": round(min(ts), 4),
            "max": round(max(ts), 4),
            "n": len(ts),
            "band": round(max(ts) / min(ts), 3),
        }
    probes = [d.get("host_probe", {}) for d in ds]
    host = {}
    for k in ("cpu_s", "scan_s"):
        vals = [p[k] for p in probes if p.get(k, -1) > 0]
        host[k] = round(min(vals), 4) if vals else -1
    total = sum(v for v in queries.values() if v > 0)
    base = dict(ds[-1])  # protocol fields (repeats, sf, unit) from a pass
    base.update({
        "metric": "total",
        "value": round(total, 4),
        "n_queries": len([v for v in queries.values() if v > 0]),
        "avg_per_query": round(total / max(1, len(queries)), 4),
        "composite": (f"elementwise min over {len(passes)} full passes "
                      "(each min-of-2, st* min-of-3); per-query pass "
                      "spread retained in `spread`"),
        "n_passes": len(passes),
        "canonical_passes": CANONICAL_PASSES,
        "host_probe": host,
        "queries": queries,
        "spread": spread,
        "n_failed": len([v for v in queries.values() if v <= 0]),
        "errors": {},
    })
    with open(out, "w") as f:
        json.dump(base, f, indent=1)
    bands = sorted(spread.values(), key=lambda s: -s["band"])
    print(f"wrote {out}: {len(queries)} queries, total {total:.1f}s, "
          f"median band "
          f"{sorted(s['band'] for s in spread.values())[len(spread)//2]:.3f}, "
          f"noisiest: "
          + ", ".join(f"{q}={s['band']:.2f}" for q, s in
                      sorted(spread.items(), key=lambda kv: -kv[1]['band'])[:5]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
