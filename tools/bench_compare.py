#!/usr/bin/env python3
"""Compare two Bench JSON outputs per query, repeat-protocol aware.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [ratio_threshold]

Prints queries whose new/old time ratio exceeds the threshold (default
2.0), plus catalog-shape context (added/removed queries, totals over the
SHARED set only — a bigger catalog is not a slower engine). Streaming
(st*) rows are flagged when either side measured them single-pass
(stream_repeats=1): a one-pass number is scheduler-noisy and a large
ratio there is weak evidence on its own (re-run with
SPARK_GRAFT_ONLY=<name> SPARK_GRAFT_REPEATS=3 before believing it).
"""
import json
import re
import sys


def load(path):
    """Accept either a raw Bench stdout line or the driver's BENCH_r
    wrapper ({"tail": "<possibly truncated stdout fragment>"...}); in
    the wrapper case the per-query map is recovered by regex, so a
    truncated tail still yields every complete "name":seconds pair.
    """
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    if d is not None and "queries" in d:
        return d
    blob = d.get("tail", "") if isinstance(d, dict) else text
    # recover pairs ONLY from inside the "queries":{...} object when its
    # opening brace survived the truncation — scanning the whole blob
    # would also capture metadata fields ("value", "avg_per_query") as
    # phantom query timings. If the opener itself was truncated away,
    # fall back to the whole blob minus the known metadata keys.
    m = re.search(r'"queries"\s*:\s*\{', blob)
    scan = blob[m.end():] if m else blob
    if m and (close := scan.find("}")) != -1:
        scan = scan[:close]
    qs = {m.group(1): float(m.group(2)) for m in
          re.finditer(r'"([a-z0-9_]+)":(-?\d+\.\d+)', scan)
          if m.group(1) not in ("value", "avg_per_query")}
    meta = {k: int(m.group(1)) for k in ("repeats", "stream_repeats")
            if (m := re.search(rf'"{k}":(\d+)', blob))}
    if not qs:
        raise SystemExit(f"no per-query timings recoverable from {path}")
    return {"queries": qs, **meta}


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    oq = {k: v for k, v in old["queries"].items() if v >= 0}
    nq = {k: v for k, v in new["queries"].items() if v >= 0}
    shared = sorted(set(oq) & set(nq))
    added, removed = sorted(set(nq) - set(oq)), sorted(set(oq) - set(nq))
    osum, nsum = sum(oq[k] for k in shared), sum(nq[k] for k in shared)
    print(f"shared {len(shared)} queries: {osum:.1f}s -> {nsum:.1f}s "
          f"({nsum / osum:.2f}x)" if osum else "no shared queries")
    print(f"old repeats={old.get('repeats', '?')}/"
          f"stream={old.get('stream_repeats', '?')}  "
          f"new repeats={new.get('repeats', '?')}/"
          f"stream={new.get('stream_repeats', '?')}")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    flagged = [(nq[k] / oq[k], k) for k in shared
               if oq[k] > 0 and nq[k] / oq[k] > thresh]
    for ratio, k in sorted(flagged, reverse=True):
        weak = ""
        if k.startswith("st") and (old.get("stream_repeats", 1) == 1
                                   or new.get("stream_repeats", 1) == 1):
            weak = "  [single-pass streaming: weak evidence, re-run]"
        print(f"  {ratio:5.1f}x  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s{weak}")
    if not flagged:
        print(f"no shared query regressed past {thresh}x")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
