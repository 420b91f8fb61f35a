#!/usr/bin/env python3
"""Merge two same-session quiet boards into the canonical min-of-two
committed board (BENCH_QUIET format): per-query min, total = sum of
mins, calibration = min of the two probes, and the n-over-2x-reference
self-audit recomputed on the merged rows."""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
ref = json.load(open(sys.argv[3]))["queries"] if len(sys.argv) > 3 else {}
# refuse asymmetric boards: iterating only a's keys would silently drop
# queries present in b alone and KeyError on ones missing from b
diff = set(a["queries"]) ^ set(b["queries"])
assert not diff, f"boards disagree on query sets: {sorted(diff)}"
qs = {k: min(a["queries"][k], b["queries"][k]) for k in a["queries"]}
over = sorted((round(qs[k] / ref[k], 2), k) for k in qs
              if k in ref and qs[k] > 2 * ref[k])
out = {
    "metric": "total", "value": sum(qs.values()), "unit": "sec",
    "queries": qs, "sf": a["sf"],
    "calibration_sec": min(a["calibration_sec"], b["calibration_sec"]),
    "cpus": a["cpus"],
    "protocol": "min over two same-session quiet local[4] builder boards"
                " (canonical protocol)",
    "n_over_2x_reference": len(over),
}
json.dump(out, open(sys.argv[4] if len(sys.argv) > 4 else "/dev/stdout", "w"),
          indent=1)
print(f"\ntotal {out['value']:.1f} cal {out['calibration_sec']:.3f} "
      f"over2x {over}", file=sys.stderr)
