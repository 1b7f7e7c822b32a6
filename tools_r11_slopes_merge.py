#!/usr/bin/env python
"""Cell-wise min-merge of two SCALE_SLOPES.json runs (the repo's standing
slope methodology, commit 1481963: a host-load spike in a single 1x or
10x cell corrupts a log-log slope far more than it shifts a mean).

Usage: python tools_r11_slopes_merge.py RUN1.json RUN2.json OUT.json
Recomputes slopes_1_to_max from the merged cells."""

import json
import math
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    out = dict(a)
    times = {}
    for fam in set(a["times"]) | set(b["times"]):
        ta, tb = a["times"].get(fam, {}), b["times"].get(fam, {})
        times[fam] = {
            m: min(v for v in (ta.get(m), tb.get(m)) if v is not None)
            for m in set(ta) | set(tb)
        }
    out["times"] = times
    out["merged_from_runs"] = 2
    slopes = {}
    for fam, ts in times.items():
        ms = sorted(int(m) for m in ts)
        hi = ms[-1]
        if hi == ms[0]:
            continue
        slopes[fam] = round(
            math.log(ts[str(hi)] / ts[str(ms[0])]) / math.log(hi), 2
        )
    out["slopes_1_to_max"] = slopes
    with open(sys.argv[3], "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", sys.argv[3])


if __name__ == "__main__":
    main()
