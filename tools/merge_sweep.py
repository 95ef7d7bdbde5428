#!/usr/bin/env python
"""Merge alt_layout_sweep shard artifacts into one SWEEP_rN.json.

r07 verdict #6: the 499-entry cross-layout parity sweep was the
builder's strongest claim a judge could not diff. Each shard run of
``tools/alt_layout_sweep.py`` writes its per-name verdicts when
``SWEEP_SHARD_OUT`` is set; this merges them:

    SWEEP_SHARD_OUT=/tmp/sweep_a.json python tools/alt_layout_sweep.py 0 250
    SWEEP_SHARD_OUT=/tmp/sweep_b.json python tools/alt_layout_sweep.py 250 500
    python tools/merge_sweep.py SWEEP_r08.json /tmp/sweep_a.json /tmp/sweep_b.json

Output: {"layout": ..., "sf_dir": ..., "n_green": G, "n_red": R,
"red": {...}, "entries": {name: "green"|"red"}} — diffable against the
driver's CORRECTNESS windows.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out_path, shards = sys.argv[1], sys.argv[2:]
    entries: dict[str, str] = {}
    bad: dict[str, str] = {}
    layout = sf_dir = None
    for p in shards:
        d = json.load(open(p))
        layout, sf_dir = d["layout"], d["sf_dir"]
        entries.update(d["entries"])
        bad.update({n: msg for n, msg in d["bad"]})
    result = {
        "layout": layout,
        "sf_dir": sf_dir,
        "n_green": sum(1 for v in entries.values() if v == "green"),
        "n_red": sum(1 for v in entries.values() if v == "red"),
        "red": bad,
        "entries": dict(sorted(entries.items())),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=0, separators=(",", ":"))
        f.write("\n")
    print(f"{out_path}: {result['n_green']} green / {result['n_red']} red "
          f"over {len(entries)} entries")
    return 1 if result["n_red"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
