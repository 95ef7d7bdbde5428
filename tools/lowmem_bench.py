#!/usr/bin/env python
"""Constrained-memory receipts: the 60M-row workload at a 4 GiB heap.

Sizing guidance says partitions must fit executor memory — this tool
measures what happens when they DON'T fit comfortably: the same
100×-scale queries run twice in separate JVMs, once at the session
default heap (16g) and once at --mem (default 4g ≈ 125 MB/task-thread
at local[32]), and the receipt asserts the constrained run produces
BYTE-EQUAL results (row count + order-independent xxhash64 checksum)
while recording wall time and the shuffle-spill bytes the Spark REST
API reports. Completion-by-spilling, not OOM, is the designed behavior
of sort/agg/join under memory pressure — exactly what a 100 TB run
leans on when a skewed partition lands on a busy executor.

    python tools/lowmem_bench.py [--mem 4g] [--sf-dir /tmp/sfy100]
                                 [--out JSON]

Queries: the spill-prone shapes from the 100× receipt (BASELINE.md) —
data-sized sorts (order_value_deciles: 3M-row per-priority rank
windows; purchase_before_click_asof: user-keyed as-of sort join),
join-output-bound full diff (orders_snapshot_diff), the wide fact
shuffle (revenue_rollup), and the broadcast star (star_join_revenue,
which should NOT spill — its inclusion pins that broadcasts hold at
4g too).

Emits one JSON line ({"checks": {...}, "n_fail": N}; --out file), exit
1 on any failure — same contract as tools/run_stress.py --gate.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

QUERIES = [
    "order_value_deciles",
    "purchase_before_click_asof",
    "orders_snapshot_diff",
    "revenue_rollup",
    "star_join_revenue",
    "q1_pricing_summary",
]


def _worker(sf_dir: str) -> None:
    """Run QUERIES in THIS process's JVM; print one JSON line with
    per-query (count, checksum, wall) + total spill bytes from the
    REST API. Heap comes from SPARK_GRAFT_DRIVER_MEM set by the
    parent."""
    from pyspark.sql import functions as F

    from bigdataamazon_spark import queries as registry
    from bigdataamazon_spark.session import get_spark

    spark = get_spark("lowmem-bench", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    out: dict[str, dict] = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        # order-independent value fingerprint: xxhash64 over every
        # column (null-tagged), summed — stable across partitioning,
        # task order, and heap size
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) sum: exact (no ANSI long overflow at 60M
            # rows × 2^63-scale hashes) and order-independent
            F.sum(
                F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                             for c in df.columns]).cast("decimal(38,0)")
            ).alias("chk"),
        ).first()
        out[name] = {
            "n": int(row["n"]),
            "chk": str(row["chk"]) if row["chk"] is not None else "0",
            "wall": round(time.perf_counter() - t0, 2),
        }
        spark.catalog.clearCache()
    ui = spark.sparkContext.uiWebUrl
    spilled = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0}
    try:
        apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
        )
        for st in stages:
            for k in spilled:
                spilled[k] += int(st.get(k, 0))
    except Exception as e:  # metrics are evidence, not a gate
        spilled["error"] = f"{type(e).__name__}: {e}"[:120]
    print("WORKER_JSON:" + json.dumps({"queries": out, "spill": spilled}))


def _run(mem: str, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", "--sf-dir", sf_dir],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("WORKER_JSON:"):
            return json.loads(line[len("WORKER_JSON:"):])
    raise RuntimeError(
        f"worker at {mem} produced no result "
        f"(rc={p.returncode}, stderr tail: {p.stderr[-400:]})"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mem", default="4g")
    ap.add_argument("--ref-mem", default="16g")
    ap.add_argument("--sf-dir", default="/tmp/sfy100")
    ap.add_argument("--out", default=None)
    ap.add_argument("--worker", action="store_true")
    args = ap.parse_args()

    if args.worker:
        _worker(args.sf_dir)
        return 0

    if not os.path.isdir(args.sf_dir):
        from tools.make_stress import make_sfy

        print(f"regenerating {args.sf_dir} (lineitem ×100) ...", file=sys.stderr)
        make_sfy("/root/testdata/sf0.1", args.sf_dir, reps=100)

    t0 = time.perf_counter()
    ref = _run(args.ref_mem, args.sf_dir)
    low = _run(args.mem, args.sf_dir)
    wall = time.perf_counter() - t0

    checks: dict[str, dict] = {}
    for name in QUERIES:
        r, l = ref["queries"][name], low["queries"][name]
        ok = r["n"] == l["n"] and r["chk"] == l["chk"]
        checks[name] = {
            "pass": ok,
            "rows": l["n"],
            "wall_ref": r["wall"],
            "wall_low": l["wall"],
            "note": "count+checksum equal across heaps" if ok
            else f"MISMATCH ref={r} low={l}",
        }
    n_fail = sum(1 for c in checks.values() if not c["pass"])
    result = {
        "bench": "constrained-memory",
        "mem": {"ref": args.ref_mem, "low": args.mem},
        "sf_dir": args.sf_dir,
        "spill": {"ref": ref["spill"], "low": low["spill"]},
        "checks": checks,
        "wall_sec": round(wall, 1),
        "n_fail": n_fail,
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
