#!/usr/bin/env python
"""Round-10 oracle-parity receipts (VERDICT r09 action #9).

Runs tests/parity.compare (the driver-comparator mirror: row count +
sorted schema + order-insensitive value multiset) at sf0.1 for the 13
entries rewritten in the r09 optimization round plus every entry
touched in r10, and writes the receipt map to
plans/r10/parity_receipts_r10.json with the git HEAD it was produced
at. "ok" means compare() returned zero problems.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from bigdataamazon_spark.session import get_spark  # noqa: E402
from tests.parity import compare  # noqa: E402

R09_REWRITES = [
    "frequent_part_itemsets_rel",
    "copurchase_part_lift_rel",
    "copurchase_part_lift",
    "bm25_search",
    "mmr_diversified_search",
    "frequent_event_sequences",
    "supplier_cosupply_triangles",
    "part_cf_recommendations",
    "revenue_window_motifs",
    "colbert_maxsim_topk",
    "als_factorization_audit",
    "bow_cosine_topk",
    "nation_trade_communities",
]

R10_TOUCHED = [
    "cosine_topk_ivf",
    "ann_recall_audit",
    "ivf_nprobe_sweep",
    "part_name_fuzzy_pairs",
    "part_golden_records",
    "customer_part_butterflies",
    "cosupply_clustering_coefficient",
    "brand_bradley_terry",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bigdataamazon-parity-receipts-r10")
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True, cwd=_REPO_ROOT
    ).stdout.strip()
    out: dict[str, object] = {"head": head, "sf_dir": sf_dir, "receipts": {}}
    for name in R09_REWRITES + R10_TOUCHED:
        try:
            problems = compare(spark, name, sf_dir)
            out["receipts"][name] = {"ok": not problems, "problems": problems}
        except Exception as e:  # noqa: BLE001
            out["receipts"][name] = {
                "ok": False,
                "problems": [f"{type(e).__name__}: {e}"[:300]],
            }
        print(name, "OK" if out["receipts"][name]["ok"] else "FAIL", flush=True)
    path = os.path.join(_REPO_ROOT, "plans", "r10", "parity_receipts_r10.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
