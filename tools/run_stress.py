#!/usr/bin/env python
"""Time registry queries at an arbitrary sf_dir (stress studies).

Same min-of-2-warm methodology as bench.py, but query set and data dir
come from the command line:

    python tools/run_stress.py /tmp/sfx minhash_lsh_pairs neardup_clusters
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from bigdataamazon_spark import queries as registry  # noqa: E402
from bigdataamazon_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    spark = get_spark("bigdataamazon-stress")
    qs = registry.queries()
    timings: dict[str, float | str] = {}
    for name in names:
        try:
            qs[name](spark, sf_dir).count()  # warm
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                qs[name](spark, sf_dir).count()
                best = min(best, time.perf_counter() - start)
            timings[name] = round(best, 4)
        except Exception as e:  # a tripped scale guard is a RESULT here
            timings[name] = f"error: {type(e).__name__}: {e}"[:200]
        spark.catalog.clearCache()
    print(json.dumps({"sf_dir": sf_dir, "queries": timings}))


if __name__ == "__main__":
    main()
