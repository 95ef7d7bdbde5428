#!/usr/bin/env python
"""Emit the coverage.py ledger update for a driver CORRECTNESS file.

    python tools/update_coverage.py CORRECTNESS_r02.json

Prints a ``GREEN_R{N}`` frozenset block of every hash-green entry plus
the union line to paste into ``bigdataamazon_spark/coverage.py``
(DRIVER_VERIFIED = GREEN_R01 | GREEN_R02 | ...). Rows-only entries
(err == "no_oracle" with rows > 0) are listed separately — they keep
their window slot until a hash-checkable oracle exists or are accepted
as rows-only by contract.
"""

from __future__ import annotations

import json
import re
import sys


def main() -> int:
    path = sys.argv[1]
    m = re.search(r"r(\d+)", path)
    tag = f"R{int(m.group(1)):02d}" if m else "RXX"
    data = json.load(open(path))
    green = sorted(n for n, r in data.items() if r.get("hash_match"))
    rows_only = sorted(
        n
        for n, r in data.items()
        if not r.get("hash_match") and (r.get("spark_rows") or 0) > 0
    )
    print(f"GREEN_{tag} = frozenset(")
    print("    {")
    for n in green:
        print(f'        "{n}",')
    print("    }")
    print(")")
    print()
    print(f"# rows-only this round (no hash): {rows_only}")
    print(f"# update: DRIVER_VERIFIED = GREEN_R01 | GREEN_{tag}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
