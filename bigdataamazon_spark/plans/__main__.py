"""Plan-audit CLI: print the scale-relevant physical-plan census for any
registry query — the same checks the plan-regression tests pin, exposed
so a user porting their own queries can audit them identically.

Usage::

    python -m bigdataamazon_spark.plans <query_name> [sf_dir]
    python -m bigdataamazon_spark.plans --list
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    from .. import queries as registry

    names = sorted(registry.queries())
    if not argv or argv[0] in ("--help", "-h"):
        print(__doc__)
        return 0
    if argv[0] == "--list":
        print("\n".join(names))
        return 0
    name = argv[0]
    if name not in names:
        print(f"unknown query {name!r}; try --list", file=sys.stderr)
        return 2
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"

    from ..session import get_spark
    from . import executed_plan, plan_summary, scan_schemas

    spark = get_spark("plan-audit")
    plan = executed_plan(registry.queries()[name](spark, sf_dir))
    print(f"# {name} @ {sf_dir}")
    for key, val in plan_summary(plan).items():
        print(f"{key:22s} {val}")
    for i, cols in enumerate(scan_schemas(plan)):
        print(f"scan[{i}] reads: {', '.join(cols)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
