"""Physical-plan inspection and audit utilities (SURVEY.md §4).

Correctness gates say WHAT a query returns; this package is for HOW it
runs — the properties that decide whether a plan survives a 100× scale
up: filters reaching the scan, column pruning, broadcast vs
sort-merge, codegen coverage, no cartesian fallbacks. The plan
regression tests (tests/test_plans.py) are built on these helpers, and
they are product surface too: a user porting their own queries onto
this engine audits them the same way.
"""

from .inspect import (  # noqa: F401
    codegen_span_count,
    executed_plan,
    final_plan,
    plan_summary,
    scan_schemas,
)
