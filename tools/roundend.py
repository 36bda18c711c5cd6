"""Round-end validation in one command (VERDICT r6 item 9: the manual
audits must not be skippable between rounds).

Runs, in order, failing fast on the first nonzero exit:

  1. oracle_lint  — every oracle binds and emits no HUGEINT/UHUGEINT/
                    DECIMAL output column (the r6 q186/q208 bug class);
  2. funnel_audit — no unsanctioned Exchange SinglePartition anywhere
                    in the catalog (the r5 vocab-sort / q177 class);
  3. check        — full Spark-vs-DuckDB oracle sweep at the given SF
                    with the type-strict canon;
  4. pytest       — the unit/property suite.

Usage:  python tools/roundend.py [sf_dir] [--fast]
``--fast`` skips steps 3-4 (lint + funnel only, ~4 min) for mid-round
spot checks; the full run is the round-end gate.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--fast"]
    fast = "--fast" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    steps: list[tuple[str, list[str]]] = [
        ("oracle_lint", [sys.executable, "tools/oracle_lint.py"]),
        ("funnel_audit", [sys.executable, "tools/funnel_audit.py"]),
    ]
    if not fast:
        steps += [
            ("oracle sweep", [sys.executable, "tools/check.py", sf_dir]),
            ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
        ]

    for name, cmd in steps:
        t0 = time.time()
        print(f"== roundend: {name} ==", flush=True)
        rc = subprocess.call(cmd, cwd=ROOT)
        print(f"== roundend: {name} rc={rc} ({time.time()-t0:.0f}s) ==", flush=True)
        if rc != 0:
            return rc
    print("== roundend: ALL GREEN ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
