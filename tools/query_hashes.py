"""Query-source manifest for the recheck discipline.

The driver's correctness rotation (__spark_entry__.py) only re-verifies a
query when it is unproven or listed in ``_RECHECK``. That list is
maintained by hand, so a silent edit to an already-verified query body
would dodge the driver gate forever. This tool hashes every query's
function source + oracle SQL into ``QUERY_HASHES.json``;
tests/test_entry_contract.py fails when a hash changed for a verified
query that is not in ``_RECHECK`` — forcing the editor to either add the
name to ``_RECHECK`` (so the driver re-proves it) or consciously
regenerate the manifest.

Limitation (documented, not hidden): the hash covers the query function
body and its oracle string only. An edit to a helper the query calls
(e.g. llm/curation.py) does not move the hash — helper edits still need
the manual _RECHECK entry, as in round 4's q96.

Usage:
    python tools/query_hashes.py          # print drift vs manifest
    python tools/query_hashes.py --write  # regenerate the manifest
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

MANIFEST = os.path.join(ROOT, "QUERY_HASHES.json")


def compute() -> dict[str, str]:
    from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES

    out = {}
    for name, q in sorted(QUERIES.items()):
        src = inspect.getsource(q.fn) + "\n--oracle--\n" + (q.oracle or "")
        out[name] = hashlib.sha256(src.encode()).hexdigest()[:16]
    return out


def load_manifest() -> dict[str, str]:
    if not os.path.exists(MANIFEST):
        return {}
    return json.loads(open(MANIFEST).read())


def main() -> int:
    cur = compute()
    if "--write" in sys.argv:
        with open(MANIFEST, "w") as f:
            json.dump(cur, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {MANIFEST} ({len(cur)} queries)")
        return 0
    old = load_manifest()
    changed = [n for n in cur if n in old and old[n] != cur[n]]
    new = [n for n in cur if n not in old]
    gone = [n for n in old if n not in cur]
    for label, names in (("changed", changed), ("new", new), ("removed", gone)):
        if names:
            print(f"{label}: {names}")
    if not (changed or new or gone):
        print("manifest up to date")
    return 1 if changed else 0


if __name__ == "__main__":
    sys.exit(main())
