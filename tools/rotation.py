"""Driver-gate rotation (round-7 verdict item 6): print the 50
registered queries whose newest green driver-gate row is OLDEST.

The per-round driver samples the FIRST 50 entries of
``queries.QUERIES`` for the DuckDB oracle gate
(``CORRECTNESS_r{N}.json``). Code under long-ungated queries keeps
evolving (heap config, shared-stage rewrites), so the registry front
must cycle oldest-gated-first each round — with 150 queries and a
50-query window, every query re-gates at most every 3 rounds.

Usage (each round, before the driver runs):

    python tools/rotation.py          # prints the _R{N}_FRONT literal

Paste the output over the previous round's front block at the bottom of
``genai_batch_processor_spark/queries.py``. Queries added mid-round are
never-gated (round 0) and therefore sort first automatically.

A green row = rows+schema match and hash match (or hash not checked —
the rows-only contract for non-SQL-expressible ops).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def latest_green_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            results = json.load(f)
        for name, res in results.items():
            ok = (
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match") in (True, None)
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def registered_names() -> list[str]:
    sys.path.insert(0, ROOT)
    import __spark_entry__ as entrymod

    return list(entrymod.queries())


def main() -> None:
    latest = latest_green_rounds()
    names = registered_names()
    front = sorted(names, key=lambda n: (latest.get(n, 0), n))[:WINDOW]
    next_round = max(latest.values(), default=0) + 1
    print(f"_R{next_round}_FRONT = [")
    for name in front:
        print(f'    "{name}",  # last gated r{latest.get(name, 0)}')
    print("]")


if __name__ == "__main__":
    main()
