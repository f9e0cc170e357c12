"""Driver-gate rotation (round-7 verdict item 6; hardened per round-10
verdict item 8): print the 50 registered queries that the driver must
gate next round.

The per-round driver samples the FIRST 50 entries of
``queries.QUERIES`` for the DuckDB oracle gate
(``CORRECTNESS_r{N}.json``). Code under long-ungated queries keeps
evolving (heap config, shared-stage rewrites), so the registry front
must cycle oldest-gated-first each round — with ~150 queries and a
50-query window, every query re-gates at most every ~3 rounds.

Round-10 hardening (verdict item 8 — two r10-added queries sat outside
every window until a judge noticed): NEVER-GATED queries are placed at
the FRONT of the window *unconditionally* (before any oldest-gated
name), and the tool HARD-FAILS if any registered query would end up
with no driver row ever AND outside the upcoming window — i.e. the
union of all CORRECTNESS artifacts plus the printed front must cover
the whole registry.

Usage (each round, before the driver runs):

    python tools/rotation.py          # prints the _R{N}_FRONT literal

Paste the output over the previous round's front block at the bottom of
``genai_batch_processor_spark/queries.py``.

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


def compute_front(
    names: list[str], latest: dict[str, int], window: int = WINDOW
) -> list[str]:
    """Window = all never-gated names first (unconditionally), then
    oldest-gated-first. Raises if never-gated names alone overflow the
    window (every one of them MUST be in the next driver sample) or if
    any registered name would stay both row-less and window-less."""
    never = sorted(n for n in names if n not in latest)
    if len(never) > window:
        raise SystemExit(
            f"{len(never)} never-gated queries exceed the {window}-entry "
            f"driver window; shrink the batch of new queries or gate "
            f"some via tools/check_parity.py first: {never}"
        )
    gated = sorted(
        (n for n in names if n in latest), key=lambda n: (latest[n], n)
    )
    front = never + gated[: window - len(never)]
    uncovered = [n for n in names if n not in latest and n not in front]
    if uncovered:  # unreachable given the branch above; belt-and-braces
        raise SystemExit(f"queries outside every gate: {uncovered}")
    return front


def main() -> None:
    if len(sys.argv) > 1:  # the tool takes no arguments, option-like or not
        raise SystemExit("usage: python tools/rotation.py  (no arguments)")
    latest = latest_green_rounds()
    names = registered_names()
    front = compute_front(names, latest)
    next_round = max(latest.values(), default=0) + 1
    print(f"_R{next_round}_FRONT = [")
    for name in front:
        tag = f"r{latest[name]}" if name in latest else "NEVER — front-loaded"
        print(f'    "{name}",  # last gated {tag}')
    print("]")


if __name__ == "__main__":
    main()
