"""Diff the per-query plan digests between two bench JSON outputs.

    python tools/plan_diff.py BENCH_r02.json BENCH_r03.json

Reports queries whose normalized plan digest changed (shape change —
inspect with tools/explain.py), plus shape-counter regressions (lost
broadcasts, new exchanges, new single-partition stages) even when the
digest alone wouldn't say why. Wall-time is load-sensitive; plan shape
is not — diff plans first, clocks second.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    # bench output may be wrapped in a driver record with a `tail` blob
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = json.loads(text.splitlines()[-1])
    if "plans" not in d and "tail" in d:
        tail = d["tail"]
        if '{"metric"' not in tail:
            sys.exit(
                f"{path}: driver record holds no bench JSON line "
                "(run may have crashed before printing)"
            )
        line = tail[tail.rindex('{"metric"'):]
        d = json.loads(line.split("\n")[0])
    return d


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    po, pn = old.get("plans", {}), new.get("plans", {})
    changed = []
    for name in sorted(set(po) & set(pn)):
        a, b = po[name], pn[name]
        notes = []
        if a["digest"] != b["digest"]:
            notes.append("shape changed")
        if b["exchanges"] > a["exchanges"]:
            notes.append(
                f"exchanges {a['exchanges']}→{b['exchanges']}"
            )
        if b["broadcasts"] < a["broadcasts"]:
            notes.append(
                f"broadcasts {a['broadcasts']}→{b['broadcasts']}"
            )
        if b["single_partition"] > a["single_partition"]:
            notes.append(
                f"single-partition {a['single_partition']}"
                f"→{b['single_partition']}"
            )
        if notes:
            changed.append((name, notes))
    for name in sorted(set(pn) - set(po)):
        changed.append((name, ["new query"]))
    for name in sorted(set(po) - set(pn)):
        changed.append((name, ["REMOVED"]))
    if not changed:
        print("plans identical")
        return
    for name, notes in changed:
        print(f"{name:32s} {'; '.join(notes)}")


if __name__ == "__main__":
    main()
