"""Result-fingerprint manifest: one value hash per query at a fixed
scale factor, committed as RESULTS_FINGERPRINT.json.

Per-round oracle parity proves Spark == DuckDB *within* a round; this
manifest proves results are stable *across* rounds and refactors — any
engine change that silently alters a query's output shows up as a
fingerprint diff in review, even if both engines drifted together
(e.g. a constant tuned on one side and mirrored on the other).

Hashing matches the driver's compare: columns sorted by name, rows
sorted by their repr tuple, sha256 over the joined reprs.

Usage: python tools/fingerprint_results.py [sf_dir] [out_json]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from genai_batch_processor_spark.session import get_spark
from tools.check_parity import norm_val  # ONE normalization definition


def fingerprint(df) -> dict:
    cols = df.columns
    idx = [cols.index(c) for c in sorted(cols)]
    # norm_val mirrors the parity gate (floats to 6 dp, NaN sentinel):
    # a 7th-decimal float wobble must not raise a drift alarm the
    # oracle compare itself would ignore.
    rows = sorted(
        tuple(repr(norm_val(r[i])) for i in idx) for r in df.collect()
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return {
        "rows": len(rows),
        "schema": [f"{c}:{t}" for c, t in sorted(df.dtypes)],
        "sha256": h.hexdigest()[:24],
    }


def main() -> None:
    from tools._args import positional

    args = positional(usage="usage: fingerprint_results.py [sf_dir] [out_json]")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "RESULTS_FINGERPRINT.json"
    spark = get_spark("fingerprint")
    manifest: dict = {"sf_dir": sf_dir, "queries": {}}
    # Carry forward evidence notes (e.g. the partition-count-invariance
    # record) ONLY while the query set they were verified against is
    # unchanged — notes are stamped with a hash of the sorted query
    # names (notes_query_set), and a regeneration over a different set
    # DROPS them rather than silently re-attaching provenance claims
    # to hashes they never covered.
    qset = hashlib.sha256(
        "\x1f".join(sorted(entrymod.queries())).encode()
    ).hexdigest()[:16]
    if os.path.exists(out):
        try:
            prior = json.load(open(out))
            if (
                isinstance(prior, dict)
                and "notes" in prior
                and prior.get("notes_query_set") == qset
            ):
                manifest["notes"] = prior["notes"]
                manifest["notes_query_set"] = qset
        except (json.JSONDecodeError, OSError):
            pass
    for name, fn in sorted(entrymod.queries().items()):
        try:
            manifest["queries"][name] = fingerprint(fn(spark, sf_dir))
        except Exception as e:  # record TYPE only — messages carry
            # nondeterministic paths/ports/object-ids that would make
            # the manifest itself unstable exactly when it matters
            manifest["queries"][name] = {"error": type(e).__name__}
        print(name, manifest["queries"][name], file=sys.stderr)
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    n_err = sum(1 for v in manifest["queries"].values() if "error" in v)
    print(json.dumps({"queries": len(manifest["queries"]), "errors": n_err}))
    if n_err:  # a failed sweep must not look like a clean regeneration
        sys.exit(1)


if __name__ == "__main__":
    main()
