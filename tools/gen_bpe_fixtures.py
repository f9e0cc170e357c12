"""Regenerate the vendored BPE artifacts (r10 verdict item 3).

Two outputs, both committed:

1. ``genai_batch_processor_spark/functions/bpe_merges.json`` — the
   merges table, trained deterministically on the sf0.001 ``documents``
   fixture (500 docs; seed-42 driver data). The table is DATA: the
   tokenizer is fully defined by it plus the shared pre-token regex.

2. ``genai_batch_processor_spark/functions/bpe_counts.parquet`` — the
   recorded count relation the DuckDB oracle replays:
   ``(text_md5, n_bpe_tokens)`` for every distinct text the BPE oracles
   price across sf0.001 / sf0.01 / sf0.1 — document texts, chunk texts
   (materialized via the operator-owned ``sql_chunk_documents`` twin,
   so the window geometry lives in exactly one place), and
   classification-prompt texts (the shared ``CLASSIFY_TEMPLATE``
   constant applied in Python, same ``format_string`` %s semantics).
   The counts here are produced by THIS
   file's INDEPENDENT encoder — the Sennrich formulation (apply merge
   rules sequentially in rank order), deliberately a different
   algorithm from the engine's priority formulation
   (``functions/bpe.py::encode_pretoken``) — so Spark-vs-oracle
   agreement in CORRECTNESS checks two implementations against each
   other, not one implementation against its own recording.
   (Equivalence of the two formulations: a merge's components always
   have lower ranks, so applying rank r never creates a pair of rank
   < r; fuzz-verified in tests/test_bpe.py.)

Usage:  python tools/gen_bpe_fixtures.py [testdata_root]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from genai_batch_processor_spark.functions import bpe

SF_DIRS = ("sf0.001", "sf0.01", "sf0.1")


def sennrich_count(text: str, merges: list[tuple[bytes, bytes]]) -> int:
    """Independent reference encoder: apply each merge rule once, in
    rank order, to every pre-token (left-to-right non-overlapping per
    rule). No priority queue, no shared helper with the engine's
    encode path beyond the pre-token regex (which is part of the
    tokenizer's definition)."""
    n = 0
    for pt in bpe.PRETOKEN_RE.findall(text):
        toks = [bytes([c]) for c in pt.encode("utf-8")]
        for a, b in merges:
            if len(toks) < 2:
                break
            out = []
            i = 0
            while i < len(toks):
                if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        n += len(toks)
    return n


def main() -> None:
    from tools._args import positional

    args = positional(usage="usage: gen_bpe_fixtures.py [testdata_root]")
    root = args[0] if args else "/root/testdata"

    train_texts = (
        pq.read_table(os.path.join(root, "sf0.001", "documents.parquet"))
        .column("text")
        .to_pylist()
    )
    merges = bpe.train_merges(train_texts, bpe.N_MERGES)
    bpe.save_merges(merges, bpe.MERGES_PATH)
    print(f"wrote {bpe.MERGES_PATH}: {len(merges)} merges")

    import duckdb

    from genai_batch_processor_spark.inference import mock
    from genai_batch_processor_spark.operators import chunking, requests

    def classify_prompt(text: str) -> str:
        # same %s semantics as F.format_string / classification_prompt
        return requests.CLASSIFY_TEMPLATE % (
            ", ".join(mock.DEFAULT_LABELS),
            text,
        )

    seen: dict[str, int] = {}

    def record(t: str) -> None:
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        c = sennrich_count(t, merges)
        if h in seen and seen[h] != c:
            raise SystemExit(f"md5 collision with divergent counts: {h}")
        seen[h] = c

    for sf in SF_DIRS:
        texts = (
            pq.read_table(os.path.join(root, sf, "documents.parquet"))
            .column("text")
            .to_pylist()
        )
        # chunk texts: materialize via the operator's own SQL twin —
        # the chunk geometry is defined once (operators/chunking.py)
        # and already oracle-checked by doc_chunks/chunk_packing
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{os.path.join(root, sf, 'documents.parquet')}'"
        )
        chunk_texts = [
            r[0]
            for r in con.execute(
                "SELECT DISTINCT chunk_text FROM ("
                + chunking.sql_chunk_documents()
                + ")"
            ).fetchall()
        ]
        con.close()
        for t in texts:
            record(t)
            record(classify_prompt(t))
        for t in chunk_texts:
            record(t)
    out = os.path.join(os.path.dirname(bpe.MERGES_PATH), "bpe_counts.parquet")
    items = sorted(seen.items())
    pq.write_table(
        pa.table(
            {
                "text_md5": pa.array([k for k, _ in items], pa.string()),
                "n_bpe_tokens": pa.array([v for _, v in items], pa.int64()),
            }
        ),
        out,
    )
    print(f"wrote {out}: {len(items)} distinct texts")


if __name__ == "__main__":
    main()
