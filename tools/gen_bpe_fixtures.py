"""Regenerate the vendored BPE artifacts (r10 verdict item 3; v2
tokenizer + governed format r12 verdict item 1).

Four outputs, all committed:

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

3. ``genai_batch_processor_spark/functions/bpe_merges_v384.json`` —
   the v2 tokenizer: ``V2_N_MERGES`` merges trained by
   ``train_merges_distributed`` ITSELF (a Spark job, not the driver
   trainer) on the multi-table fixture corpus
   (``bpe.tokenizer_corpus_v2``), then cross-checked bit-for-bit
   against the driver trainer on the collected corpus. Persisted via
   the governed ``save_merges`` format (format version + content
   fingerprint + live encode canary), as is (1).

4. ``genai_batch_processor_spark/functions/bpe_counts_v2.parquet`` —
   the recorded count relation for the v2 tokenizer: document texts
   AND classification-prompt texts across all three SFs, counted by
   this file's independent Sennrich encoder under the v2 merges
   (prompt TEMPLATE words are outside the training corpus, so they
   exercise the deep-subword-split path of the loaded tokenizer).
   Replayed by the ``bpe_loaded_tokenizer`` oracle.

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
    def write_counts(items, merge_table, out_name: str) -> str:
        """Recorded-count relation, STAMPED (schema metadata) with the
        fingerprint of the merges table its counts were derived under —
        so a merges regeneration that skips the counts (or vice versa)
        is caught by a direct stamp comparison
        (tests/test_bpe.py::test_counts_relations_stamped...), not only
        by downstream parity mismatches."""
        out = os.path.join(os.path.dirname(bpe.MERGES_PATH), out_name)
        table = pa.table(
            {
                "text_md5": pa.array([k for k, _ in items], pa.string()),
                "n_bpe_tokens": pa.array(
                    [v for _, v in items], pa.int64()
                ),
            }
        ).replace_schema_metadata(
            {
                "merges_fingerprint": bpe.merges_fingerprint(merge_table),
                "n_merges": str(len(merge_table)),
            }
        )
        pq.write_table(table, out)
        print(f"wrote {out}: {len(items)} distinct texts")
        return out

    write_counts(sorted(seen.items()), merges, "bpe_counts.parquet")

    # ---- v2 tokenizer: distributed-trained, governed-persisted ----------
    from genai_batch_processor_spark.session import get_spark

    spark = get_spark("gen-bpe-fixtures")
    corpus = bpe.tokenizer_corpus_v2(
        spark, os.path.join(root, "sf0.001")
    )
    v2 = bpe.train_merges_distributed(
        corpus, "text", bpe.V2_N_MERGES, n_partitions=8
    )
    # cross-check: the driver trainer on the collected corpus must
    # agree bit-for-bit (the committed artifact is the DISTRIBUTED
    # trainer's output; this guards the generator itself)
    driver_v2 = bpe.train_merges(
        [r["text"] for r in corpus.collect() if r["text"] is not None],
        bpe.V2_N_MERGES,
    )
    if v2 != driver_v2:
        raise SystemExit("distributed and driver v2 trainings diverge")
    bpe.save_merges(v2, bpe.V2_MERGES_PATH)
    print(
        f"wrote {bpe.V2_MERGES_PATH}: {len(v2)} merges, "
        f"fp {bpe.merges_fingerprint(v2)}"
    )

    seen_v2: dict[str, int] = {}

    def record_v2(t: str) -> None:
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        c = sennrich_count(t, v2)
        if h in seen_v2 and seen_v2[h] != c:
            raise SystemExit(f"md5 collision with divergent v2 counts: {h}")
        seen_v2[h] = c

    for sf in SF_DIRS:
        for t in (
            pq.read_table(os.path.join(root, sf, "documents.parquet"))
            .column("text")
            .to_pylist()
        ):
            record_v2(t)
            record_v2(classify_prompt(t))
    write_counts(sorted(seen_v2.items()), v2, "bpe_counts_v2.parquet")


if __name__ == "__main__":
    main()
