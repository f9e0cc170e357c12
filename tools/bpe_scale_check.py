"""BPE scale evidence (r11 verdict items 2+3).

Two questions the committed 32-merge fixture table cannot answer:

1. **Trainer scale** — `train_merges_distributed` runs one corpus scan
   plus one job per merge round over the distinct-word relation. How do
   merges/min move when the corpus grows 10x (sf0.1 documents vs a
   10x-replicated stand-in for sf1)? Replicated text keeps the distinct
   -word vocabulary FIXED, which is exactly the scaling claim: the scan
   phase is corpus-proportional, the per-round phase is
   vocabulary-proportional.

2. **Encode throughput at production vocabulary** — the committed table
   has 32 merges; a real tokenizer has 30k-100k. The per-pre-token
   encode cost grows with merge depth, and the memo hit rate (the whole
   scale argument for `token_count_bpe`) is unmeasured. Train a
   ~1k-merge table on a RICHER generated corpus (~20k-word Zipf
   vocabulary — the fixture word-soup saturates at ~89 merges), then
   measure token_count_bpe rows/s and tokens/s at 1x and 10x rows, plus
   the driver-side memo hit rate on the same stream.

The rich merges table is a tools-only artifact (written under /tmp) —
the committed tokenizer stays the fixture-trained one; oracle parity is
untouched. Timing uses a noop sink, NOT count(): token counting is
Project-only, and Catalyst prunes ArrowEvalPython under count()
(tools/scale_check.py learned this the hard way; see BENCH_NOTES).

Usage:  python tools/bpe_scale_check.py [--quick]
Prints one JSON object; paste the summary into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import random
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import bpe
from genai_batch_processor_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

VOCAB_SIZE = 20_000
N_DOCS = 20_000
WORDS_PER_DOC = 120
N_RICH_MERGES = 1_000
N_TRAINER_NOTE_MERGES = 64  # small fixed count; merges/min normalizes

# Rough English letter frequencies so merges find real structure
# (uniform letters would make most pairs equally rare).
_LETTERS = "etaoinshrdlcumwfgypbvkjxqz"
_WEIGHTS = [12, 9, 8, 8, 7, 7, 6, 6, 6, 4, 4, 4, 3, 3, 2, 2, 2, 2, 2,
            1.5, 1, 0.8, 0.2, 0.15, 0.1, 0.07]


def gen_rich_corpus(rng: random.Random) -> list[str]:
    """Deterministic Zipf corpus with a ~20k-word vocabulary."""
    vocab = set()
    while len(vocab) < VOCAB_SIZE:
        n = rng.randint(2, 12)
        w = "".join(rng.choices(_LETTERS, weights=_WEIGHTS, k=n))
        if rng.random() < 0.08:
            w = w.capitalize()
        vocab.add(w)
    vocab = sorted(vocab)
    # Zipf weights over a shuffled rank assignment
    rng.shuffle(vocab)
    weights = [1.0 / (r + 1) for r in range(len(vocab))]
    punct = [".", ",", ";", "!", "?"]
    docs = []
    for _ in range(N_DOCS):
        ws = rng.choices(vocab, weights=weights, k=WORDS_PER_DOC)
        # sprinkle digits + punctuation like real text
        for i in range(0, len(ws), 17):
            ws[i] = ws[i] + rng.choice(punct)
        for i in range(8, len(ws), 31):
            ws[i] = str(rng.randint(0, 99999))
        docs.append(" ".join(ws))
    return docs


def timed(f):
    t0 = time.monotonic()
    out = f()
    return time.monotonic() - t0, out


def replicate(df, k: int):
    """k logical copies (text unchanged — vocabulary held fixed by
    design; see module docstring)."""
    return df.crossJoin(
        df.sparkSession.range(k).select(F.col("id").alias("__rep"))
    ).drop("__rep")


def memo_stats(texts: list[str]) -> dict:
    """Driver-side replay of the pre-token stream: the memo hit rate is
    a property of the data + cache policy, not of Spark."""
    total = 0
    distinct = set()
    for t in texts:
        for pt in bpe.PRETOKEN_RE.findall(t):
            total += 1
            distinct.add(pt)
    return {
        "pretokens_total": total,
        "pretokens_distinct": len(distinct),
        "memo_hit_rate": round(1 - len(distinct) / max(total, 1), 4),
    }


def main() -> None:
    quick = "--quick" in sys.argv
    n_rich = 100 if quick else N_RICH_MERGES
    spark = get_spark("bpe-scale-check")
    out: dict = {"quick": quick, "src": SRC}

    if "--rich-incr" in sys.argv:
        # standalone leg: the incremental-delta trainer on the SAME
        # rich corpus/merge count as the full-recount rich_trainer
        # leg, so the two merges/min numbers compare directly (run
        # separately — together they overrun a 10-minute timeout).
        rng = random.Random(42)
        texts = gen_rich_corpus(rng)
        rich = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        # same parquet-scan input shape as the main leg (not an
        # ExistingRDD plan), so the merges/min numbers compare directly
        rich_path = "/tmp/bpe_scale_rich_corpus.parquet"
        rich.write.mode("overwrite").parquet(rich_path)
        rich = spark.read.parquet(rich_path)
        sec, rich_merges = timed(
            lambda: bpe.train_merges_distributed(
                rich, "text", n_rich, n_partitions=8, incremental=True
            )
        )
        out["rich_trainer_incremental"] = {
            "n_merges": len(rich_merges),
            "sec": round(sec, 2),
            "merges_per_min": round(len(rich_merges) / (sec / 60), 1),
        }
        # bit-for-bit cross-check against the full-recount artifact from
        # the main run — only when the two runs trained the SAME merge
        # count (a --quick main run vs a full --rich-incr run would
        # read as a false trainer "mismatch" on length alone)
        main_path = "/tmp/bpe_rich_merges.json"
        if os.path.exists(main_path):
            prior = bpe.load_merges(main_path)
            if len(prior) == len(rich_merges):
                out["matches_full_recount"] = rich_merges == prior
            else:
                out["matches_full_recount"] = (
                    f"incomparable: prior run trained {len(prior)} "
                    f"merges, this run {len(rich_merges)}"
                )
        print(json.dumps(out))
        return

    # ---- 1. trainer merges/min: sf0.1 vs 10x-replicated (sf1 proxy)
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    n_docs = docs.count()
    # warm the JVM + python workers so leg 1 doesn't eat startup cost
    bpe.train_merges_distributed(docs.limit(50), "text", 4)
    for label, d, reps in (("sf0.1", docs, 1), ("sf1_proxy", docs, 10)):
        corpus = d if reps == 1 else replicate(d, reps)
        sec, merges = timed(
            lambda c=corpus: bpe.train_merges_distributed(
                c, "text", N_TRAINER_NOTE_MERGES, n_partitions=8
            )
        )
        out[f"trainer_{label}"] = {
            "rows": n_docs * reps,
            "n_merges": len(merges),
            "sec": round(sec, 2),
            "merges_per_min": round(len(merges) / (sec / 60), 1),
        }

    # ---- 2. rich corpus + ~1k-merge table (distributed trainer)
    rng = random.Random(42)
    sec, texts = timed(lambda: gen_rich_corpus(rng))
    out["rich_corpus"] = {
        "docs": len(texts),
        "gen_sec": round(sec, 2),
        **memo_stats(texts),
    }
    rich = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rich_path = "/tmp/bpe_scale_rich_corpus.parquet"
    rich.write.mode("overwrite").parquet(rich_path)
    rich = spark.read.parquet(rich_path)  # real scan, not ExistingRDD

    sec, rich_merges = timed(
        lambda: bpe.train_merges_distributed(
            rich, "text", n_rich, n_partitions=8
        )
    )
    out["rich_trainer"] = {
        "n_merges": len(rich_merges),
        "sec": round(sec, 2),
        "merges_per_min": round(len(rich_merges) / (sec / 60), 1),
    }
    merges_path = "/tmp/bpe_rich_merges.json"
    bpe.save_merges(rich_merges, merges_path)
    out["rich_merges_path"] = merges_path

    # ---- 3. encode throughput at the rich vocabulary, 1x and 10x.
    # noop sink: token counting is Project-only and count() would
    # prune the ArrowEvalPython node entirely.
    ranks = bpe.ranks_table(rich_merges)
    sample = texts[:2000]
    total_tokens = sum(
        bpe.count_text(t, ranks, cache={}) for t in sample
    )
    tokens_per_row = total_tokens / len(sample)
    for label, reps in (("1x", 1), ("10x", 10)):
        d = rich if reps == 1 else replicate(rich, reps)
        counted = d.select(
            bpe.token_count_bpe("text", merges=rich_merges).alias("n")
        )
        sec, _ = timed(
            lambda c=counted: c.write.format("noop")
            .mode("overwrite")
            .save()
        )
        rows = len(texts) * reps
        out[f"encode_{label}"] = {
            "rows": rows,
            "sec": round(sec, 2),
            "rows_per_sec": round(rows / sec),
            "tokens_per_sec": round(rows * tokens_per_row / sec),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
