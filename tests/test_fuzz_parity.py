"""Cross-engine fuzz: the Spark column exprs and their DuckDB SQL twins
in functions/text.py and functions/hashing.py must agree on adversarial
strings, not just on the friendly fixture corpus — empty strings,
whitespace runs, unicode, emails/phones, pathological repetition.

Deterministic generation (seeded) so failures reproduce; one Spark job
and one DuckDB query over the whole batch (not per-example roundtrips).
"""

from __future__ import annotations

import random
import string

import pandas as pd
import pytest

from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import hashing, text as tx
from genai_batch_processor_spark.functions import vectors as vec
from genai_batch_processor_spark.operators import (
    batching as _batching,
    sampling,
    snapshot as _snapshot,
)

_MARKERS = [
    "the", "and", "der", "und", "le", "la", "el", "los", "de",
    "你好", "世界", "é", "ü", "ñ",
]


def _gen_strings(n: int = 300) -> list[str]:
    rng = random.Random(20260813)
    corpus: list[str] = [
        None,  # NULL text: every twin pair must agree on NULL, not
        # just on strings (round-4 advice: the funnel sum_chars
        # coalesce asymmetry would only have surfaced on NULL rows)
        "",
        " ",
        "   ",
        "\n",
        "\t",
        "a",
        "A" * 500,
        "word " * 100,
        "a@b.co reach me at c.d@e-f.org or (555) 123-4567",
        "+1-555-000-1111 is my number; 555 867 5309 is not formatted",
        "!!!???...,,,;;;:::",
        "1234567890 0987654321",
        "the the the the the the",
        "der und der und der und",
        "你好世界你好世界你好世界",
        "mixed ASCII und 世界 avec é and ñ words",
        "Question: what?\nAnswer: that.",
        'quotes "double" and \'single\' and `backtick`',
        "tab\tseparated\tfields",
        "trailing space ",
        " leading space",
    ]
    pools = [
        string.ascii_lowercase + " ",
        string.ascii_letters + string.digits + " .,!?",
        string.printable,
        "abc 你好 émü ",
    ]
    while len(corpus) < n:
        pool = rng.choice(pools)
        length = rng.randint(0, 120)
        corpus.append("".join(rng.choice(pool) for _ in range(length)))
    return corpus


@pytest.fixture(scope="module")
def fuzz_data(spark):
    strings = _gen_strings()
    rows = list(enumerate(strings))
    sdf = spark.createDataFrame(rows, "i LONG, text STRING")

    import duckdb

    con = duckdb.connect()
    con.register(
        "fuzz_pd", pd.DataFrame({"i": range(len(strings)), "text": strings})
    )
    con.execute("CREATE TABLE fuzz AS SELECT * FROM fuzz_pd")
    yield sdf, con
    con.close()


_CASES = {
    "word_count": (tx.word_count, tx.sql_word_count),
    "token_count": (tx.token_count, tx.sql_token_count),
    "stopword_ratio": (tx.stopword_ratio, tx.sql_stopword_ratio),
    "punct_ratio": (tx.punct_ratio, tx.sql_punct_ratio),
    "mean_word_length": (tx.mean_word_length, tx.sql_mean_word_length),
    "quality_score": (tx.quality_score, tx.sql_quality_score),
    "lang_guess": (tx.lang_guess, tx.sql_lang_guess),
    "email_count": (tx.email_count, tx.sql_email_count),
    "phone_count": (tx.phone_count, tx.sql_phone_count),
    "redact_pii": (tx.redact_pii, tx.sql_redact_pii),
    "repetition_ratio": (tx.repetition_ratio, tx.sql_repetition_ratio),
    "fingerprint": (tx.fingerprint, tx.sql_fingerprint),
    "hash60": (
        lambda c: hashing.portable_hash60(F.col(c)),
        lambda e: hashing.sql_hash60(e),
    ),
    "hash_coord": (
        lambda c: sampling.hash_coord(c, salt="fuzz"),
        lambda e: sampling.sql_hash_coord(e, salt="fuzz"),
    ),
    "assign_split": (
        lambda c: sampling.assign_split(c),
        lambda e: sampling.sql_assign_split(e),
    ),
    "shuffle_coord": (
        lambda c: _batching.shuffle_coord(c, seed="fuzz-epoch"),
        lambda e: _batching.sql_shuffle_coord(e, seed="fuzz-epoch"),
    ),
    "curriculum_time": (
        lambda c: sampling.curriculum_time(
            c, F.lit("src0"), {"src0": 4.0, "src3": 0.25}
        ),
        lambda e: sampling.sql_curriculum_time(
            e, "'src0'", {"src0": 4.0, "src3": 0.25}
        ),
    ),
    "row_fingerprint": (
        lambda c: _snapshot.row_fingerprint([c, c]),
        lambda e: _snapshot.sql_row_fingerprint([e, e]),
    ),
    # quality_filter_funnel's per-doc integer metrics, as one pipe-joined
    # string — the exact counters its cross-multiplied rules compare, so
    # an engine split on any weird input shows up here before it can
    # skew the funnel's aggregate.
    "funnel_metrics": (
        lambda c: _funnel_metrics_spark(c),
        lambda e: _funnel_metrics_sql(e),
    ),
}


def _funnel_metrics_spark(c):
    # the REAL metric columns (queries.funnel_metric_cols reads column
    # "text"), joined into one comparable string — not a re-derivation
    from genai_batch_processor_spark import queries as q

    assert c == "text"  # funnel_metric_cols is defined over "text"
    return F.concat_ws("|", *q.funnel_metric_cols())


def _funnel_metrics_sql(e):
    from genai_batch_processor_spark import queries as q

    exprs = q.sql_funnel_metric_exprs(e)  # same dict the oracle uses
    return "concat_ws('|', " + ", ".join(exprs.values()) + ")"


@pytest.mark.parametrize("name", sorted(_CASES))
def test_text_twins_agree_on_adversarial_input(fuzz_data, name):
    from tests.util import duck_rows, rows_of

    sdf, con = fuzz_data
    fn, sql_fn = _CASES[name]
    spark_df = sdf.select("i", fn("text").alias("v"))
    sql = f"SELECT i, {sql_fn('text')} AS v FROM fuzz"
    s, d = rows_of(spark_df), duck_rows(con, sql)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


# -- vector twins over degenerate embeddings ---------------------------------


@pytest.fixture(scope="module")
def vec_data(spark):
    rng = random.Random(20260814)
    vecs: list[list[float]] = [
        [],
        [0.0],
        [0.0] * 64,
        [1.0],
        [-1.0, 1.0],
        [1e-30] * 8,
        [1e30, -1e30, 1.0],
        [0.1] * 3,  # shorter than the 8 sign bits
    ]
    while len(vecs) < 120:
        dim = rng.choice([1, 2, 7, 8, 9, 64])
        vecs.append(
            [rng.uniform(-1, 1) for _ in range(dim)]
        )
    # dot/cosine contract: both vectors share the corpus dimension (a
    # real embedding table has ONE dim) — pair each vector with a
    # same-length partner: its reverse, itself, or a zero vector.
    rng2 = random.Random(20260815)
    rows = []
    for i, a in enumerate(vecs):
        partner = rng2.choice(
            [list(reversed(a)), list(a), [0.0] * len(a)]
        )
        rows.append((i, a, partner))
    sdf = spark.createDataFrame(
        rows, "i LONG, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"
    )

    import duckdb

    con = duckdb.connect()
    con.register(
        "vec_pd",
        pd.DataFrame(
            {
                "i": [r[0] for r in rows],
                "a": [r[1] for r in rows],
                "b": [r[2] for r in rows],
            }
        ),
    )
    con.execute("CREATE TABLE vecs AS SELECT * FROM vec_pd")
    yield sdf, con
    con.close()


_VEC_CASES = {
    "dot": (
        lambda: vec.dot("a", "b"),
        lambda: vec.sql_dot("a", "b"),
    ),
    "cosine": (
        lambda: vec.cosine("a", "b"),
        lambda: vec.sql_cosine("a", "b"),
    ),
    "sign_bits": (
        lambda: vec.sign_bits_bucket("a"),
        lambda: vec.sql_sign_bits_bucket("a"),
    ),
    "quantize_scale": (
        lambda: vec.quantize_int8_stats("a")["scale"],
        lambda: f"({vec.sql_quantize_int8_stats('a')}).scale",
    ),
    "quantize_err": (
        lambda: vec.quantize_int8_stats("a")["max_abs_err"],
        lambda: f"({vec.sql_quantize_int8_stats('a')}).max_abs_err",
    ),
    "quantize_sat": (
        lambda: vec.quantize_int8_stats("a")["n_saturated"],
        lambda: f"({vec.sql_quantize_int8_stats('a')}).n_saturated",
    ),
}


@pytest.mark.parametrize("name", sorted(_VEC_CASES))
def test_vector_twins_agree_on_degenerate_input(vec_data, name):
    from tests.util import duck_rows, rows_of

    sdf, con = vec_data
    fn, sql_fn = _VEC_CASES[name]
    spark_df = sdf.select("i", fn().alias("v"))
    sql = f"SELECT i, {sql_fn()} AS v FROM vecs"
    s, d = rows_of(spark_df), duck_rows(con, sql)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


# -- dedup signature twins over adversarial text -----------------------------

from genai_batch_processor_spark.operators import dedup


_DEDUP_CASES = {
    "minhash_signature": (
        lambda c: F.array_join(
            F.transform(
                dedup.minhash_signature(dedup.shingle_hashes(c)),
                lambda x: x.cast("string"),
            ),
            "-",
        ),
        lambda e: (
            "array_to_string("
            + dedup.sql_minhash_signature(dedup.sql_shingle_hashes(e))
            + ", '-')"
        ),
    ),
    "simhash": (
        lambda c: dedup.simhash(c),
        lambda e: dedup.sql_simhash_from_hashes(
            dedup.sql_word_hashes(e)
        ),
    ),
    # the WIDE signature scheme (r8 verdict item 1): 56-bit majority
    # over 60-bit features — the exact expressions the adaptive
    # branches select past SIMHASH_WIDEN_DOCS, fuzz-pinned at fixture
    # scale so width-boundary behavior is engine-exact before any
    # corpus ever crosses the threshold
    "simhash_wide": (
        lambda c: dedup.simhash(c, dedup.SIMHASH_WIDE_BITS),
        lambda e: dedup.sql_simhash_from_hashes(
            dedup.sql_word_hashes(e, hash_bits=60),
            dedup.SIMHASH_WIDE_BITS,
        ),
    ),
}


@pytest.mark.parametrize("name", sorted(_DEDUP_CASES))
def test_dedup_signature_twins_agree(fuzz_data, name):
    from tests.util import duck_rows, rows_of

    sdf, con = fuzz_data
    fn, sql_fn = _DEDUP_CASES[name]
    spark_df = sdf.select("i", fn("text").alias("v"))
    sql = f"SELECT i, {sql_fn('text')} AS v FROM fuzz"
    s, d = rows_of(spark_df), duck_rows(con, sql)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_kmv_sketch_twin_on_adversarial_strings(fuzz_data):
    """The KMV cardinality sketch must replay identically over
    adversarial strings — hash collisions aside, the k-th minimum and
    the small-group exact path are both order-free."""
    from genai_batch_processor_spark.functions import sketches
    from tests.util import duck_rows, rows_of

    sdf, con = fuzz_data
    grouped = sdf.select((F.col("i") % 5).alias("g"), "text")
    spark_df = sketches.kmv_distinct(grouped, "g", "text")
    sql = sketches.sql_kmv_distinct(
        "SELECT i % 5 AS g, text FROM fuzz", "g", "text"
    )
    s, d = rows_of(spark_df), duck_rows(con, sql)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"kmv: first mismatches {mismatches[:3]}"


# -- levenshtein engine boundary (linkage oracle twin) -----------------------


def test_byte_levenshtein_twins_agree_on_any_text(spark):
    """The linkage scorer (functions/text.byte_levenshtein) must agree
    with DuckDB's native byte-level levenshtein for ANY text — ASCII
    (where it equals the classic codepoint distance) AND non-ASCII
    (the boundary the r7 verdict flagged, closed in r8 by
    re-interpreting UTF-8 bytes as ISO-8859-1 chars on the Spark
    side). Fuzzed over mixed-script strings."""
    import duckdb

    from genai_batch_processor_spark.functions import text as tx

    rng = random.Random(20260814)
    alpha = (
        string.ascii_lowercase + " -#0123456789" + "éñüçß世界日本語€–…"
    )
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        for _ in range(120)
    ]
    cases = [(words[i], words[-i - 1]) for i in range(60)] + [
        ("café", "cafe"),
        ("naïve", "naive"),
        ("日本語", "日本"),
        ("héllo", "hello"),
        ("kitten", "sitting"),
    ]
    sdf = spark.createDataFrame(cases, "a string, b string")
    s = [
        r.d
        for r in sdf.select(
            tx.byte_levenshtein("a", "b").alias("d")
        ).collect()
    ]
    con = duckdb.connect()
    d = [
        con.execute("SELECT levenshtein(?, ?)", list(c)).fetchone()[0]
        for c in cases
    ]
    con.close()
    assert s == d
    # and for pure ASCII the byte distance IS the classic distance
    ascii_cases = [c for c in cases if all(ord(ch) < 128 for ch in c[0] + c[1])]
    adf = spark.createDataFrame(ascii_cases, "a string, b string")
    classic = [
        r.d for r in adf.select(F.levenshtein("a", "b").alias("d")).collect()
    ]
    bytewise = [
        r.d
        for r in adf.select(
            tx.byte_levenshtein("a", "b").alias("d")
        ).collect()
    ]
    assert classic == bytewise


def test_blocked_pairs_non_ascii_parity(spark):
    """End-to-end linkage parity on a NON-ASCII catalog — the case the
    pre-r8 contract excluded: blocked_pairs vs its DuckDB twin over
    accented/multiscript names must produce the identical pair set and
    distances."""
    import duckdb

    from genai_batch_processor_spark.operators import linkage

    rows = [
        (1, "café royale", "B1"),
        (2, "cafe royale", "B1"),
        (3, "café royale!", "B1"),
        (4, "naïve brand", "B1"),
        (5, "naive brand", "B1"),
        (6, "日本語 widget", "B2"),
        (7, "日本 widget", "B2"),
        (8, "völlig anders", "B2"),
    ]
    df = spark.createDataFrame(rows, "k long, nm string, blk string")
    got = sorted(
        tuple(r)
        for r in linkage.blocked_pairs(
            df, "k", "nm", ["blk"], max_distance=3, max_block=10
        )
        .select("a_key", "b_key", "distance")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE cat AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({k}, '{nm}', '{blk}')" for k, nm, blk in rows
        )
        + ") t(k, nm, blk)"
    )
    want = sorted(
        con.execute(
            linkage.sql_blocked_pairs(
                "cat",
                "k",
                "nm",
                {"blk": "blk"},
                max_distance=3,
                max_block=10,
            )
            + " ORDER BY 1, 2"
        ).fetchall()
    )
    con.close()
    want = sorted((a, b, d) for a, b, _na, _nb, d in want)
    assert got == want and len(got) >= 3


def test_sqrt_power_twins_agree_for_temperature_weights(spark):
    """temperature_weights rounds power(n, 1/T)*scale to integers; the
    Spark and DuckDB float results must round identically across count
    magnitudes (fuzzed 1..1e12 with awkward near-half-integer cases)."""
    import duckdb

    rng = random.Random(20260815)
    ns = (
        [1, 2, 3, 10, 99, 10**6, 10**9, 10**12]
        + [rng.randint(1, 10**12) for _ in range(200)]
    )
    sdf = spark.createDataFrame([(n,) for n in ns], "n long")
    s = [
        r.w
        for r in sdf.select(
            F.round(F.pow(F.col("n").cast("double"), 0.5) * 1000)
            .cast("long")
            .alias("w")
        ).collect()
    ]
    con = duckdb.connect()
    d = [
        con.execute(
            "SELECT CAST(round(power(?::DOUBLE, 0.5) * 1000) AS BIGINT)",
            [n],
        ).fetchone()[0]
        for n in ns
    ]
    con.close()
    assert s == d
