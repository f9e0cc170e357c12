"""Generate a TRUE sf1 fixture (10x sf0.1 by generation, not
replication) for the scaling run (round-4 verdict item 3).

BENCH_SCALE.json's 10x replication holds near-dup density constant BY
CONSTRUCTION (replica texts never cross-match); real data growth is
the stronger claim. This generator mirrors the driver fixture's
empirical distributions — measured from sf0.1, the only ground truth
available — with FRESH random draws:

- documents: the exact sf0.1 vocabulary (31 words — the small shingle
  space is what creates natural near-dup density) with per-doc word
  counts resampled from sf0.1's empirical length distribution and
  lang/source from its marginals;
- embeddings: iid gaussian unit vectors, dim 64, labels uniform 0..9
  (sf0.1 has no label-cluster structure and unit norms — verified);
- events: same 30-day window DENSIFIED 10x (the realistic shape of a
  bigger day), 10x users, uniform event types;
- TPC-H-ish tables at 10x keys: lines-per-order ~ Poisson(4) with
  zero-line orders absent (the measured sf0.1 shape), date ranges and
  value ranges as measured.

Row counts: lineitem ~6M, orders 1.5M, customer 150k, part 200k,
supplier 10k, events 1M, documents 50k, embeddings 20k. region/nation
are fixed-cardinality dims, copied as-is.

Usage: python tools/gen_sf1.py [out_dir]   (default /tmp/sf1_real)
Writes one single parquet file per table, matching the driver layout.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
SEED = 421
F = 10  # growth factor over sf0.1

N_CUSTOMER = 15_000 * F
N_SUPPLIER = 1_000 * F
N_PART = 20_000 * F
N_ORDERS = 150_000 * F
N_EVENTS = 100_000 * F
N_DOCS = 5_000 * F
N_VECS = 2_000 * F
N_NATIONS = 25

US_PER_DAY = 86_400_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows", file=sys.stderr)


def _ts_us(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def gen_documents(rng: np.random.Generator, n_docs: int) -> pa.Table:
    """The documents table at any row count, mirroring sf0.1's
    empirical distributions (vocabulary, per-doc lengths, lang/source
    marginals) with injected near-dup structure. Factored out so the
    sf10 tail run (round-7 verdict item 8) can generate documents-only
    at 100x without the full fixture."""
    src_docs = pq.read_table(f"{SRC}/documents.parquet")
    texts = src_docs.column("text").to_pylist()
    vocab = sorted({w for t in texts for w in t.split(" ")})
    wc = np.array([len(t.split(" ")) for t in texts])
    langs, lang_n = np.unique(
        np.asarray(src_docs.column("lang")), return_counts=True
    )
    lang_p = lang_n / lang_n.sum()
    sources = sorted(set(src_docs.column("source").to_pylist()))
    lens = rng.choice(wc, size=n_docs)
    varr = np.array(vocab)
    words = rng.integers(0, len(vocab), size=int(lens.sum()))
    doc_texts: list[str] = []
    pos = 0
    for n in lens:
        doc_texts.append(" ".join(varr[words[pos : pos + n]]))
        pos += n
    # Injected near-dup structure, calibrated to sf0.1: ~9.5% of its
    # docs sit in near-dup clusters (dedup_components: 477/5000) and 8
    # texts are exact copies — random draws from a 31-word vocabulary
    # produce neither at Jaccard >= threshold, so the fixture injects
    # them: ~9% of docs become light word-level mutations of an
    # earlier doc (a few percent of words replaced keeps shingle
    # Jaccard above threshold), ~0.2% exact copies.
    for i in range(n_docs):
        r = rng.random()
        if i == 0 or r >= 0.092:
            continue
        base = doc_texts[int(rng.integers(0, i))].split(" ")
        if r < 0.002:  # exact copy
            doc_texts[i] = " ".join(base)
            continue
        muts = rng.random(len(base)) < 0.03
        repl = rng.integers(0, len(vocab), size=int(muts.sum()))
        k = 0
        for j, m in enumerate(muts):
            if m:
                base[j] = varr[repl[k]]
                k += 1
        doc_texts[i] = " ".join(base)
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(doc_texts),
            "lang": pa.array(rng.choice(langs, size=n_docs, p=lang_p)),
            "source": pa.array(rng.choice(sources, size=n_docs)),
            "n_chars": pa.array(
                [len(t) for t in doc_texts], type=pa.int64()
            ),
        }
    )


def gen(out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)
    for t in ("region", "nation"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")

    # -- documents: sf0.1 vocabulary + empirical lengths/marginals ----
    _write(out_dir, "documents", gen_documents(rng, N_DOCS))

    # -- embeddings: iid unit vectors, labels uniform -----------------
    E = rng.standard_normal((N_VECS, 64)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    _write(
        out_dir,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), type=pa.int64()),
                "embedding": pa.array(
                    list(E), type=pa.list_(pa.float32())
                ),
                "label": pa.array(
                    rng.integers(0, 10, size=N_VECS), type=pa.int32()
                ),
            }
        ),
    )

    # -- events: same 30-day window, densified ------------------------
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = base + rng.integers(0, 30 * US_PER_DAY, size=N_EVENTS)
    ts.sort()  # driver fixture is time-ordered (event_id follows ts)
    _write(
        out_dir,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(N_EVENTS), type=pa.int64()),
                "ts": _ts_us(ts),
                "user_id": pa.array(
                    rng.integers(0, 1_500 * F, size=N_EVENTS),
                    type=pa.int64(),
                ),
                "event_type": pa.array(
                    rng.choice(
                        ["view", "click", "signup", "purchase", "error"],
                        size=N_EVENTS,
                    )
                ),
                "value": pa.array(
                    np.round(
                        np.minimum(rng.exponential(50.0, N_EVENTS), 999.0),
                        2,
                    )
                ),
                "props": pa.array(
                    [
                        '{"k": %d}' % k
                        for k in rng.integers(0, 100, size=N_EVENTS)
                    ]
                ),
            }
        ),
    )

    # -- customer / supplier / part -----------------------------------
    _write(
        out_dir,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(N_CUSTOMER), type=pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(N_CUSTOMER)]
                ),
                "c_nationkey": pa.array(
                    rng.integers(0, N_NATIONS, size=N_CUSTOMER),
                    type=pa.int32(),
                ),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, N_CUSTOMER), 2)
                ),
                "c_mktsegment": pa.array(
                    rng.choice(
                        ["AUTOMOBILE", "BUILDING", "FURNITURE",
                         "HOUSEHOLD", "MACHINERY"],
                        size=N_CUSTOMER,
                    )
                ),
            }
        ),
    )
    _write(
        out_dir,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(N_SUPPLIER), type=pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(N_SUPPLIER)]
                ),
                "s_nationkey": pa.array(
                    rng.integers(0, N_NATIONS, size=N_SUPPLIER),
                    type=pa.int32(),
                ),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, N_SUPPLIER), 2)
                ),
            }
        ),
    )
    src_part = pq.read_table(f"{SRC}/part.parquet")
    name_words = sorted(
        {w for n in src_part.column("p_name").to_pylist() for w in n.split()}
    )
    p_types = sorted(set(src_part.column("p_type").to_pylist()))
    adjs = rng.choice(name_words, size=N_PART)
    nouns = rng.choice(name_words, size=N_PART)
    _write(
        out_dir,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(N_PART), type=pa.int64()),
                "p_name": pa.array(
                    [f"{a} {b}" for a, b in zip(adjs, nouns)]
                ),
                "p_brand": pa.array(
                    [
                        f"Brand#{k}"
                        for k in rng.integers(1, 26, size=N_PART)
                    ]
                ),
                "p_type": pa.array(rng.choice(p_types, size=N_PART)),
                "p_size": pa.array(
                    rng.integers(1, 51, size=N_PART), type=pa.int32()
                ),
                "p_retailprice": pa.array(
                    np.round(rng.uniform(900.0, 1000.0, N_PART), 1)
                ),
            }
        ),
    )

    # -- orders / lineitem --------------------------------------------
    o_min = np.datetime64("1995-01-01", "us").astype(np.int64)
    o_max = np.datetime64("2001-08-01", "us").astype(np.int64)
    o_days = (o_max - o_min) // US_PER_DAY
    odate = o_min + rng.integers(0, o_days + 1, size=N_ORDERS) * US_PER_DAY
    _write(
        out_dir,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(N_ORDERS), type=pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, N_CUSTOMER, size=N_ORDERS),
                    type=pa.int64(),
                ),
                "o_orderstatus": pa.array(
                    rng.choice(["F", "O", "P"], size=N_ORDERS)
                ),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1000.0, 500000.0, N_ORDERS), 2)
                ),
                "o_orderdate": _ts_us(odate),
                "o_orderpriority": pa.array(
                    rng.choice(
                        ["1-URGENT", "2-HIGH", "3-MEDIUM",
                         "4-NOT SPECIFIED", "5-LOW"],
                        size=N_ORDERS,
                    )
                ),
            }
        ),
    )
    # Poisson(4) lines per order; orders drawing 0 simply have no
    # lineitem rows — sf0.1 measures exactly this shape (2,764 of its
    # 150k orders have no lines, matching Poisson(4)'s P(0)=1.8%).
    nlines = rng.poisson(4.0, size=N_ORDERS)
    okeys = np.repeat(np.arange(N_ORDERS, dtype=np.int64), nlines)
    n_li = len(okeys)
    # l_linenumber is RANDOM in [1,7], not a per-order cycle: sf0.1
    # has 118k duplicate (orderkey, linenumber) pairs in 600k rows —
    # (orderkey, linenumber) is NOT a key in the driver fixture, and a
    # cycling assignment would under-produce that collision density
    # 10x at this scale.
    linenum = rng.integers(1, 8, size=n_li)
    qty = rng.integers(1, 51, size=n_li).astype(np.float64)
    ship = (
        np.repeat(odate, nlines)
        + rng.integers(1, 96, size=n_li) * US_PER_DAY
    )
    _write(
        out_dir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(okeys),
                "l_partkey": pa.array(
                    rng.integers(0, N_PART, size=n_li), type=pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, N_SUPPLIER, size=n_li),
                    type=pa.int64(),
                ),
                "l_linenumber": pa.array(linenum, type=pa.int32()),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(
                    np.round(qty * rng.uniform(900.0, 2100.0, n_li), 2)
                ),
                "l_discount": pa.array(
                    np.round(rng.uniform(0.0, 0.10, n_li), 2)
                ),
                "l_tax": pa.array(
                    np.round(rng.uniform(0.0, 0.08, n_li), 2)
                ),
                "l_returnflag": pa.array(
                    rng.choice(["A", "N", "R"], size=n_li)
                ),
                "l_linestatus": pa.array(
                    rng.choice(["F", "O"], size=n_li)
                ),
                "l_shipdate": _ts_us(ship),
            }
        ),
    )


if __name__ == "__main__":
    from tools._args import positional

    args = positional(usage="usage: gen_sf1.py [out_dir]")
    out = args[0] if args else "/tmp/sf1_real"
    gen(out)
    print(f"sf1 fixture written to {out}", file=sys.stderr)
