"""Deterministic testdata generator — scale-up replica of the driver's
synthetic tables (TESTDATA.md) for local scale-proofing at sf >= 1.

The driver ships sf0.001/0.01/0.1 read-only under /root/testdata; this
script reproduces the same schemas, value distributions, and id
structure (verified against the shipped parquet: column types, value
ranges, category sets, planted duplicate documents, unit-norm clustered
embeddings, micros timestamps) at any scale factor, so bench.py and
tools/check_correctness.py can run at sf1..sf100 without touching the
driver's directories.

    python tools/gen_testdata.py --sf 1 --out .testdata/sf1
    python tools/gen_testdata.py --sf 100 --out .testdata/sf100 \
        --tables documents,embeddings

Row counts scale linearly like the driver's:
  customer 150k*sf, supplier 10k*sf, part 200k*sf, orders 1.5M*sf,
  lineitem 6M*sf, events 1M*sf (users 15k*sf),
  documents max(500, 50k*sf), embeddings max(500, 20k*sf).

Every table draws from its own child RNG seeded by (seed, table), so a
`--tables` subset is byte-identical to the same tables from a full run
— partial directories (e.g. documents-only at sf100 for the text/dedup
family) stay consistent if later widened. Large tables are generated
and written in fixed-size chunks through one ParquetWriter, bounding
peak memory at any sf (sf100 lineitem is 600M rows).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()

# Pseudo-word syllables for the Heaps-law vocabulary tail (below).
_SYL = (
    "ka ri mo ta lu ne so vi pe da chu ge my ze bo fa qua len tor wis"
).split()

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _rng(seed: int, table: str) -> np.random.Generator:
    """Child RNG for one table: seeded by (seed, table index) so any
    --tables subset reproduces exactly the full run's bytes."""
    return np.random.default_rng([seed, TABLES.index(table)])


def _tail_word(i: int) -> str:
    """Deterministic pseudo-word #i: base-20 digits -> syllables,
    padded to >= 2 syllables so lengths (4..8 chars) resemble the
    head vocabulary's."""
    digits = []
    while i:
        digits.append(i % 20)
        i //= 20
    while len(digits) < 2:
        digits.append(0)
    return "".join(_SYL[d] for d in reversed(digits))


def _doc_vocab(n_doc: int) -> tuple[np.ndarray, np.ndarray]:
    """Vocabulary + Zipf rank probabilities, sized for the corpus.

    Real corpora grow vocabulary with size (Heaps' law, V ~ K * N^0.5
    in total tokens); the original fixed 31-word VOCAB made shingle
    frequencies collapse as n grew, so large-sf dedup scale curves
    measured the generator's closed-vocabulary geometry rather than
    the operators (round-6 verdict #1). Here V doubles per ~4x docs —
    V = 31 * sqrt(n_doc / 500) — anchored so the sf0.01-equivalent
    corpus (500 docs) keeps exactly the driver's 31 words, and word
    frequencies follow a Zipf-Mandelbrot rank law (p ~ 1/(r+2.7)^1.05,
    the standard English fit — a pure Zipf over a small vocabulary
    puts ~20% of all tokens on rank 1; with the q=2.7 shift the head
    lands at the ~7% a real "the" carries) with the original head
    words as the top ranks.
    """
    v = max(len(VOCAB), int(round(len(VOCAB) * (n_doc / 500.0) ** 0.5)))
    words, seen, i = list(VOCAB), set(VOCAB), 0
    while len(words) < v:  # skip syllable combos that spell a head word
        w = _tail_word(i)
        i += 1
        if w not in seen:
            seen.add(w)
            words.append(w)
    ranks = np.arange(1, v + 1, dtype="float64")
    p = (ranks + 2.7) ** -1.05
    p /= p.sum()
    return np.array(words), p


LANGS = ["en", "fr", "es", "de", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["small", "cold", "blue", "old", "red", "new", "large", "hot"]
NOUN = ["gizmo", "widget", "anvil", "ring", "gear", "bolt", "plate", "rod"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 86_400_000_000
CHUNK = 2_000_000  # rows per generation/write chunk for the big tables


def _ts_us(base: str) -> int:
    return int(np.datetime64(base, "us").astype("int64"))


ORDERS_EPOCH = _ts_us("1995-01-01")
ORDERS_DAYS = 2404  # .. 2001-08-01
SHIP_EPOCH = _ts_us("1995-01-02")
SHIP_DAYS = 2498  # .. 2001-11-04
EVENTS_EPOCH = _ts_us("2024-01-01")
EVENTS_SPAN_US = 30 * DAY_US  # .. 2024-01-31


def _write(out: str, name: str, table: pa.Table) -> None:
    # 64k-row groups: a single parquet file is then splittable into
    # many scan tasks, emulating the many-file layout a real cluster
    # reads (1M-row groups made every small table a 1-task scan).
    pq.write_table(
        table, os.path.join(out, f"{name}.parquet"),
        row_group_size=65_536, compression="snappy",
    )
    print(f"  {name}: {table.num_rows} rows")


def _write_chunked(out: str, name: str, n: int, make_chunk) -> None:
    """Stream a big table to parquet in CHUNK-row slices.

    make_chunk(lo, hi) -> pa.Table for rows [lo, hi). Chunks draw from
    the table RNG sequentially, so the produced file depends only on
    (seed, sf) — the fixed CHUNK constant keeps boundaries stable.
    """
    path = os.path.join(out, f"{name}.parquet")
    writer = None
    try:
        for lo in range(0, n, CHUNK):
            hi = min(lo + CHUNK, n)
            t = make_chunk(lo, hi)
            if writer is None:
                writer = pq.ParquetWriter(
                    path, t.schema, compression="snappy"
                )
            writer.write_table(t, row_group_size=65_536)
    finally:
        if writer is not None:
            writer.close()
    print(f"  {name}: {n} rows")


def _ts_col(micros: np.ndarray) -> pa.Array:
    return pa.array(micros, type=pa.timestamp("us"))


def gen_region(out: str, sf: float, seed: int) -> None:
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))


def gen_nation(out: str, sf: float, seed: int) -> None:
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))


def gen_customer(out: str, sf: float, seed: int) -> None:
    n = int(150_000 * sf)
    rng = _rng(seed, "customer")

    def chunk(lo: int, hi: int) -> pa.Table:
        k = hi - lo
        return pa.table({
            "c_custkey": pa.array(np.arange(lo, hi), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(lo, hi)],
            "c_nationkey": pa.array(rng.integers(0, 25, k), pa.int32()),
            "c_acctbal": np.round(rng.uniform(-1000, 10_000, k), 2),
            "c_mktsegment": pa.array(
                np.array(SEGMENTS)[rng.integers(0, 5, k)]
            ),
        })

    _write_chunked(out, "customer", n, chunk)


def gen_supplier(out: str, sf: float, seed: int) -> None:
    n = int(10_000 * sf)
    rng = _rng(seed, "supplier")

    def chunk(lo: int, hi: int) -> pa.Table:
        k = hi - lo
        return pa.table({
            "s_suppkey": pa.array(np.arange(lo, hi), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(lo, hi)],
            "s_nationkey": pa.array(rng.integers(0, 25, k), pa.int32()),
            "s_acctbal": np.round(rng.uniform(-1000, 10_000, k), 2),
        })

    _write_chunked(out, "supplier", n, chunk)


def gen_part(out: str, sf: float, seed: int) -> None:
    n = int(200_000 * sf)
    rng = _rng(seed, "part")

    def chunk(lo: int, hi: int) -> pa.Table:
        k = hi - lo
        return pa.table({
            "p_partkey": pa.array(np.arange(lo, hi), pa.int64()),
            "p_name": pa.array([
                f"{ADJ[a]} {NOUN[b]}"
                for a, b in zip(
                    rng.integers(0, 8, k), rng.integers(0, 8, k)
                )
            ]),
            "p_brand": pa.array(
                [f"Brand#{b}" for b in rng.integers(0, 25, k)]
            ),
            "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, k)]),
            "p_size": pa.array(rng.integers(1, 51, k), pa.int32()),
            "p_retailprice": np.round(
                900.0 + np.arange(lo, hi) * 0.1, 2
            ),
        })

    _write_chunked(out, "part", n, chunk)


def gen_orders(out: str, sf: float, seed: int) -> None:
    n = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    rng = _rng(seed, "orders")

    def chunk(lo: int, hi: int) -> pa.Table:
        k = hi - lo
        return pa.table({
            "o_orderkey": pa.array(np.arange(lo, hi), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, k), pa.int64()),
            "o_orderstatus": pa.array(
                np.array(["P", "O", "F"])[rng.integers(0, 3, k)]
            ),
            "o_totalprice": np.round(rng.uniform(1000, 500_000, k), 2),
            "o_orderdate": _ts_col(
                ORDERS_EPOCH
                + rng.integers(0, ORDERS_DAYS + 1, k) * DAY_US
            ),
            "o_orderpriority": pa.array(
                np.array(PRIORITIES)[rng.integers(0, 5, k)]
            ),
        })

    _write_chunked(out, "orders", n, chunk)


def gen_lineitem(out: str, sf: float, seed: int) -> None:
    n = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    rng = _rng(seed, "lineitem")

    def chunk(lo: int, hi: int) -> pa.Table:
        k = hi - lo
        return pa.table({
            "l_orderkey": pa.array(rng.integers(0, n_ord, k), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, k), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, k), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, k), pa.int32()),
            "l_quantity": rng.integers(1, 51, k).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, k), 2),
            "l_discount": np.round(rng.integers(0, 11, k) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, k) * 0.01, 2),
            "l_returnflag": pa.array(
                np.array(["R", "A", "N"])[rng.integers(0, 3, k)]
            ),
            "l_linestatus": pa.array(
                np.array(["O", "F"])[rng.integers(0, 2, k)]
            ),
            "l_shipdate": _ts_col(
                SHIP_EPOCH + rng.integers(0, SHIP_DAYS + 1, k) * DAY_US
            ),
        })

    _write_chunked(out, "lineitem", n, chunk)


def gen_events(out: str, sf: float, seed: int) -> None:
    n = int(1_000_000 * sf)
    n_user = int(15_000 * sf)
    rng = _rng(seed, "events")
    # The global sort on ts needs the whole column; one int64 array is
    # 800 MB even at sf100 — fine. The remaining columns chunk.
    evt_ts = np.sort(rng.integers(0, EVENTS_SPAN_US, n) + EVENTS_EPOCH)

    def chunk(lo: int, hi: int) -> pa.Table:
        k = hi - lo
        return pa.table({
            "event_id": pa.array(np.arange(lo, hi), pa.int64()),
            "ts": _ts_col(evt_ts[lo:hi]),
            "user_id": pa.array(rng.integers(0, n_user, k), pa.int64()),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[rng.integers(0, 5, k)]
            ),
            "value": np.round(rng.exponential(50.0, k), 2),
            "props": pa.array(
                [f'{{"k": {v}}}' for v in rng.integers(0, 100, k)]
            ),
        })

    _write_chunked(out, "events", n, chunk)


def gen_documents(out: str, sf: float, seed: int) -> None:
    """Documents: space-joined Zipf-sampled words from a Heaps-law-sized
    vocabulary (see _doc_vocab), 10..100 words; ~0.2% planted exact
    duplicates of an earlier doc (the dedup operators' prey).

    Duplicate donors are drawn only from the doc's own chunk-or-earlier
    rows, all of which are already materialized when the dup is planted
    — so chunked generation preserves the plant exactly.
    """
    n_doc = max(500, int(50_000 * sf))
    rng = _rng(seed, "documents")
    n_words = rng.integers(10, 101, n_doc)
    vocab, word_p = _doc_vocab(n_doc)
    offsets = np.concatenate([[0], np.cumsum(n_words)])
    dup_idx = rng.random(n_doc) < 0.002
    langs = np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]
    src = rng.integers(0, 20, n_doc)

    path = os.path.join(out, "documents.parquet")
    writer = None
    texts: list[str] = []  # full history — dup donors reach back to 0
    gen_chunk = 100_000  # docs per sampling chunk (bounds index memory)
    try:
        for lo in range(0, n_doc, gen_chunk):
            hi = min(lo + gen_chunk, n_doc)
            idx = rng.choice(
                len(vocab), offsets[hi] - offsets[lo], p=word_p
            )
            base = offsets[lo]
            for i in range(lo, hi):
                texts.append(" ".join(
                    vocab[idx[offsets[i] - base:offsets[i + 1] - base]]
                ))
            for i in np.flatnonzero(dup_idx[lo:hi]) + lo:
                if i > 0:
                    texts[i] = texts[rng.integers(0, i)]
            t = pa.table({
                "doc_id": pa.array(np.arange(lo, hi), pa.int64()),
                "text": texts[lo:hi],
                "lang": pa.array(langs[lo:hi]),
                "source": pa.array([f"src{s}" for s in src[lo:hi]]),
                "n_chars": pa.array(
                    [len(t_) for t_ in texts[lo:hi]], pa.int64()
                ),
            })
            if writer is None:
                writer = pq.ParquetWriter(
                    path, t.schema, compression="snappy"
                )
            writer.write_table(t, row_group_size=65_536)
    finally:
        if writer is not None:
            writer.close()
    print(f"  documents: {n_doc} rows (vocab={len(vocab)})")


def gen_embeddings(out: str, sf: float, seed: int) -> None:
    n_emb = max(500, int(20_000 * sf))
    rng = _rng(seed, "embeddings")
    dim, n_lab = 64, 10
    cents = rng.standard_normal((n_lab, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    path = os.path.join(out, "embeddings.parquet")
    writer = None
    try:
        for lo in range(0, n_emb, CHUNK):
            hi = min(lo + CHUNK, n_emb)
            labels = rng.integers(0, n_lab, hi - lo)
            vecs = cents[labels] * 2.0 + rng.standard_normal(
                (hi - lo, dim)
            )
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            t = pa.table({
                "vec_id": pa.array(np.arange(lo, hi), pa.int64()),
                "embedding": pa.array(
                    list(vecs.astype("float32")), pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            })
            if writer is None:
                writer = pq.ParquetWriter(
                    path, t.schema, compression="snappy"
                )
            writer.write_table(t, row_group_size=65_536)
    finally:
        if writer is not None:
            writer.close()
    print(f"  embeddings: {n_emb} rows")


_GEN = {
    "region": gen_region,
    "nation": gen_nation,
    "customer": gen_customer,
    "supplier": gen_supplier,
    "part": gen_part,
    "orders": gen_orders,
    "lineitem": gen_lineitem,
    "events": gen_events,
    "documents": gen_documents,
    "embeddings": gen_embeddings,
}


def gen(sf: float, out: str, seed: int = 42,
        tables: list[str] | None = None) -> None:
    os.makedirs(out, exist_ok=True)
    for name in tables or TABLES:
        _GEN[name](out, sf, seed)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--tables", default=None,
        help="comma list (default: all of %s)" % ",".join(TABLES),
    )
    a = ap.parse_args()
    tabs = [t.strip() for t in a.tables.split(",")] if a.tables else None
    print(f"generating sf={a.sf} -> {a.out} tables={tabs or 'all'}")
    gen(a.sf, a.out, a.seed, tabs)
