"""Generate a GROWN sf1.0 fixture: scaled cardinality, not replicated rows.

Round-8 judge directive #2: the 10x strict-correctness subset ran on
``sf0.1`` replicated x10, which multiplies row VOLUME but not key
CARDINALITY — first-seen logic, dimension-frame size contracts, per-key
group counts, and vocabulary tails were untested above sf0.1's key
space.  This generator produces a schema-compatible sf1.0 fixture
(seed 42, deterministic) whose cardinalities GROW the way the driver's
own fixtures grow from sf0.001 -> sf0.1, plus the axes the replication
could not exercise:

  table       sf0.1 (driver)          sf1.0 (this script)
  customer    15,000                  150,000
  supplier    1,000                   10,000
  part        20,000 / 25 brands      200,000 / 40 brands
  orders      150,000                 1,500,000
  lineitem    600,000                 6,000,000
  events      100,000 / 1,500 users   1,000,000 / 15,000 users / 90 days
              / 30 days               (+ one 5%-of-events "bot" user)
  documents   5,000 / 20 sources      50,000 / 100 sources / 8 langs
              / 31-word vocab         / ~30,000-word Zipf vocab
  embeddings  2,000 / 10 labels       20,000 / 25 labels (clustered)

Schema parity is exact (column names, logical types, timestamp unit
micros — the loader's native branch; DuckDB reads the same files), so
every registered query and oracle runs unchanged:

    python tools/gen_sf1_grown.py           # writes .bench_scale/sf1.0_grown
    python tools/check_oracle.py --strict .bench_scale/sf1.0_grown [query..]

The fixture lives under .bench_scale/ (gitignored); this script IS the
committed artifact — rerunning it reproduces the fixture byte-for-byte.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_scale",
    "sf1.0_grown",
)

N_CUSTOMER = 150_000
N_SUPPLIER = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_LINEITEM = 6_000_000
N_EVENTS = 1_000_000
N_USERS = 15_000
N_EVENT_DAYS = 90
N_DOCS = 50_000
N_SOURCES = 100
N_EMB = 20_000
N_LABELS = 25
DIM = 64

_SPARK_WORDS = (
    "key agg row scan slow fast table value part hash merge batch window "
    "spark order data column join small line customer query a the filter "
    "group sort read write plan stage"
).split()
_LANGS = ["en", "de", "fr", "es", "zh", "pt", "ja", "ru"]
_LANG_W = [0.40, 0.10, 0.10, 0.10, 0.10, 0.07, 0.07, 0.06]


def _write(name: str, table: pa.Table) -> None:
    path = os.path.join(OUT, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _ts_us(days_ns: np.ndarray) -> pa.Array:
    return pa.array(days_ns.astype("datetime64[us]"), type=pa.timestamp("us"))


def main() -> None:
    rng = np.random.default_rng(42)
    os.makedirs(OUT, exist_ok=True)

    # --- region / nation (fixed dims, identical to the driver's) -----
    _write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
            }
        ),
    )
    _write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )

    # --- customer ----------------------------------------------------
    _write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(N_CUSTOMER), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(N_CUSTOMER)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, N_CUSTOMER), pa.int32()
                ),
                "c_acctbal": np.round(
                    rng.uniform(-999.99, 9999.99, N_CUSTOMER), 2
                ),
                "c_mktsegment": np.array(
                    ["AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE",
                     "MACHINERY"]
                )[rng.integers(0, 5, N_CUSTOMER)],
            }
        ),
    )

    # --- supplier ----------------------------------------------------
    _write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(N_SUPPLIER), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPPLIER)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, N_SUPPLIER), pa.int32()
                ),
                "s_acctbal": np.round(
                    rng.uniform(-999.99, 9999.99, N_SUPPLIER), 2
                ),
            }
        ),
    )

    # --- part (brand cardinality grown 25 -> 40) ---------------------
    adjs = np.array(["small", "red", "blue", "green", "large", "shiny",
                     "matte", "round"])
    nouns = np.array(["ring", "widget", "bolt", "gear", "cog", "plate",
                      "tube", "disk"])
    _write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(N_PART), pa.int64()),
                "p_name": np.char.add(
                    np.char.add(adjs[rng.integers(0, 8, N_PART)], " "),
                    nouns[rng.integers(0, 8, N_PART)],
                ),
                "p_brand": np.array(
                    [f"Brand#{b}" for b in range(1, 41)]
                )[rng.integers(0, 40, N_PART)],
                "p_type": np.array(
                    ["STANDARD", "LARGE", "SMALL", "ECONOMY", "MEDIUM",
                     "PROMO"]
                )[rng.integers(0, 6, N_PART)],
                "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
                "p_retailprice": np.round(
                    900.0 + 0.1 * np.arange(N_PART), 2
                ),
            }
        ),
    )

    # --- orders ------------------------------------------------------
    o_days = rng.integers(0, 2404, N_ORDERS)  # 1995-01-01 .. 2001-08-01
    o_dates = (
        np.datetime64("1995-01-01") + o_days.astype("timedelta64[D]")
    ).astype("datetime64[us]")
    _write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, N_CUSTOMER, N_ORDERS), pa.int64()
                ),
                "o_orderstatus": np.array(["F", "O", "P"])[
                    rng.choice(3, N_ORDERS, p=[0.49, 0.49, 0.02])
                ],
                "o_totalprice": np.round(
                    rng.uniform(1000.0, 500_000.0, N_ORDERS), 2
                ),
                "o_orderdate": pa.array(o_dates, pa.timestamp("us")),
                "o_orderpriority": np.array(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                     "5-LOW"]
                )[rng.integers(0, 5, N_ORDERS)],
            }
        ),
    )

    # --- lineitem ----------------------------------------------------
    l_orderkey = np.sort(rng.integers(0, N_ORDERS, N_LINEITEM))
    # line numbers: position within the order (1-based)
    is_new = np.empty(N_LINEITEM, dtype=bool)
    is_new[0] = True
    is_new[1:] = l_orderkey[1:] != l_orderkey[:-1]
    grp_start = np.maximum.accumulate(
        np.where(is_new, np.arange(N_LINEITEM), 0)
    )
    l_linenumber = (np.arange(N_LINEITEM) - grp_start + 1).astype(np.int32)
    qty = rng.integers(1, 51, N_LINEITEM).astype(np.float64)
    price_per = np.round(rng.uniform(900.0, 2100.0, N_LINEITEM), 2)
    ship_days = rng.integers(1, 122, N_LINEITEM)
    l_ship = (
        np.datetime64("1995-01-01")
        + (o_days[l_orderkey] + ship_days).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    _write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(l_orderkey, pa.int64()),
                "l_partkey": pa.array(
                    rng.integers(0, N_PART, N_LINEITEM), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, N_SUPPLIER, N_LINEITEM), pa.int64()
                ),
                "l_linenumber": pa.array(l_linenumber, pa.int32()),
                "l_quantity": qty,
                "l_extendedprice": np.round(qty * price_per, 2),
                "l_discount": np.round(
                    rng.integers(0, 11, N_LINEITEM) / 100.0, 2
                ),
                "l_tax": np.round(
                    rng.integers(0, 9, N_LINEITEM) / 100.0, 2
                ),
                "l_returnflag": np.array(["A", "N", "R"])[
                    rng.integers(0, 3, N_LINEITEM)
                ],
                "l_linestatus": np.array(["O", "F"])[
                    rng.integers(0, 2, N_LINEITEM)
                ],
                "l_shipdate": pa.array(l_ship, pa.timestamp("us")),
            }
        ),
    )

    # --- events (users 1.5k -> 15k, days 30 -> 90, one bot user) -----
    span_us = N_EVENT_DAYS * 86_400_000_000
    ts_us = np.sort(rng.integers(0, span_us, N_EVENTS))
    ts = (
        np.datetime64("2024-01-01T00:00:00", "us")
        + ts_us.astype("timedelta64[us]")
    )
    users = rng.integers(0, N_USERS, N_EVENTS)
    bot = rng.random(N_EVENTS) < 0.05  # user 0 = bot: per-key skew stress
    users[bot] = 0
    _write(
        "events",
        pa.table(
            {
                "event_id": pa.array(range(N_EVENTS), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
                "event_type": np.array(
                    ["click", "view", "purchase", "signup", "error"]
                )[rng.integers(0, 5, N_EVENTS)],
                "value": np.round(
                    np.clip(rng.exponential(50.0, N_EVENTS), 0.01, 500.0), 2
                ),
                "props": [
                    '{"k": %d}' % k for k in rng.integers(0, 100, N_EVENTS)
                ],
            }
        ),
    )

    # --- documents (vocab 31 -> 30,031 Zipf words, sources 20 -> 100) -
    vocab = np.array(
        _SPARK_WORDS + [f"w{i:05d}" for i in range(1, 30_001)]
    )
    w = 1.0 / np.arange(1, len(vocab) + 1)  # Zipf weights over the list
    w /= w.sum()
    n_tok = rng.integers(8, 101, N_DOCS)
    tok_ids = rng.choice(len(vocab), size=int(n_tok.sum()), p=w)
    texts = []
    pos = 0
    for k in n_tok:
        texts.append(" ".join(vocab[tok_ids[pos:pos + k]]) + " ")
        pos += k
    _write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), pa.int64()),
                "text": texts,
                "lang": np.array(_LANGS)[
                    rng.choice(len(_LANGS), N_DOCS, p=_LANG_W)
                ],
                "source": np.array(
                    [f"src{i}" for i in range(N_SOURCES)]
                )[rng.integers(0, N_SOURCES, N_DOCS)],
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
    )

    # --- embeddings (labels 10 -> 25, genuine cluster structure) -----
    labels = rng.integers(0, N_LABELS, N_EMB).astype(np.int32)
    cents = rng.normal(0.0, 0.12, (N_LABELS, DIM))
    emb = (
        cents[labels] + rng.normal(0.0, 0.10, (N_EMB, DIM))
    ).astype(np.float32)
    _write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(N_EMB), pa.int64()),
                "embedding": pa.array(
                    list(emb), pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
    )

    with open(os.path.join(OUT, "_MANIFEST.json"), "w") as f:
        json.dump(
            {
                "seed": 42,
                "generator": "tools/gen_sf1_grown.py",
                "rows": {
                    "customer": N_CUSTOMER, "supplier": N_SUPPLIER,
                    "part": N_PART, "orders": N_ORDERS,
                    "lineitem": N_LINEITEM, "events": N_EVENTS,
                    "documents": N_DOCS, "embeddings": N_EMB,
                },
                "grown_axes": {
                    "users": N_USERS, "event_days": N_EVENT_DAYS,
                    "doc_sources": N_SOURCES, "vocab": int(len(vocab)),
                    "embedding_labels": N_LABELS, "part_brands": 40,
                },
            },
            f,
            indent=1,
        )
    print("done:", OUT)


if __name__ == "__main__":
    sys.exit(main())
