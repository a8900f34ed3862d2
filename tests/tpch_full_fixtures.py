"""Augmented full-schema TPC-H fixtures for the reference's hive_tpch
golden queries.

The driver fixtures carry a column SUBSET (FIXTURES.md); the literal
TPC-H golden .sql files additionally reference partsupp and columns
like l_commitdate / c_phone / p_container.  This module derives those
missing columns DETERMINISTICALLY from the existing key columns (value
domains per the public TPC-H spec: ship modes, containers,
Manufacturer#N, country-code phones = 10 + nationkey) and generates
partsupp with dbgen's part->supplier assignment shape (4 suppliers per
part, spread across the supplier key space).  Output parquet is written
once to /tmp and registered identically in Spark and DuckDB, so the
goldens run as exact equivalence checks on byte-identical inputs.
"""

from __future__ import annotations

import os
from decimal import Decimal

import numpy as np

CACHE = "/tmp/spark_graft_tpch_full_v2"
SRC = "/root/testdata/sf0.001"

_SHIPMODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
_SHIPINSTRUCT = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
_CONTAINERS = [
    f"{a} {b}"
    for a in ("SM", "MED", "LG", "JUMBO", "WRAP")
    for b in ("CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM")
]
_COMMENT_WORDS = [
    "carefully", "quickly", "furiously", "final", "special", "pending",
    "requests", "accounts", "deposits", "instructions", "packages",
    "Customer", "Complaints", "ironic", "regular", "express",
]


def _comment(rng, n):
    """Deterministic comment strings over the spec's word pool — some
    rows hit the goldens' LIKE '%special%requests%' / '%Customer%
    Complaints%' patterns, most don't."""
    idx = rng.integers(0, len(_COMMENT_WORDS), (n, 4))
    return [" ".join(_COMMENT_WORDS[j] for j in row) for row in idx]


def _phone(nationkeys):
    return [
        f"{10 + int(nk)}-{100 + (int(nk) * 37) % 900}-"
        f"{100 + (int(nk) * 53) % 900}-{1000 + (int(nk) * 71) % 9000}"
        for nk in nationkeys
    ]


def _build() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(CACHE, exist_ok=True)

    def read(t):
        return pq.read_table(os.path.join(SRC, f"{t}.parquet"))

    # passthrough tables
    for t in ("nation", "region"):
        pq.write_table(read(t), os.path.join(CACHE, f"{t}.parquet"))

    # ---- lineitem ------------------------------------------------------
    li = read("lineitem")
    n = li.num_rows
    okey = li.column("l_orderkey").to_numpy()
    skey = li.column("l_suppkey").to_numpy()
    ship = li.column("l_shipdate").to_pandas()
    import pandas as pd

    commit = ship + pd.to_timedelta((okey % 61) - 30, unit="D")
    receipt = ship + pd.to_timedelta((skey % 30) + 1, unit="D")
    li = li.append_column("l_commitdate", pa.array(commit, li.schema.field("l_shipdate").type))
    li = li.append_column("l_receiptdate", pa.array(receipt, li.schema.field("l_shipdate").type))
    li = li.append_column(
        "l_shipmode", pa.array([_SHIPMODES[int(k) % 7] for k in okey + skey])
    )
    li = li.append_column(
        "l_shipinstruct", pa.array([_SHIPINSTRUCT[int(k) % 4] for k in okey])
    )
    pq.write_table(li, os.path.join(CACHE, "lineitem.parquet"))

    # ---- orders --------------------------------------------------------
    o = read("orders")
    rng = np.random.default_rng(201)
    okey = o.column("o_orderkey").to_numpy()
    o = o.append_column("o_shippriority", pa.array([0] * o.num_rows, pa.int32()))
    o = o.append_column("o_comment", pa.array(_comment(rng, o.num_rows)))
    o = o.append_column(
        "o_clerk", pa.array([f"Clerk#{int(k) % 1000:09d}" for k in okey])
    )
    pq.write_table(o, os.path.join(CACHE, "orders.parquet"))

    # ---- customer ------------------------------------------------------
    c = read("customer")
    rng = np.random.default_rng(202)
    nk = c.column("c_nationkey").to_numpy()
    ck = c.column("c_custkey").to_numpy()
    c = c.append_column(
        "c_address", pa.array([f"addr {int(k)}" for k in ck])
    )
    c = c.append_column("c_phone", pa.array(_phone(nk + ck % 7)))
    c = c.append_column("c_comment", pa.array(_comment(rng, c.num_rows)))
    pq.write_table(c, os.path.join(CACHE, "customer.parquet"))

    # ---- supplier ------------------------------------------------------
    s = read("supplier")
    rng = np.random.default_rng(203)
    nk = s.column("s_nationkey").to_numpy()
    sk = s.column("s_suppkey").to_numpy()
    s = s.append_column("s_address", pa.array([f"supp addr {int(k)}" for k in sk]))
    s = s.append_column("s_phone", pa.array(_phone(nk)))
    s = s.append_column("s_comment", pa.array(_comment(rng, s.num_rows)))
    pq.write_table(s, os.path.join(CACHE, "supplier.parquet"))

    # ---- part ----------------------------------------------------------
    p = read("part")
    pk = p.column("p_partkey").to_numpy()
    p = p.append_column(
        "p_mfgr", pa.array([f"Manufacturer#{int(k) % 5 + 1}" for k in pk])
    )
    p = p.append_column(
        "p_container", pa.array([_CONTAINERS[int(k) % len(_CONTAINERS)] for k in pk])
    )
    pq.write_table(p, os.path.join(CACHE, "part.parquet"))

    # ---- partsupp (generated; dbgen shape: 4 suppliers per part) -------
    n_supp = s.num_rows
    rows_pk, rows_sk, rows_qty, rows_cost = [], [], [], []
    for k in pk:
        k = int(k)
        for i in range(4):
            rows_pk.append(k)
            # spread the 4 suppliers across the key space with a stride
            # that guarantees distinctness (4 * max(1, S//4) <= S)
            rows_sk.append((k + i * max(1, n_supp // 4)) % n_supp + 1)
            rows_qty.append((k * 7 + i * 13) % 9999 + 1)
            rows_cost.append(Decimal((k * 31 + i * 97) % 100000 + 100) / 100)
    pq.write_table(
        pa.table(
            {
                "ps_partkey": pa.array(rows_pk, pa.int64()),
                "ps_suppkey": pa.array(rows_sk, pa.int64()),
                "ps_availqty": pa.array(rows_qty, pa.int32()),
                "ps_supplycost": pa.array(rows_cost, pa.decimal128(12, 2)),
                "ps_comment": _comment(np.random.default_rng(204), len(rows_pk)),
            }
        ),
        os.path.join(CACHE, "partsupp.parquet"),
    )


TABLES = ["nation", "region", "part", "supplier", "partsupp", "customer",
          "orders", "lineitem"]


def ensure_parquet() -> str:
    marker = os.path.join(CACHE, "_SUCCESS")
    if not os.path.exists(marker):
        _build()
        open(marker, "w").close()
    return CACHE


def register_spark(spark) -> None:
    d = ensure_parquet()
    for name in TABLES:
        spark.read.parquet(os.path.join(d, f"{name}.parquet")).createOrReplaceTempView(
            name
        )


def register_duckdb(con) -> None:
    d = ensure_parquet()
    for name in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{os.path.join(d, name + '.parquet')}'"
        )
