#!/usr/bin/env python
"""sf1 strict hash-parity spot-check (r10 verdict item 5).

The driver ships testdata up to sf0.1 (TESTDATA.md); this synthesizes a
10× "sf1" in /tmp by FK-CONSISTENT REPLICATION of sf0.1 — copy i of a
row remaps every key k (PKs and the FKs that reference them) to
``k*10+i``, so joins land on copy-local parents, uniqueness is
preserved without computing maxes, and every value distribution is the
original one repeated. Dimension tables (region, nation) are kept
as-is; fact/entity tables scale 10×:

- relational: customer, supplier, part, orders, lineitem (6M rows),
  events (1M rows);
- documents: ``text || ' copyN'`` per replica — replicas stay NEAR-dups
  of each other (the suffix perturbs 1–2 trailing shingles), which is
  the ADVERSARIAL corpus for the banded dedup path (~10× denser
  near-dup relations than the organic corpus);
- embeddings: exact vector replicas — massive cosine ties, which is the
  adversarial case for every top-k tiebreaker.

Then runs tools/driver_sim.py (strict value-hash vs DuckDB) over the
heaviest oracle-paired keys plus the r11-new pair. This checks hash
PARITY at 10× bench scale — not throughput (bench.py owns that) and
not the driver generator's exact distributions (only the driver can
make those).

Usage: python tools/sf1_spotcheck.py [query ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SDT_SF1_DIR", "/tmp/sdt_sf1")

DEFAULT_KEYS = [
    "revenue_by_nation",
    "market_share",
    "topk_per_group",
    "text_tfidf_top",
    "sim_search",
    "dedup_incremental",
    "embedding_index_refresh",
    # r12-new pair: the persisted-index loop under max cosine ties
    # (exact vector replicas) and the bigram LM under 10× denser
    # repeated-text mass
    "sim_search_index",
    "text_ngram_lm_score",
]

# key columns remapped to k*10+i per replica (PK and every FK to it)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def build(con: duckdb.DuckDBPyConnection) -> None:
    os.makedirs(OUT, exist_ok=True)
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in KEYED.items():
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} * 10 + i AS {c}")
            elif t == "documents" and c == "text":
                sel.append("text || ' copy' || CAST(i AS VARCHAR) AS text")
            elif t == "documents" and c == "n_chars":
                sel.append("length(text || ' copy' || CAST(i AS VARCHAR)) AS n_chars")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet', "
            f"generate_series(0, 9) AS g(i)) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    n = con.execute(f"SELECT count(*) FROM '{OUT}/lineitem.parquet'").fetchone()[0]
    print(f"built {OUT}: lineitem rows = {n}", file=sys.stderr)


def main() -> None:
    keys = sys.argv[1:] or DEFAULT_KEYS
    con = duckdb.connect()
    build(con)
    rc = subprocess.call(
        [sys.executable, os.path.join(_REPO, "tools", "driver_sim.py"), *keys],
        env=dict(os.environ, SPARK_GRAFT_SF_DIR=OUT),
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
