#!/usr/bin/env python3
"""Scale-up generator for the empirical scaling probe (SCALING.md): build
an sf1-sized corpus as K=10 key-shifted shards of the real sf0.1 data, so
every distribution (value ranges, group sizes, per-key degrees, text
shapes) is EXACTLY the sf0.1 one while every table cardinality grows 10x.

Key offsets make the shards disjoint in every join key — the shard model
of corpus growth: a 10x bigger corpus has 10x more customers/orders/parts
with the SAME local structure, which is the honest 100 TB model (local
density constant, volume growing) and the regime the roster's sparsity
budgets assume. Cross-shard structure is deliberately absent; an operator
whose cost grows with GLOBAL density is governed by the sparsity gauges,
not this probe.

documents scale 10x and get a per-shard text prefix (shard 0 pristine) so
the dedup families see realistic near-dup growth instead of a degenerate
10-way exact-duplication of the whole corpus; embeddings scale 4x
(mirroring the driver's own sf0.01 -> sf0.1 ratio) with vec_id offsets.

Usage: python3 tools/gen_scale.py [--src /root/testdata/sf0.1]
                                  [--out target/scale/sf1] [--copies 10]
"""
import argparse
from pathlib import Path

import duckdb

OFF = {"order": 10_000_000, "cust": 1_000_000, "part": 100_000,
       "supp": 10_000, "event": 10_000_000, "doc": 1_000_000,
       "vec": 1_000_000, "user": 1_000}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="target/scale/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    src, out, k = Path(args.src), Path(args.out), args.copies
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    def rep(table, select_i, copies):
        sql = " UNION ALL ".join(
            select_i(i).replace("SRC", f"'{src}/{table}.parquet'")
            for i in range(copies))
        con.sql(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    # fixed dimensions: straight copies
    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

    rep("customer", lambda i:
        f"SELECT c_custkey + {i * OFF['cust']} AS c_custkey, c_name, "
        "c_nationkey, c_acctbal, c_mktsegment FROM SRC", k)
    rep("supplier", lambda i:
        f"SELECT s_suppkey + {i * OFF['supp']} AS s_suppkey, s_name, "
        "s_nationkey, s_acctbal FROM SRC", k)
    rep("part", lambda i:
        f"SELECT p_partkey + {i * OFF['part']} AS p_partkey, p_name, "
        "p_brand, p_type, p_size, p_retailprice FROM SRC", k)
    rep("orders", lambda i:
        f"SELECT o_orderkey + {i * OFF['order']} AS o_orderkey, "
        f"o_custkey + {i * OFF['cust']} AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority FROM SRC", k)
    rep("lineitem", lambda i:
        f"SELECT l_orderkey + {i * OFF['order']} AS l_orderkey, "
        f"l_partkey + {i * OFF['part']} AS l_partkey, "
        f"l_suppkey + {i * OFF['supp']} AS l_suppkey, l_linenumber, "
        "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        "l_linestatus, l_shipdate FROM SRC", k)
    rep("events", lambda i:
        f"SELECT event_id + {i * OFF['event']} AS event_id, ts, "
        f"user_id + {i * OFF['user']} AS user_id, event_type, value, props "
        "FROM SRC", k)
    rep("documents", lambda i:
        f"SELECT doc_id + {i * OFF['doc']} AS doc_id, "
        + ("text" if i == 0 else f"'c{i} ' || text AS text") +
        f", lang, source, n_chars + {0 if i == 0 else len(str(i)) + 2} "
        "AS n_chars FROM SRC", k)
    rep("embeddings", lambda i:
        f"SELECT vec_id + {i * OFF['vec']} AS vec_id, embedding, label "
        "FROM SRC", min(k, 4))


if __name__ == "__main__":
    main()
