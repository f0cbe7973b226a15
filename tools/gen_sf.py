#!/usr/bin/env python3
"""Scale up the driver's sf0.1 tables by FK-consistent replication.

Usage: python3 tools/gen_sf.py <replicas> <dstDir> [srcDir]

Driver-side tooling (like check.py): builds an sfN dataset for the
higher-scale correctness gate by unioning R key-offset copies of each
sf0.1 fact table. Dimension tables (region, nation) keep their fixed
TPC-H cardinality; every foreign key is offset by the SAME stride as
its parent, so referential structure is preserved exactly. Replica
perturbations keep derived invariants honest:

  - documents: replica r > 0 appends a single distinct token
    (' xcopy<r>') and RECOMPUTES n_chars = length(text), so the
    n_chars==length(text) invariant holds corpus-wide while exact-dup
    clusters still triple (the realistic web-dup regime).
  - embeddings: replica r > 0 adds r/1000 to dimension 0 — cosine ties
    between replicas would otherwise make every top-k engine-order-
    dependent.

Strides are max(key)+1 of the source, so keys stay dense and 31-bit
safe at any replica count used here.
"""
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    reps = int(sys.argv[1])
    dst = sys.argv[2].rstrip("/")
    src = (sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1").rstrip("/")
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{src}/{t}.parquet')")

    def stride(table, key):
        return con.execute(f"SELECT max({key}) + 1 FROM {table}").fetchone()[0]

    ko = stride("orders", "o_orderkey")
    kc = stride("customer", "c_custkey")
    kp = stride("part", "p_partkey")
    ks = stride("supplier", "s_suppkey")
    kd = stride("documents", "doc_id")
    kv = stride("embeddings", "vec_id")
    ke = stride("events", "event_id")
    ku = stride("events", "user_id")

    def gen(table, select_per_replica):
        sql = " UNION ALL ".join(select_per_replica(r) for r in range(reps))
        con.execute(f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    # fixed-cardinality dims: copy once
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM {t}) TO '{dst}/{t}.parquet' "
                    "(FORMAT PARQUET)")
        print(f"{t}: copied")

    gen("customer", lambda r:
        f"SELECT c_custkey + {r * kc} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM customer")
    gen("supplier", lambda r:
        f"SELECT s_suppkey + {r * ks} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM supplier")
    gen("part", lambda r:
        f"SELECT p_partkey + {r * kp} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM part")
    gen("orders", lambda r:
        f"SELECT o_orderkey + {r * ko} AS o_orderkey, "
        f"o_custkey + {r * kc} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM orders")
    gen("lineitem", lambda r:
        f"SELECT l_orderkey + {r * ko} AS l_orderkey, "
        f"l_partkey + {r * kp} AS l_partkey, "
        f"l_suppkey + {r * ks} AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM lineitem")
    gen("events", lambda r:
        f"SELECT event_id + {r * ke} AS event_id, ts, "
        f"user_id + {r * ku} AS user_id, event_type, value, props FROM events")
    gen("documents", lambda r:
        f"SELECT doc_id + {r * kd} AS doc_id, "
        + ("text" if r == 0 else f"text || ' xcopy{r}'") + " AS text, "
        f"lang, source, "
        + ("n_chars" if r == 0
           else f"CAST(length(text || ' xcopy{r}') AS BIGINT)")
        + " AS n_chars FROM documents")
    gen("embeddings", lambda r:
        f"SELECT vec_id + {r * kv} AS vec_id, "
        + ("embedding" if r == 0 else
           f"list_concat([CAST(embedding[1] + {r / 1000.0} AS FLOAT)], "
           f"embedding[2:]) ")
        + " AS embedding, label FROM embeddings")


if __name__ == "__main__":
    main()
