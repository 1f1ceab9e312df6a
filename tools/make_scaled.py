#!/usr/bin/env python3
"""Build a key-disjoint N× copy of an sf directory for scaling studies.

Every copy offsets its id/key columns by copy_index * K (K = a power of
ten above the key's max across referencing tables), so referential
integrity holds per copy, group COUNTS grow N× while per-group density
stays constant — linear runtime growth is the honest expectation and
super-linear growth exposes a hidden all-pairs or skew blowup.

Deliberate asymmetry (same as the round-2 study): documents keep their
TEXT verbatim (only doc_id/source offset), so every doc gains N-1 exact
clones and true near-dup mass grows ~N² — the pairwise dedup family is
measured against candidate load, not just corpus size. Query-vector ids
(vec_id < 10) exist only in copy 0, so ANN queries stay constant while
the corpus grows.

Usage: python3 tools/make_scaled.py [SRC] [DST] [N]
       (defaults: /root/testdata/sf0.1 /tmp/sf0.1x3 3)

Driver-side python (duckdb) — tooling only, not an engine dependency.
"""
import sys, os, math
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.1x3"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 3

con = duckdb.connect()

def pow10_above(*exprs):
    mx = 0
    for table, col in exprs:
        v = con.execute(
            f"SELECT max({col}) FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()[0]
        mx = max(mx, int(v))
    return 10 ** math.ceil(math.log10(mx + 1))

K_ORDER = pow10_above(("orders", "o_orderkey"), ("lineitem", "l_orderkey"))
K_CUST = pow10_above(("customer", "c_custkey"), ("orders", "o_custkey"))
K_PART = pow10_above(("part", "p_partkey"), ("lineitem", "l_partkey"))
K_SUPP = pow10_above(("supplier", "s_suppkey"), ("lineitem", "l_suppkey"))
K_DOC = pow10_above(("documents", "doc_id"))
K_VEC = pow10_above(("embeddings", "vec_id"))
K_EVT = pow10_above(("events", "event_id"))
K_USER = pow10_above(("events", "user_id"))

# col -> offset base (None = copy verbatim); string cols get a suffix
OFFSETS = {
    "orders": {"o_orderkey": K_ORDER, "o_custkey": K_CUST},
    "lineitem": {"l_orderkey": K_ORDER, "l_partkey": K_PART, "l_suppkey": K_SUPP},
    "customer": {"c_custkey": K_CUST},
    "part": {"p_partkey": K_PART},
    "supplier": {"s_suppkey": K_SUPP},
    "events": {"event_id": K_EVT, "user_id": K_USER},
    "documents": {"doc_id": K_DOC},
    "embeddings": {"vec_id": K_VEC},
}
SUFFIX = {  # per-copy string-key suffix keeps blocking keys disjoint
    "documents": ["source"],
    "embeddings": ["label"],
}

os.makedirs(DST, exist_ok=True)
for table in ["region", "nation"] + list(OFFSETS):
    src = f"read_parquet('{SRC}/{table}.parquet')"
    if table in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM {src}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
        continue
    cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()]
    parts = []
    for i in range(N):
        sel = []
        for c in cols:
            if c in OFFSETS[table]:
                sel.append(f"{c} + {i * OFFSETS[table][c]} AS {c}")
            elif c in SUFFIX.get(table, []):
                sel.append(f"{c} || '#{i}' AS {c}" if i else f"{c}")
            else:
                sel.append(c)
        parts.append(f"SELECT {', '.join(sel)} FROM {src}")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")
print(f"wrote {DST} ({N}x {SRC})")
