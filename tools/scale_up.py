#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing testdata dir for
SCALE REHEARSALS (dev-only; the driver's gates always run on the real
/root/testdata dirs, which are read-only and must not be regenerated).

Usage: python3 tools/scale_up.py <src_sf_dir> <out_dir> [factor=10]

Fact tables (orders, lineitem, events, documents, embeddings) are
replicated `factor`× with disjoint id shifts; dimension tables
(region, nation, customer, supplier, part) are copied verbatim, so
every foreign key in the scaled facts still resolves.

Content columns are deterministically perturbed per copy so the scaled
corpus keeps realistic distributions instead of artificial duplicate
explosions:
  - documents.text: every 7th token of copy i>0 is rewritten to a
    copy-unique token (word-3-gram Jaccard vs the original ≈ 0.5-0.6 —
    below near-dup thresholds, so the MinHash/SimHash candidate
    volume scales linearly, like a real corpus, not quadratically in
    the copy count); n_chars is recomputed to stay consistent.
  - embeddings.embedding: copy i rotates the vector by i positions
    (norm-preserving, changes neighborhoods).

Timestamps are left unchanged: the day/hour frames every temporal
operator aggregates into stay bounded by the TIME SPAN while per-day
volumes scale — exactly the 100 TB shape.

Dev-tool only (driver-side python, like check_oracle.py); not part of
the Spark library.
"""
import os
import sys

import duckdb

DIMS = ["region", "nation", "customer", "supplier", "part"]


def main():
    src = sys.argv[1]
    out = sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def write(sql, name):
        con.sql(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(
            f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for d in DIMS:
        write(f"SELECT * FROM '{src}/{d}.parquet'", d)

    # id shifts use the smallest 10^k stride STRICTLY ABOVE the actual
    # source max, computed per id column, so scaled ids stay disjoint
    # for any source — including re-applying the tool to its own
    # output (a hardcoded stride would silently collide there)
    def stride_of(*cols):
        m = 0
        for table, colname in cols:
            v = con.sql(
                f"SELECT max({colname}) FROM '{src}/{table}.parquet'"
            ).fetchone()[0]
            m = max(m, int(v))
        s = 10
        while s <= m:
            s *= 10
        return s

    # orders and lineitem share the orderkey stride so l_orderkey
    # still joins to o_orderkey within every copy
    ok = stride_of(("orders", "o_orderkey"), ("lineitem", "l_orderkey"))
    eid = stride_of(("events", "event_id"))
    uid = stride_of(("events", "user_id"))
    did = stride_of(("documents", "doc_id"))
    vid = stride_of(("embeddings", "vec_id"))

    write(f"""
        SELECT o_orderkey + c.i * {ok} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet', range(0, {factor}) c(i)""", "orders")
    write(f"""
        SELECT l_orderkey + c.i * {ok} AS l_orderkey, l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet', range(0, {factor}) c(i)""", "lineitem")
    write(f"""
        SELECT event_id + c.i * {eid} AS event_id, ts,
               user_id + c.i * {uid} AS user_id, event_type, value, props
        FROM '{src}/events.parquet', range(0, {factor}) c(i)""", "events")
    write(f"""
        WITH scaled AS (
          SELECT doc_id + c.i * {did} AS doc_id, c.i AS cp, text, lang,
                 source
          FROM '{src}/documents.parquet', range(0, {factor}) c(i)
        ),
        perturbed AS (
          SELECT doc_id,
                 CASE WHEN cp = 0 THEN text
                      ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                          (w, ix) -> CASE WHEN ix % 7 = 0
                                     THEN 'w' || cp || 'x' || ix
                                     ELSE w END), ' ')
                 END AS text,
                 lang, source
          FROM scaled)
        SELECT doc_id, text, lang, source, length(text) AS n_chars
        FROM perturbed""", "documents")
    write(f"""
        SELECT vec_id + c.i * {vid} AS vec_id,
               CASE WHEN c.i = 0 THEN embedding
                    ELSE list_concat(embedding[c.i + 1:],
                                     embedding[:c.i])::FLOAT[]
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet', range(0, {factor}) c(i)""",
        "embeddings")


if __name__ == "__main__":
    main()
