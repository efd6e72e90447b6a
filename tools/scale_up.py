#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing testdata dir for
SCALE REHEARSALS (dev-only; the driver's gates always run on the real
/root/testdata dirs, which are read-only and must not be regenerated).

Usage: python3 tools/scale_up.py <src_sf_dir> <out_dir> [factor=10] [cap=10]

Fact tables (orders, lineitem, events, documents, embeddings) are
replicated `factor`× with disjoint id shifts; dimension tables
(region, nation, customer, supplier, part) are copied verbatim, so
every foreign key in the scaled facts still resolves.

Content columns are deterministically perturbed per copy so the scaled
corpus keeps realistic distributions instead of artificial duplicate
explosions:
  - documents.text: copies are grouped into near-dup FAMILIES of at
    most `cap` members. Within a family, every 7th token of member
    m>0 is rewritten to a copy-unique token (char-5-gram Jaccard vs
    the family base stays >= the 0.5 near-dup thresholds — the family
    IS a true dup cluster). Family 0's base is the source text;
    every further family's base is a FRESH doc sampled token-by-token
    from the corpus unigram distribution (the same law as the
    generator's own unrelated docs), so cross-family similarity sits
    at the corpus's natural j~0.25 char-5-gram background, never in
    the candidate band. True near-dup pairs therefore grow LINEARLY
    in `factor` (families × C(cap,2) per source doc), not C(factor,2)
    — a probe at factor 100 measures plan scaling, not answer
    explosion. n_chars is recomputed to stay consistent.
  - embeddings.embedding: copy i rotates the vector by i mod dim
    positions (norm-preserving, changes neighborhoods); copies past
    one full rotation cycle (i >= dim) additionally flip a
    deterministic third of the signs, with the mask keyed by
    hash(position, i // dim) — the hash makes masks of different
    cycles differ, so copies sharing a rotation (i ≡ j mod dim)
    coincide only when i = j: no two copies match at any factor.

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
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 10
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
    # weighted unigram sampler for fresh family bases: each source word
    # repeated in proportion to its corpus frequency (1/1024 grain), so
    # hash-indexed draws reproduce the generator's own background law
    freqs = con.sql(f"""
        SELECT w, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS w
              FROM '{src}/documents.parquet')
        WHERE w <> '' GROUP BY w ORDER BY n DESC""").fetchall()
    total = sum(n for _, n in freqs)
    sampler = []
    for w, n in freqs:
        sampler.extend([w] * max(1, round(1024 * n / total)))
    arr_lit = "[" + ", ".join("'" + w.replace("'", "''") + "'"
                              for w in sampler) + "]"
    # one-row table, cross-joined below: the list literal is built once
    # instead of re-materialized per token lookup (~1000x faster)
    con.sql(f"CREATE TABLE samp AS SELECT {arr_lit} AS arr")

    # copy i belongs to family i // cap; member m = i % cap. Family 0
    # keeps the source text as its base (copy 0 verbatim — the original
    # pre-cap law, so factor <= cap output is unchanged); family f > 0
    # bases are fresh unigram samples of the same token length. Member
    # m > 0 rewrites every 7th token copy-uniquely (the near-dup law).
    write(f"""
        WITH scaled AS (
          SELECT doc_id + c.i * {did} AS doc_id, doc_id AS src_id,
                 c.i AS cp, c.i // {cap} AS fam, c.i % {cap} AS mem,
                 string_split(text, ' ') AS toks, lang, source
          FROM '{src}/documents.parquet', range(0, {factor}) c(i)
        ),
        based AS (
          SELECT doc_id, cp, mem, lang, source,
                 CASE WHEN fam = 0 THEN toks
                      ELSE list_transform(range(1, len(toks) + 1), ix ->
                        arr[1 + (hash(concat(src_id, '_', fam,
                                             '_', ix))
                                 % {len(sampler)})::INT])
                 END AS toks
          FROM scaled, samp
        ),
        perturbed AS (
          SELECT doc_id,
                 CASE WHEN mem = 0 THEN array_to_string(toks, ' ')
                      ELSE array_to_string(
                        list_transform(toks,
                          (w, ix) -> CASE WHEN ix % 7 = 0
                                     THEN 'w' || cp || 'x' || ix
                                     ELSE w END), ' ')
                 END AS text,
                 lang, source
          FROM based)
        SELECT doc_id, text, lang, source, length(text) AS n_chars
        FROM perturbed""", "documents")

    dim = con.sql(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    write(f"""
        SELECT vec_id + c.i * {vid} AS vec_id,
               CASE WHEN c.i = 0 THEN embedding
                    ELSE list_transform(
                      list_concat(embedding[(c.i % {dim}) + 1:],
                                  embedding[:(c.i % {dim})]),
                      (x, ix) -> CASE WHEN c.i >= {dim}
                                      AND hash(ix || '_' || (c.i // {dim})) % 3 = 0
                                 THEN -x ELSE x END)::FLOAT[]
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet', range(0, {factor}) c(i)""",
        "embeddings")


if __name__ == "__main__":
    main()
