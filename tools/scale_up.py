#!/usr/bin/env python3
"""Synthesize a 10x scale dir (sf1) from the driver's sf0.1 testdata.

Usage: python3 tools/scale_up.py <src_sf_dir> <dest_dir> [copies]

The driver generates sf0.001/0.01/0.1 only; the sf1 decade (round-12
verdict item 5) is built here by FK-consistent replication — the same
tool class as local_verify.py (repo-side harness, not library code):

- region/nation: copied once (dimension tables; FK targets unchanged).
- customer/supplier/part/orders/lineitem/events: `copies` copies with
  every key and foreign key shifted by copy * (max_key_of_its_table+1),
  so referential integrity and per-key multiplicities are exactly
  preserved and cross-copy keys never collide. Timestamps/values are
  untouched (time windows get copies-x density — the scale-up shape).
- documents: copy 0 verbatim; copy i>0 rewrites every token w as
  w + '_' + i + 'z'*(hash(w|i) % 3) — a per-copy vocab BIJECTION
  (disjoint across copies), with a WORD-AND-COPY-dependent suffix
  length — and then applies a per-copy affine permutation of the a-z
  alphabet (letter j -> (k_i*j + i) mod 26, k_i coprime with 26).
  Why both, and why the variable length (the round-12 verdict's g5
  fix): the corpus's aHash/pHash features reduce to a letter-vs-
  separator THRESHOLD MASK of the first N bytes (every a-z code sits
  above the code mean, every space/digit/underscore below), so the
  fingerprint is a function of the token-LENGTH pattern alone. A
  fixed-width suffix ('_i') preserves that pattern copy-to-copy
  exactly — replicas stayed true pHash duplicates (exp_sf1 1.29,
  3.6M of 4.0M sf1 pairs cross-copy when measured) — and no letter
  permutation/rotation can help because the mask never looks at
  WHICH letter. Varying the suffix length by hash(word|copy)
  decorrelates the length pattern itself across copies while staying
  a bijection per copy (same word -> same token), so token-level
  dedup structure within a copy is exactly the original's and
  cross-copy collisions drop to band-collision noise at BOTH the
  token and the byte level. The alphabet permutation still rides
  along so raw byte CONTENT is copy-distinct even where lengths tie.
  n_chars recomputed.
- embeddings: copy i cyclically rotates the 64 components by i.
  Rotation preserves norms and all WITHIN-copy dot products exactly
  (each copy's ANN structure is the original corpus's), while
  cross-copy cosines scramble — again linear, not clique, growth.

Every table lands as a single {name}.parquet FILE so both
graft.sources.Tables and local_verify.py read the dir unchanged.
"""
import sys

import duckdb


def main():
    src, dest = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()

    def copy_table(name, sql):
        con.execute(
            f"COPY ({sql}) TO '{dest}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{dest}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    def src_t(name):
        return f"'{src}/{name}.parquet'"

    def key_span(name, col):
        return con.execute(
            f"SELECT max({col}) + 1 FROM {src_t(name)}").fetchone()[0]

    cust = key_span("customer", "c_custkey")
    supp = key_span("supplier", "s_suppkey")
    part = key_span("part", "p_partkey")
    ordk = key_span("orders", "o_orderkey")
    evid = key_span("events", "event_id")
    usr = key_span("events", "user_id")
    doc = key_span("documents", "doc_id")
    vec = key_span("embeddings", "vec_id")
    rng = f"(SELECT unnest(range({copies})) AS c)"

    for t in ("region", "nation"):
        copy_table(t, f"SELECT * FROM {src_t(t)}")
    copy_table("customer", f"""
        SELECT c_custkey + c * {cust} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src_t('customer')}, {rng}""")
    copy_table("supplier", f"""
        SELECT s_suppkey + c * {supp} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM {src_t('supplier')}, {rng}""")
    copy_table("part", f"""
        SELECT p_partkey + c * {part} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {src_t('part')}, {rng}""")
    copy_table("orders", f"""
        SELECT o_orderkey + c * {ordk} AS o_orderkey,
               o_custkey + c * {cust} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src_t('orders')}, {rng}""")
    copy_table("lineitem", f"""
        SELECT l_orderkey + c * {ordk} AS l_orderkey,
               l_partkey + c * {part} AS l_partkey,
               l_suppkey + c * {supp} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {src_t('lineitem')}, {rng}""")
    # props is '{"k": N}' (k in [0,100)); k buckets (day, k) in c27 and
    # neither day nor k would otherwise shift, so merged copies blow
    # every bucket past the 64 hub cap and zero the pair report — shift
    # k by copy*k_span so buckets replicate structure like every key
    kspan = con.execute(
        f"SELECT max(CAST(json_extract(props, '$.k') AS INT)) + 1 "
        f"FROM {src_t('events')}").fetchone()[0]
    copy_table("events", f"""
        SELECT event_id + c * {evid} AS event_id, ts,
               user_id + c * {usr} AS user_id, event_type, value,
               '{{"k": ' || CAST(CAST(json_extract(props, '$.k') AS INT)
                                 + c * {kspan} AS VARCHAR) || '}}' AS props
        FROM {src_t('events')}, {rng}""")
    # per-copy affine alphabet permutation (see module doc): k coprime
    # with 26, shift = c; copy 0 is the identity
    alpha = "abcdefghijklmnopqrstuvwxyz"
    ks = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]  # coprime with 26

    def perm(c):
        k = ks[c % len(ks)]
        return "".join(alpha[(k * j + c) % 26] for j in range(26))

    # copies=1 leaves the WHEN list empty and 'CASE ELSE x END' is a
    # DuckDB parse error (round-13 advice) — a single-copy run is a
    # plain passthrough, so emit the untouched column directly
    scramble = "suffixed" if copies < 2 else "CASE " + " ".join(
        f"WHEN c = {i} THEN translate(suffixed, '{alpha}', '{perm(i)}')"
        for i in range(1, copies)) + " ELSE suffixed END"
    copy_table("documents", f"""
        SELECT doc_id + c * {doc} AS doc_id, {scramble} AS text,
               lang, source, CAST(length({scramble}) AS BIGINT) AS n_chars
        FROM (SELECT doc_id, c,
                     CASE WHEN c = 0 THEN text
                          ELSE array_to_string(list_transform(str_split(text, ' '),
                                 w -> w || '_' || CAST(c AS VARCHAR)
                                        || repeat('z', CAST(hash(w || '|' ||
                                             CAST(c AS VARCHAR)) % 3 AS INT))), ' ') END
                       AS suffixed,
                     lang, source
              FROM {src_t('documents')}, {rng})""")
    copy_table("embeddings", f"""
        SELECT vec_id + c * {vec} AS vec_id,
               CAST(CASE WHEN c = 0 THEN embedding
                    ELSE list_concat(embedding[c + 1:len(embedding)],
                                     embedding[1:c]) END AS FLOAT[]) AS embedding,
               label
        FROM {src_t('embeddings')}, {rng}""")


if __name__ == "__main__":
    main()
