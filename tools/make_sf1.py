#!/usr/bin/env python3
"""Generate a /tmp/sf1 slice by 10x-replicating /root/testdata/sf0.1.

Build tooling (driver-side, like tools/check.py) for the round's
linearity experiment: the library itself never reads this script.

Replication design — the goal is a 10x WORKLOAD, not 10x row count with
degenerate content:

- Key columns shift by copy * 1e9 so each copy is internally join-
  consistent (orders<->lineitem<->customer etc.) and copies never
  collide. Dimension tables bounded by nature (region, nation) are NOT
  scaled, and foreign keys into them keep their original range.
- documents.text: copy 0 is verbatim; in copy k every 3rd token gets a
  per-copy suffix, so every 3-shingle of a copied doc contains a
  modified token and CROSS-COPY near-dup pairs vanish (naive
  replication would make pair output quadratic in the copy count and
  fake a super-linear dedup regression). Token count, char count and
  whitespace shape are preserved, so length/quality stats scale.
- embeddings: copy 0 verbatim; copies get fresh deterministic unit
  vectors (hash-seeded), so similarity structure grows linearly
  instead of every vector gaining 9 exact twins.
- Query anchors (vec_id < 10 probes, vec_id < 16/64 codebooks,
  doc_id % 10 batches) resolve to copy-0 rows, mirroring a fixed query
  set against a 10x corpus.
"""
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SHIFT = 1_000_000_000

con = duckdb.connect()
con.execute(f"CREATE TABLE copies AS SELECT unnest(range(0, {COPIES})) AS c")

# (table, [shifted key cols]) — everything else rides along unchanged
SHIFTED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}
UNSCALED = ["region", "nation"]


def cols(table):
    return [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')").fetchall()]


import os
os.makedirs(DST, exist_ok=True)

for t in UNSCALED:
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{DST}/{t}.parquet' (FORMAT parquet)")

for t, keys in SHIFTED.items():
    sel = ", ".join(
        f"{c} + c * {SHIFT} AS {c}" if c in keys else c for c in cols(t))
    # c_name tracks its key in the base generator; verbatim copies would
    # hand the edit-distance matcher 10 exact twins per name (quadratic
    # fabricated pairs, the documents/embeddings problem all over).
    # Regenerate it from a CONTIGUOUS surrogate — exactly the name table
    # a real 10x customer base would have.
    if t == "customer":
        n_base = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/customer.parquet')"
        ).fetchone()[0]
        sel = sel.replace(
            "c_name",
            f"printf('Customer#%09d', c_custkey % {SHIFT} + c * {n_base}) AS c_name")
    con.execute(
        f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet') CROSS JOIN copies) "
        f"TO '{DST}/{t}.parquet' (FORMAT parquet)")

# documents: per-copy token perturbation (see module doc)
doc_cols = cols("documents")
other = ", ".join(c for c in doc_cols if c not in ("doc_id", "text"))
con.execute(f"""
COPY (
  SELECT doc_id + c * {SHIFT} AS doc_id,
    CASE WHEN c = 0 THEN text ELSE
      array_to_string(list_transform(string_split(text, ' '),
        (tok, i) -> CASE WHEN (i - 1) % 3 = 0 THEN tok || 'x' || c ELSE tok END), ' ')
    END AS text,
    {other}
  FROM read_parquet('{SRC}/documents.parquet') CROSS JOIN copies
) TO '{DST}/documents.parquet' (FORMAT parquet)""")

# embeddings: copy 0 verbatim, fresh deterministic unit vectors beyond
con.execute(f"""
COPY (
  WITH raw AS (
    SELECT vec_id + c * {SHIFT} AS vec_id, embedding, label, c,
      len(embedding) AS nd
    FROM read_parquet('{SRC}/embeddings.parquet') CROSS JOIN copies),
  fresh AS (
    SELECT vec_id, label, c,
      CASE WHEN c = 0 THEN embedding ELSE
        list_transform(range(1, nd + 1),
          i -> CAST((hash(vec_id * 64 + i) % 2000001) / 1000000.0 - 1.0 AS DOUBLE))
      END AS e
    FROM raw),
  normed AS (
    SELECT vec_id, label, c,
      sqrt(list_sum(list_transform(e, x -> CAST(x * x AS DOUBLE)))) AS nrm, e
    FROM fresh)
  SELECT vec_id,
    CAST(list_transform(e, x -> CAST(x / nrm AS FLOAT)) AS FLOAT[]) AS embedding,
    label
  FROM normed
) TO '{DST}/embeddings.parquet' (FORMAT parquet)""")

for t in list(SHIFTED) + UNSCALED + ["documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n}")
print("done ->", DST)
