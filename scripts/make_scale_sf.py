#!/usr/bin/env python3
"""Full-schema scale-up generator: replicate EVERY sf table R times with
id offsets and remapped foreign keys, for bench sweeps above sf0.1
(e.g. R=10 ~ sf1). Referential structure is preserved exactly — replica
r of orders references replica r of customer, lineitem references
replica r of part/supplier — so per-key join fan-outs, date ranges and
value distributions match the source table and only CARDINALITY grows.

documents text is vowel/consonant-rotated per replica and embeddings
are direction-shifted (the make_scale_corpus.py transforms) so replicas
are NOT exact/near/semantic duplicates of each other — the dedup
queries see a 10x corpus, not a 10x duplicate pile.

region/nation stay fixed (dimension tables — they do not scale in
TPC-H either).

Usage: make_scale_sf.py <srcDir> <dstDir> <reps>
"""
import os
import sys

import duckdb

LETTERS = "aeiourstln"


def rot(r):
    k = r % len(LETTERS)
    return LETTERS[k:] + LETTERS[:k]


# per-table: (key offsets to apply, as {col: stride}); stride = source row range
OFFSETS = {
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 1500},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}


def main():
    src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation"]:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    for t, offs in OFFSETS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        # actual strides from the live table (guard against drifted testdata)
        for c, stride in offs.items():
            n = con.execute(
                f"SELECT max({c}) - min({c}) + 1 FROM '{src}/{t}.parquet'").fetchone()[0]
            assert n <= stride, f"{t}.{c} range {n} exceeds stride {stride}"
        parts = []
        for r in range(reps):
            sel = []
            for c in cols:
                if c in offs:
                    sel.append(f"{c} + {r * offs[c]} AS {c}")
                elif t == "documents" and c == "text":
                    sel.append(
                        f"translate(text, '{LETTERS}', '{rot(r)}') AS text")
                elif t == "embeddings" and c == "embedding":
                    # deterministic per-replica PSEUDORANDOM sign pattern
                    # (norm- and distribution-preserving): any two replica
                    # patterns disagree in 23-37 of 64 coordinates, and the
                    # measured same-base cross-replica cosine over the real
                    # (coordinate-concentrated) sf0.1 vectors is <= 0.80 —
                    # below every dedup threshold (0.95 semantic, 0.99
                    # near-dup). Block/shift schemes fail here: concentrated
                    # mass can sit outside any fixed flipped block.
                    sel.append(
                        "CAST(list_transform(list_zip(embedding, range(len(embedding))), "
                        f"p -> CASE WHEN (p[2]*73856093 + {r}*19349663 + p[2]*{r}*83492791) % 97 % 2 = 1 "
                        "THEN p[1] ELSE -p[1] END) AS FLOAT[]) AS embedding")
                else:
                    sel.append(c)
            parts.append(
                f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
