#!/usr/bin/env python3
"""Scale-up corpus generator for the O(increment) probe (graft.ScaleProbe).

Replicates the sf0.1 documents/embeddings tables R times with id offsets,
a per-replica letter-mapping of the text (so replicas are NOT
near-duplicates under 3-gram shingling) and a per-replica pseudorandom
sign-flip of the embeddings (norm- and within-replica-geometry-preserving,
so replicas stay below every cosine threshold). A fixed transform (never a
replica's) is written as the increment — byte-identical across runs,
whatever the standing corpus size.

Transform validity, verified against the live sf0.1 tables:
  - TEXT: two DISJOINT 10-letter sets rotate independently (L1 by r%10,
    L2 by r//10), giving 100 distinct mappings. Word-3-gram shingles
    survive between two variants only if all three words avoid the
    differing set: measured mean shared-shingle fraction 0.5% (max 11%)
    across the corpus — far under the 0.6 Jaccard threshold. (The old
    single-set rotation capped reps at 10; reps 10 apart would have been
    EXACT duplicates.)
  - EMBEDDINGS: per-coordinate sign flip keyed by hash(r:i) — a true
    64-bit hash, because the previous first-coordinate shift scheme
    degenerates at large r (two large-shift replicas' cosine tends to 1)
    and linear-congruential patterns collide past their modulus.
    Measured over r in 0..100 plus the increment pattern: minimum
    pairwise pattern disagreement 18/64 coordinates, worst same-base
    cross-replica cosine 0.81 — below the 0.95 semantic and 0.99
    near-dup thresholds.

Usage: make_scale_corpus.py <srcDir> <dstDir> <reps>   (reps <= 100)
Writes <dstDir>/corpus_{documents,embeddings}.parquet (replicas 0..reps-1)
and <dstDir>/inc_{documents,embeddings}.parquet (the fixed increment).
"""
import duckdb
import os
import sys

L1 = "aeiourstln"
L2 = "bcdfghmpwy"
INC_FLIP_R = 999  # the increment's sign-pattern key — never a replica's
INC_ID_OFFSET = 900000000  # above any replica offset at reps <= 100


def rot(s, k):
    k = k % len(s)
    return s[k:] + s[:k]


def text_map(r):
    """Two independent rotations: distinct mapping per r in 0..99."""
    return (rot(L1, r % 10), rot(L2, (r // 10) % 10))


def flip(expr, r):
    """Sign-flip `expr` (a list<double>) by the hash(r:i) pattern."""
    return (
        f"CAST(list_transform(list_zip({expr}, range(len({expr}))), "
        f"p -> CASE WHEN hash(CAST({r} AS VARCHAR) || ':' || CAST(p[2] AS VARCHAR)) % 2 = 1 "
        f"THEN -p[1] ELSE p[1] END) AS DOUBLE[])"
    )


def main():
    src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    if reps > 100:
        raise SystemExit("reps must be <= 100 (distinct letter-mapping pairs)")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def doc_select(r):
        m1, m2 = text_map(r)
        return (
            f"SELECT doc_id + {r} * 1000000 AS doc_id, "
            f"translate(translate(text, '{L1}', '{m1}'), '{L2}', '{m2}') AS text, "
            f"lang, source, n_chars "
            f"FROM '{src}/documents.parquet'"
        )

    def emb_select(r):
        return (
            f"SELECT vec_id + {r} * 1000000 AS vec_id, "
            f"{flip('embedding', r)} AS embedding "
            f"FROM '{src}/embeddings.parquet'"
        )

    corpus_docs = "\nUNION ALL\n".join(doc_select(r) for r in range(reps))
    corpus_embs = "\nUNION ALL\n".join(emb_select(r) for r in range(reps))
    con.execute(f"COPY ({corpus_docs}) TO '{dst}/corpus_documents.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY ({corpus_embs}) TO '{dst}/corpus_embeddings.parquet' (FORMAT PARQUET)")
    # the increment is IDENTICAL whatever `reps` is, and its transforms
    # (letter REVERSALS — never a rotation of either set — and the fixed
    # INC_FLIP_R sign pattern) are distinct from every replica's, so the
    # same fixed-size day probes standing corpora of any scale
    inc_docs = (
        f"SELECT doc_id + {INC_ID_OFFSET} AS doc_id, "
        f"translate(translate(text, '{L1}', '{L1[::-1]}'), '{L2}', '{L2[::-1]}') AS text, "
        f"lang, source, n_chars "
        f"FROM '{src}/documents.parquet'"
    )
    inc_embs = (
        f"SELECT vec_id + {INC_ID_OFFSET} AS vec_id, "
        f"{flip('embedding', INC_FLIP_R)} AS embedding "
        f"FROM '{src}/embeddings.parquet'"
    )
    con.execute(f"COPY ({inc_docs}) TO '{dst}/inc_documents.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY ({inc_embs}) TO '{dst}/inc_embeddings.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM '{dst}/corpus_documents.parquet'").fetchone()[0]
    m = con.execute(f"SELECT COUNT(*) FROM '{dst}/corpus_embeddings.parquet'").fetchone()[0]
    print(f"corpus: {n} docs, {m} embeddings; increment: 1 replica")


if __name__ == "__main__":
    main()
