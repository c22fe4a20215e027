#!/usr/bin/env python3
"""Scale-up corpus generator for the O(increment) probe (graft.ScaleProbe).

Replicates the sf0.1 documents/embeddings tables R times with id offsets,
vowel/consonant-rotating each replica's text (so replicas are NOT
near-duplicates under 3-gram shingling) and shifting each replica's
embedding direction (so replicas stay below the cosine thresholds).
Replica index R (one past the corpus) is written as the fixed-size
increment — identical across runs, whatever the standing corpus size.

Usage: make_scale_corpus.py <srcDir> <dstDir> <reps>
Writes <dstDir>/corpus_{documents,embeddings}.parquet (replicas 0..reps-1)
and <dstDir>/inc_{documents,embeddings}.parquet (replica == reps).
"""
import duckdb
import os
import sys

LETTERS = "aeiourstln"


def rot(r):
    k = r % len(LETTERS)
    return LETTERS[k:] + LETTERS[:k]


def main():
    src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def doc_select(r):
        return (
            f"SELECT doc_id + {r} * 1000000 AS doc_id, "
            f"translate(text, '{LETTERS}', '{rot(r)}') AS text, lang, source, n_chars "
            f"FROM '{src}/documents.parquet'"
        )

    def emb_select(r):
        return (
            f"SELECT vec_id + {r} * 1000000 AS vec_id, "
            f"list_concat([embedding[1] + {r} * 0.7], embedding[2:]) AS embedding "
            f"FROM '{src}/embeddings.parquet'"
        )

    if reps > len(LETTERS):
        raise SystemExit(f"reps must be <= {len(LETTERS)} (distinct rotations)")
    corpus_docs = "\nUNION ALL\n".join(doc_select(r) for r in range(reps))
    corpus_embs = "\nUNION ALL\n".join(emb_select(r) for r in range(reps))
    con.execute(f"COPY ({corpus_docs}) TO '{dst}/corpus_documents.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY ({corpus_embs}) TO '{dst}/corpus_embeddings.parquet' (FORMAT PARQUET)")
    # the increment is IDENTICAL whatever `reps` is, and its transform
    # (letter reversal / negative shift) is never a corpus rotation — so
    # the same fixed-size day probes standing corpora of any scale
    inc_docs = (
        f"SELECT doc_id + 99000000 AS doc_id, "
        f"translate(text, '{LETTERS}', '{LETTERS[::-1]}') AS text, lang, source, n_chars "
        f"FROM '{src}/documents.parquet'"
    )
    inc_embs = (
        f"SELECT vec_id + 99000000 AS vec_id, "
        f"list_concat([embedding[1] - 0.9], embedding[2:]) AS embedding "
        f"FROM '{src}/embeddings.parquet'"
    )
    con.execute(f"COPY ({inc_docs}) TO '{dst}/inc_documents.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY ({inc_embs}) TO '{dst}/inc_embeddings.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM '{dst}/corpus_documents.parquet'").fetchone()[0]
    m = con.execute(f"SELECT COUNT(*) FROM '{dst}/corpus_embeddings.parquet'").fetchone()[0]
    print(f"corpus: {n} docs, {m} embeddings; increment: 1 replica")


if __name__ == "__main__":
    main()
