#!/usr/bin/env python3
"""Scale-up corpus generator for the O(increment) probe (graft.ScaleProbe).

Replicates the sf0.1 documents/embeddings tables R times with id offsets,
a per-replica letter-mapping of the text (so replicas are NOT
near-duplicates under 3-gram shingling) and a per-replica pseudorandom
sign-flip of the embeddings (norm- and within-replica-geometry-preserving,
so replicas stay below every cosine threshold). A fixed transform (never a
replica's) is written as the increment — byte-identical across runs,
whatever the standing corpus size.

Transform validity (CHECKED AT GENERATION TIME, not argued — the script
aborts if any invariant fails on the live source tables):
  - TEXT: three DISJOINT rotation axes compose per replica —
    L1 by r%10, L2 by (r//10)%10, and (fourth-decade mode) a PRE-rotation
    of L3 (a 10-letter set drawn across L1 and L2) by (r//100)%10 —
    giving up to 1000 mappings. The script verifies all `reps` composed
    26-letter mappings (plus the increment's reversal mapping) are
    pairwise DISTINCT with a minimum letter-disagreement floor, and
    measures word-3-gram Jaccard between sampled mapping pairs on sampled
    docs (historical at reps=100: mean 0.5%, max 11% — far under the 0.6
    threshold). T3 at a=0 is the identity, so replicas 0..99 are
    byte-identical with the two-axis generator.
  - EMBEDDINGS: per-coordinate sign flip keyed by hash(r:i) — a true
    64-bit hash (computed IN duckdb, the engine that writes the corpus),
    because shift/linear-congruential schemes degenerate at large r.
    The script verifies the patterns for r in 0..reps-1 plus the
    increment's are pairwise distinct, reports the minimum pairwise
    disagreement (18/64 at reps=100), and for any CLOSE pattern pair
    (<20 differing coordinates) computes the worst same-base cosine over
    the actual source vectors, requiring it below 0.93 (margin under the
    0.95 semantic threshold; at reps=100 the measured worst is 0.81).

Usage: make_scale_corpus.py <srcDir> <dstDir> <reps>   (reps <= 1000)

reps <= 100 keeps the historical id layout byte-for-byte (increment at
offset 9×10⁸, sign key 999). reps > 100 moves the increment above every
replica stripe (offset 3×10⁹ — replica ids reach 999×10⁶, so the old
constants would collide); its sign key is the LAST greedily-selected
flip key (see select_flip_keys — identity keys collide in cosine near
reps=1000), recorded in meta.json as inc_flip_r. Either way the script
writes <dstDir>/meta.json with the layout (id_stride, inc_id_offset,
plant_offset, reps, inc_flip_r); graft.ScaleProbe / graft.ScaleDiag
read it when present and fall back to the historical constants for
dirs that predate it.

Writes <dstDir>/corpus_{documents,embeddings}.parquet (replicas 0..reps-1)
and <dstDir>/inc_{documents,embeddings}.parquet (the fixed increment).
"""
import json
import os
import sys

import duckdb

L1 = "aeiourstln"
L2 = "bcdfghmpwy"
L3 = "aeioubcdfg"  # third axis: half of L1 + half of L2, PRE-rotated
ID_STRIDE = 1000000

# historical layout (reps <= 100): increment above replica ids < 10⁸,
# plants (ScaleProbe) at 8×10⁸ between the two
INC_FLIP_R = 999
INC_ID_OFFSET = 900000000
PLANT_OFFSET = 800000000

# fourth-decade layout (reps > 100): replica ids reach 999×10⁶ + 10⁶, so
# plants move to 2×10⁹ and the increment above them at 3×10⁹. The
# increment's sign key is NOT a constant here — select_flip_keys picks
# it greedily with the replica keys (meta.json records it as inc_flip_r)
BIG_INC_ID_OFFSET = 3000000000
BIG_PLANT_OFFSET = 2000000000


def rot(s, k):
    k = k % len(s)
    return s[k:] + s[:k]


def text_maps(r):
    """(L3 pre-map, L1 map, L2 map) — applied innermost-first in SQL."""
    return (rot(L3, (r // 100) % 10), rot(L1, r % 10), rot(L2, (r // 10) % 10))


def flip(expr, r):
    """Sign-flip `expr` (a list<double>) by the hash(r:i) pattern."""
    return (
        f"CAST(list_transform(list_zip({expr}, range(len({expr}))), "
        f"p -> CASE WHEN hash(CAST({r} AS VARCHAR) || ':' || CAST(p[2] AS VARCHAR)) % 2 = 1 "
        f"THEN -p[1] ELSE p[1] END) AS DOUBLE[])"
    )


def composed_letter_map(maps):
    """The 26-letter mapping of translate(translate(translate(., L3, m3),
    L1, m1), L2, m2) — innermost (L3) first, mirroring the SQL."""
    m3, m1, m2 = maps

    def step(c, frm, to):
        i = frm.find(c)
        return to[i] if i >= 0 else c

    out = []
    for c in "abcdefghijklmnopqrstuvwxyz":
        c = step(c, L3, m3)
        c = step(c, L1, m1)
        c = step(c, L2, m2)
        out.append(c)
    return "".join(out)


def inc_letter_map():
    """The increment's mapping: reversal of L1 and L2 (never a rotation)."""
    def step(c, frm, to):
        i = frm.find(c)
        return to[i] if i >= 0 else c

    out = []
    for c in "abcdefghijklmnopqrstuvwxyz":
        c = step(c, L1, L1[::-1])
        c = step(c, L2, L2[::-1])
        out.append(c)
    return "".join(out)


def check_text_maps(con, src, reps):
    """Pairwise-distinct composed mappings + sampled shingle-overlap audit."""
    maps = [composed_letter_map(text_maps(r)) for r in range(reps)]
    maps.append(inc_letter_map())
    seen = {}
    min_diff = 26
    for idx, m in enumerate(maps):
        if m in seen:
            raise SystemExit(
                f"text mappings collide: r={seen[m]} and r={idx} are identical")
        seen[m] = idx
    # min pairwise letter disagreement — exhaustive (<= 1001 maps)
    for i in range(len(maps)):
        for j in range(i + 1, len(maps)):
            d = sum(a != b for a, b in zip(maps[i], maps[j]))
            if d < min_diff:
                min_diff = d
    if min_diff < 6:
        raise SystemExit(f"text mapping min letter-diff {min_diff} < 6")
    # empirical word-3-gram Jaccard on sampled docs × sampled mapping pairs
    docs = [r[0] for r in con.execute(
        f"SELECT text FROM '{src}/documents.parquet' "
        f"USING SAMPLE reservoir(100 ROWS) REPEATABLE (42)").fetchall()]
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def shingles(text, m):
        # model the bytes the dedup operators actually see: the SQL
        # translate runs on RAW text (uppercase passes through
        # untransformed — the from-sets are lowercase-only), and the
        # engine's tokenizer lowercases AFTERWARDS (TextAnalysis.tokens).
        # lower-then-map would map uppercase-derived letters too and
        # understate real cross-replica overlap on uppercase-heavy docs.
        t = text.translate(str.maketrans(alpha, m)).lower()
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    import random
    rng = random.Random(42)
    pairs = [(rng.randrange(len(maps)), rng.randrange(len(maps)))
             for _ in range(40)]
    pairs = [(a, b) for a, b in pairs if a != b]
    worst = 0.0
    tot = n = 0
    for a, b in pairs:
        for text in docs[:25]:
            sa, sb = shingles(text, maps[a]), shingles(text, maps[b])
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            worst = max(worst, jac)
            tot += jac
            n += 1
    if worst >= 0.3:
        raise SystemExit(f"sampled cross-mapping 3-gram Jaccard {worst:.2f} >= 0.3")
    print(f"text maps: {len(maps)} distinct, min letter-diff {min_diff}, "
          f"sampled shingle Jaccard mean {tot / max(n, 1):.4f} max {worst:.4f}")
    return min_diff, worst


def _patterns(con, keys, dim):
    """hash(k:i)%2 flip patterns as ints, MSB = coordinate 0 — computed IN
    duckdb, the engine that writes the corpus, so they match the SQL."""
    rows = con.execute(
        "SELECT r, list(CASE WHEN hash(CAST(r AS VARCHAR) || ':' || CAST(i AS VARCHAR)) % 2 = 1 "
        "THEN 1 ELSE 0 END ORDER BY i) "
        f"FROM (SELECT unnest({list(keys)}) AS r), (SELECT unnest(range({dim})) AS i) "
        "GROUP BY r").fetchall()
    return {r: int("".join(map(str, bits)), 2) for r, bits in rows}


def select_flip_keys(con, src, n):
    """Greedily pick `n`+1 hash keys (replicas 0..n-1 plus the increment's)
    whose pairwise flip patterns keep every same-base cosine under 0.90 on
    the ACTUAL source vectors. At n=100 the identity keys (k=r) pass the
    audit outright; near n=1000 the birthday effect produces close pattern
    pairs (measured: a pair at same-base cosine 0.947), so keys are drawn
    from a larger candidate space and close candidates are rejected
    against the real mass distribution, not a Hamming proxy."""
    dim = con.execute(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    cand = list(range(8 * n))
    pat = _patterns(con, cand, dim)
    vecs = [r[0] for r in con.execute(
        f"SELECT CAST(embedding AS DOUBLE[]) FROM '{src}/embeddings.parquet'"
    ).fetchall()]
    sq = [[x * x for x in v] for v in vecs]
    norms = [sum(s) for s in sq]

    def worst_cos(x):
        s_idx = [i for i in range(dim) if (x >> (dim - 1 - i)) & 1]
        w = -1.0
        for s, nrm in zip(sq, norms):
            if nrm > 0:
                w = max(w, 1.0 - 2.0 * sum(s[i] for i in s_idx) / nrm)
        return w

    picked = []
    for k in cand:
        ok = True
        for j in picked:
            x = pat[k] ^ pat[j]
            if x == 0 or (x.bit_count() < 24 and worst_cos(x) >= 0.90):
                ok = False
                break
        if ok:
            picked.append(k)
            if len(picked) == n + 1:
                return picked
    raise SystemExit(f"could not select {n + 1} flip keys from {len(cand)} candidates")


def check_sign_patterns(con, src, keys):
    """Pairwise-distinct flip patterns + worst same-base cosine for any
    close pair, over the ACTUAL source vectors. `keys` = the replica flip
    keys in use, increment's last."""
    dim = con.execute(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    pat = _patterns(con, keys, dim)
    ints = [pat[k] for k in keys]
    if len(set(ints)) != len(ints):
        raise SystemExit("sign patterns collide")
    min_d, close = dim, []
    for i in range(len(ints)):
        for j in range(i + 1, len(ints)):
            d = (ints[i] ^ ints[j]).bit_count()
            min_d = min(min_d, d)
            if d < 20:
                close.append((keys[i], keys[j], ints[i] ^ ints[j]))
    worst_cos = -1.0
    if close:
        vecs = [r[0] for r in con.execute(
            f"SELECT CAST(embedding AS DOUBLE[]) FROM '{src}/embeddings.parquet'"
        ).fetchall()]
        sq = [[x * x for x in v] for v in vecs]
        norms = [sum(s) for s in sq]
        for _, _, x in close:
            s_idx = [i for i in range(dim) if (x >> (dim - 1 - i)) & 1]
            for s, nrm in zip(sq, norms):
                if nrm <= 0:
                    continue
                cos = 1.0 - 2.0 * sum(s[i] for i in s_idx) / nrm
                worst_cos = max(worst_cos, cos)
        if worst_cos >= 0.93:
            raise SystemExit(
                f"close sign-pattern pair reaches same-base cosine {worst_cos:.3f} >= 0.93")
    tail = (f"{len(close)} close pairs, worst close-pair cosine {worst_cos:.3f}"
            if close else "0 close pairs")
    print(f"sign patterns: {len(ints)} distinct, min disagreement {min_d}/{dim}, {tail}")
    return min_d


def main():
    src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    if reps > 1000:
        raise SystemExit("reps must be <= 1000 (distinct letter-mapping triples)")
    big = reps > 100
    inc_id_offset = BIG_INC_ID_OFFSET if big else INC_ID_OFFSET
    plant_offset = BIG_PLANT_OFFSET if big else PLANT_OFFSET
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    check_text_maps(con, src, reps)
    # reps <= 100: identity keys (k = r, increment 999 — the historical
    # layout, byte-identical output). Past that the birthday effect makes
    # identity keys collide in cosine (measured 0.947 at reps = 1000), so
    # keys are greedily selected against the real vectors.
    if big:
        flip_keys = select_flip_keys(con, src, reps)
    else:
        flip_keys = list(range(reps)) + [INC_FLIP_R]
    inc_flip_r = flip_keys[reps]
    check_sign_patterns(con, src, flip_keys)

    def doc_select(r):
        m3, m1, m2 = text_maps(r)
        return (
            f"SELECT doc_id + {r} * {ID_STRIDE} AS doc_id, "
            f"translate(translate(translate(text, '{L3}', '{m3}'), '{L1}', '{m1}'), '{L2}', '{m2}') AS text, "
            f"lang, source, n_chars "
            f"FROM '{src}/documents.parquet'"
        )

    def emb_select(r):
        return (
            f"SELECT vec_id + {r} * {ID_STRIDE} AS vec_id, "
            f"{flip('embedding', flip_keys[r])} AS embedding "
            f"FROM '{src}/embeddings.parquet'"
        )

    # chunked staging: a single 1000-branch UNION ALL parses fine but peaks
    # memory; 100-branch inserts keep the working set flat
    def staged_copy(select_fn, out):
        con.execute("DROP TABLE IF EXISTS stage")
        first = True
        for lo in range(0, reps, 100):
            sql = "\nUNION ALL\n".join(
                select_fn(r) for r in range(lo, min(lo + 100, reps)))
            if first:
                con.execute(f"CREATE TABLE stage AS {sql}")
                first = False
            else:
                con.execute(f"INSERT INTO stage {sql}")
        con.execute(f"COPY stage TO '{out}' (FORMAT PARQUET)")
        con.execute("DROP TABLE stage")

    staged_copy(doc_select, f"{dst}/corpus_documents.parquet")
    staged_copy(emb_select, f"{dst}/corpus_embeddings.parquet")

    # the increment is IDENTICAL whatever `reps` is (within a layout mode),
    # and its transforms (letter REVERSALS — never a rotation composition —
    # and the fixed inc_flip_r sign pattern) are distinct from every
    # replica's BY THE CHECKS ABOVE, so the same fixed-size day probes
    # standing corpora of any scale
    inc_docs = (
        f"SELECT doc_id + {inc_id_offset} AS doc_id, "
        f"translate(translate(text, '{L1}', '{L1[::-1]}'), '{L2}', '{L2[::-1]}') AS text, "
        f"lang, source, n_chars "
        f"FROM '{src}/documents.parquet'"
    )
    inc_embs = (
        f"SELECT vec_id + {inc_id_offset} AS vec_id, "
        f"{flip('embedding', inc_flip_r)} AS embedding "
        f"FROM '{src}/embeddings.parquet'"
    )
    con.execute(f"COPY ({inc_docs}) TO '{dst}/inc_documents.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY ({inc_embs}) TO '{dst}/inc_embeddings.parquet' (FORMAT PARQUET)")
    with open(f"{dst}/meta.json", "w") as f:
        json.dump({"id_stride": ID_STRIDE, "inc_id_offset": inc_id_offset,
                   "plant_offset": plant_offset, "reps": reps,
                   "inc_flip_r": inc_flip_r}, f)
    n = con.execute(f"SELECT COUNT(*) FROM '{dst}/corpus_documents.parquet'").fetchone()[0]
    m = con.execute(f"SELECT COUNT(*) FROM '{dst}/corpus_embeddings.parquet'").fetchone()[0]
    print(f"corpus: {n} docs, {m} embeddings; increment: 1 replica")


if __name__ == "__main__":
    main()
