#!/usr/bin/env python3
"""Deterministic N-times-sf0.1 documents/embeddings set for scale-trend
measurement (VERDICT r7 item 5). Mimics the driver's sf0.1 distributions
(measured from /root/testdata/sf0.1): 30-word uniform vocab, text lengths
~44-577 chars, ~0.16% exact-duplicate rows, ~5% docs in 'dup'-marked
near-duplicate families, 5 langs (en-dominant), 20 sources; embeddings
unit-normalized 64-dim float with a weak 10-label tilt. Seed fixed at
1042 so every run reproduces byte-identical parquet.

Usage: gen_scale_docs.py <outdir> [scale=10] [mode=heaps]
Modes: heaps (DEFAULT — production-shaped Heaps/Zipf vocabulary, the
round-over-round scale receipt), uniform (fixed 30-word vocab — the
deliberately ADVERSARIAL shingle-density probe; expect q_c3's n²
candidate class), skew, skewchunk (heavy-tail length fixtures).
Scale sessions should pair the heaps fixture with the memo budget its
own working-set warning prescribes (4 GB at scale 30:
SPARK_GRAFT_EXTRA_OPTS="-Dspark.graft.memo.maxBytes=4294967296").
Writes <outdir>/documents.parquet and <outdir>/embeddings.parquet with
scale * (5000 docs, 2000 vectors). Other tables should be symlinked from
sf0.1 (only documents/embeddings feed the heavy-five queries).

Vocabulary grows as 30·sqrt(scale) (Heaps'-law-ish): with the fixture's
FIXED 30-word vocab, 10x more docs makes every 3-word shingle ~10x more
common and shared-shingle candidate PAIRS grow ~100x per shingle — a
fixture artifact, not operator behavior (real corpora add vocabulary as
they grow, keeping shingle density roughly stable). The synthetic extra
words (w030, w031, ...) keep per-shingle document frequency comparable
to sf0.1 so the measured exponent reflects the operator's scaling on a
realistic corpus, with candidate growth called out separately.
"""
import os
import sys

import numpy as np
import pyarrow as pa

from pq_write import write_split

VOCAB = ("spark window merge table column vector stream value data small "
         "join filter big group hash customer sort order slow line part "
         "fast the row agg key query a scan batch").split()
LANGS = ["en"] * 16 + ["de", "fr", "es", "zh"]
SEED = 1042


def _finish_documents(texts, n, rng, vocab):
    """Shared tail of both modes: near-dup families, exact dups, labels."""
    # ~5% near-dup families: overwrite runs of 5 docs with one base text
    # plus small per-member edits, marked with the 'dup' token like sf0.1
    n_fam = n // 100
    fam_starts = rng.choice(n - 5, size=n_fam, replace=False)
    for s in fam_starts:
        base = texts[s].split()
        for k in range(1, 5):
            t = list(base)
            for _ in range(1 + int(rng.integers(0, 3))):
                t[int(rng.integers(0, len(t)))] = vocab[int(rng.integers(0, len(vocab)))]
            t.append("dup")
            texts[s + k] = " ".join(t)
    # ~0.16% exact dups
    for _ in range(max(1, n // 625)):
        a, b = rng.integers(0, n, size=2)
        texts[int(a)] = texts[int(b)]
    lang = [LANGS[int(i)] for i in rng.integers(0, len(LANGS), size=n)]
    source = [f"src{int(i)}" for i in rng.integers(0, 20, size=n)]
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(lang),
        "source": pa.array(source),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })


def gen_documents(n, rng, scale):
    vocab = VOCAB + [f"w{k:03d}" for k in
                     range(len(VOCAB), int(len(VOCAB) * scale ** 0.5))]
    texts = []
    target_words = rng.integers(8, 100, size=n)
    for i in range(n):
        words = rng.integers(0, len(vocab), size=target_words[i])
        texts.append(" ".join(vocab[w] for w in words))
    return _finish_documents(texts, n, rng, vocab)


def gen_documents_heaps(n, rng, scale):
    """Heaps-law mode (VERDICT r14 item 4): vocabulary grows as
    V = 2000 * scale^0.7 (a realistic Heaps exponent) and word
    frequencies follow a Zipf-Mandelbrot law over it (s = 1.07,
    q = 2.7), so gram/shingle document frequencies stay Heaps-governed
    as the corpus grows instead of densifying quadratically — the
    production-shaped fixture for the q_c3/q_c29 candidate-volume
    exponents (the uniform mode's fixed head vocabulary is the
    deliberately adversarial density case). Same near-dup family /
    exact-dup / label recipe as the uniform mode, so the TRUE duplicate
    density is identical across modes at every scale."""
    V = int(2000 * scale ** 0.7)
    vocab = [f"h{k:05d}" for k in range(V)]
    ranks = np.arange(1, V + 1, dtype=np.float64)
    p = 1.0 / (ranks + 2.7) ** 1.07
    p /= p.sum()
    target_words = rng.integers(8, 100, size=n)
    flat = rng.choice(V, size=int(target_words.sum()), p=p)
    bounds = np.cumsum(target_words)[:-1]
    texts = [" ".join(vocab[w] for w in chunk)
             for chunk in np.split(flat, bounds)]
    return _finish_documents(texts, n, rng, vocab)


def gen_documents_skew(n, rng, scale):
    """Heavy-tail length mode (round 20, q_c122/q_c124 robustness): most
    docs are 20-2000 tokens (Pareto alpha=1.2) with n/500 giants of
    20k-60k tokens — the "one book among tweets" shape that stresses
    size-aware shard dealing (the first deal round's intrinsic spread
    floors any block-local balancer; chunk-then-export is the
    documented answer, see gen_documents_skewchunk). Dense doc_ids."""
    lens = np.minimum((20 + rng.pareto(1.2, n) * 40).astype(int), 2000)
    giants = rng.choice(n, max(1, n // 500), replace=False)
    lens[giants] = rng.integers(20000, 60000, len(giants))
    texts = [("tok " * int(l)).strip() for l in lens]
    return _finish_documents(texts, n, rng, VOCAB)


def gen_documents_skewchunk(n, rng, scale):
    """The skew corpus AFTER context-window chunking (every unit <= 512
    tokens, same token mass) with SPARSE doc_ids (parent*1000 + chunk) —
    the fixture that caught the unrotated snake deal concentrating on
    shard 0 (PERF.md round 20: 16006 bp -> 159 bp after the blk-mod-S
    rotation). Gappy ids are realistic post-dedup; any assignment rule
    must not assume dense ids."""
    lens = np.minimum((20 + rng.pareto(1.2, n) * 40).astype(int), 2000)
    giants = rng.choice(n, max(1, n // 500), replace=False)
    lens[giants] = rng.integers(20000, 60000, len(giants))
    ids, texts = [], []
    for i, l in enumerate(lens):
        full, rem = divmod(int(l), 512)
        for j, p in enumerate([512] * full + ([rem] if rem else [])):
            ids.append(i * 1000 + j)
            texts.append(("tok " * p).strip())
    m = len(texts)
    lang = [LANGS[int(i)] for i in rng.integers(0, len(LANGS), size=m)]
    source = [f"src{int(i)}" for i in rng.integers(0, 20, size=m)]
    return pa.table({
        "doc_id": pa.array(np.array(ids, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(lang),
        "source": pa.array(source),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })


def gen_embeddings(n, rng):
    dim, n_labels = 64, 10
    centroids = rng.standard_normal((n_labels, dim)).astype(np.float32) * 0.08
    labels = rng.integers(0, n_labels, size=n).astype(np.int32)
    vecs = rng.standard_normal((n, dim)).astype(np.float32) * 0.125 + centroids[labels]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs.astype(np.float32))),
        "label": pa.array(labels),
    })


def main():
    outdir = sys.argv[1]
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # heaps is the DEFAULT since round 18: production-shaped vocabulary
    # growth (the comparable round-over-round receipt); the fixed-vocab
    # uniform mode is the documented ADVERSARIAL density probe (q_c3's
    # disk-full class) and must be asked for explicitly
    mode = sys.argv[3] if len(sys.argv) > 3 else "heaps"
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    gen = {"uniform": gen_documents, "heaps": gen_documents_heaps,
           "skew": gen_documents_skew, "skewchunk": gen_documents_skewchunk}[mode]
    docs = gen(5000 * scale, rng, scale)
    emb = gen_embeddings(2000 * scale, rng)
    # write_split (shared helper, pq_write.py) bounds the row groups and
    # asserts the layout is splittable — the unsplittable single-group
    # trap that serialized every map-only sweep stage onto one task
    write_split(docs, os.path.join(outdir, "documents.parquet"))
    write_split(emb, os.path.join(outdir, "embeddings.parquet"))
    print(f"wrote {docs.num_rows} documents, {emb.num_rows} embeddings to {outdir}")


if __name__ == "__main__":
    main()
