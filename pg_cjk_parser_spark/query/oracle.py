"""Brute-force BM25 oracle: rank ground truth for the index engine.

Scores every document with the same kernel + formula, no index, no
Spark.  Tests assert the distributed engine is rank- and
score-identical against this.
"""

from __future__ import annotations

import math

from ..kernel.tokenizer import lexemes
from .topk import idf, parse_query


def brute_force_topk(
    docs: list[tuple[int, str]],
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    mode: str = "plain",
) -> list[tuple[int, float]]:
    pq = parse_query(query, mode)
    if not pq.terms:
        return []
    # corpus pass: per-doc term stats
    n_docs = len(docs)
    doc_stats = []  # (docid, doclen, {term: (tf, positions)})
    df = {t: 0 for t in pq.terms}
    total_tf = 0
    for docid, text in docs:
        lex = lexemes(text or "")
        total_tf += len(lex)
        tmap: dict[str, tuple[int, list[int]]] = {}
        counts: dict[str, list[int]] = {}
        for term, pos in lex:
            counts.setdefault(term, []).append(pos)
        for t in pq.terms:
            if t in counts:
                df[t] += 1
                tmap[t] = (len(counts[t]), counts[t])
        doc_stats.append((docid, len(lex), tmap))
    avgdl = total_tf / max(n_docs, 1)
    idf_map = {t: idf(n_docs, df[t]) for t in pq.terms}

    results = []
    for docid, dl, tmap in doc_stats:
        if pq.conjunctive and any(t not in tmap for t in pq.terms):
            continue
        if not tmap:
            continue
        if pq.phrases and not all(
            _phrase_in(chain, tmap) for chain in pq.phrases
        ):
            continue
        score = 0.0
        for t in pq.terms:
            if t in tmap:
                tf = tmap[t][0]
                score += idf_map[t] * tf / (tf + k1 * (1 - b + b * dl / avgdl))
        if score > 0:
            results.append((docid, round(score, 6)))
    results.sort(key=lambda r: (-r[1], r[0]))
    return results[:k]


def _phrase_in(chain, tmap) -> bool:
    first_t, first_off = chain[0]
    if first_t not in tmap:
        return False
    possets = {}
    for t, _ in chain:
        if t not in tmap:
            return False
        possets[t] = set(tmap[t][1])
    for p in tmap[first_t][1]:
        base = p - first_off
        if all(base + off in possets[t] for t, off in chain):
            return True
    return False
