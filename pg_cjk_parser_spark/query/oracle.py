"""Brute-force BM25 oracle: rank ground truth for the index engine.

Scores every document with the same kernel + formula, no index, no
Spark.  Tests assert the distributed engine is rank- and
score-identical against this.
"""

from __future__ import annotations


from ..kernel.tokenizer import lexemes
from ..kernel.tsvector import ts_match
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
    n_docs = len(docs)
    doc_stats = []  # (docid, doclen, {term: positions})
    df = {t: 0 for t in pq.terms}
    total_tf = 0
    for docid, text in docs:
        lex = lexemes(text or "")
        total_tf += len(lex)
        counts: dict[str, list[int]] = {}
        for term, pos in lex:
            counts.setdefault(term, []).append(pos)
        tmap = {t: counts[t] for t in pq.all_terms if t in counts}
        for t in pq.terms:
            if t in tmap:
                df[t] += 1
        doc_stats.append((docid, len(lex), tmap))
    avgdl = total_tf / max(n_docs, 1)
    idf_map = {t: idf(n_docs, df[t]) for t in pq.terms}

    results = []
    for docid, dl, tmap in doc_stats:
        if not ts_match(tmap, pq.tree):
            continue
        score = 0.0
        for t in pq.terms:
            if t in tmap:
                tf = len(tmap[t])
                score += idf_map[t] * tf / (tf + k1 * (1 - b + b * dl / avgdl))
        if score > 0:
            results.append((docid, round(score, 6)))
    results.sort(key=lambda r: (-r[1], r[0]))
    return results[:k]
