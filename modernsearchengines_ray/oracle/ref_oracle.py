"""Vendored oracle: the reference's *logical* index + ranking path, sequential.

This module replicates, in plain single-process Python, the semantics of:

- ``Index_with_position`` in-memory build (/root/reference/indexing.py:173-222):
  skip >800k-char docs (still counted in N; their chars excluded from the
  avg numerator — indexing.py:193-200), url-words prefix (indexing.py:195),
  positional postings, df/idf/BM25 with the chars-vs-tokens length-norm
  quirk (indexing.py:167,197,208);
- the df<=5 persist-time prune (indexing.py:236-237), applied to the
  *logical* index (the SQLite surrogate-key join bug at retrieval.py:44-49
  is deliberately NOT replicated — SURVEY.md §2.4 J1: the logical path is
  the conformance target);
- ``get_relevant_lemmas``'s min-max BM25 normalization over every posting
  fetched for the query (retrieval.py:27-70);
- ``query_processing`` (retrieval.py:146-175) with the BERT synonym stage
  frozen to a recorded table (FIXTURES.md §3) and set iteration
  de-randomized by sorting (SURVEY.md §7 hard part 5 — scores are
  order-independent);
- ``rank_documents`` weighted accumulation, Tübingen boost, log1p
  combine, the three normalizations, proximity, alpha-blend, top-100
  (retrieval.py:218-294).

The oracle shares the tokenizer/stemmer/proximity kernels with the
engine (single source of truth for per-value semantics); what the
conformance tests exercise against it is the distributed plumbing:
sharded posting construction, compression round-trip, actor-pool
serving, and the merge.
"""

from __future__ import annotations

import math
import string
from collections import defaultdict

from ..config import DEFAULT_INDEX_CONFIG, DEFAULT_RANK_CONFIG, IndexConfig, RankConfig
from ..functions.bm25 import bm25_score, idf as idf_fn
from ..functions.proximity import calculate_proximity_score
from ..functions.stopwords import STOPWORDS
from ..functions.textnorm import url_to_comma_separated_words
from ..functions.tokenizer import tokenize

_PUNCT = set(string.punctuation)

#: retrieval.py:126 — always filtered on the first pass
_WORDS_TO_FILTER = frozenset(
    {"good", "nice", "okay", "sensible", "popular", "frequented",
     "recommend", "recommended", "competent"}
)
#: retrieval.py:156-157 — terms never synonym-expanded
_EXPANSION_FILTERED = frozenset(
    {"tübingen", "good", "nice", "okay", "sensible", "popular", "frequented",
     "recommend", "recommended", "competent", "renowned", "bad",
     "unpleasant", "pleasant"}
)


class OracleIndex:
    def __init__(self) -> None:
        # lemma -> doc_id -> [bm25, [positions]]
        self.index: dict[str, dict[int, list]] = {}
        self.document_lengths: dict[int, int] = {}
        self.num_documents = 0
        self.avg_doc_len = 0.0


def build_oracle_index(
    corpus: list[tuple],
    cfg: IndexConfig = DEFAULT_INDEX_CONFIG,
    apply_df_prune: bool = True,
) -> OracleIndex:
    """corpus rows: (doc_id, url, name, text).  url may be '' (no prefix)."""
    oi = OracleIndex()
    oi.num_documents = len(corpus)
    index: dict[str, dict[int, list]] = defaultdict(dict)
    char_sum = 0

    for doc_id, url, _name, doc in corpus:
        if len(doc) > cfg.max_doc_chars:
            continue
        if cfg.prepend_url_words and url:
            text = url_to_comma_separated_words(url) + " " + doc
        else:
            text = doc
        tokens = tokenize(text, chunk_chars=cfg.chunk_chars,
                          lemma_table=cfg.lemma_table)
        oi.document_lengths[doc_id] = len(tokens)
        for lemma, position in tokens:
            index[lemma].setdefault(doc_id, [0.0, []])[1].append(position)
        char_sum += len(text)

    oi.avg_doc_len = char_sum / oi.num_documents if oi.num_documents else 0.0

    for lemma, doc_dict in index.items():
        df = len(doc_dict)
        lemma_idf = float(idf_fn(oi.num_documents, df))
        for doc_id, entry in doc_dict.items():
            tf = len(entry[1])
            entry[0] = float(
                bm25_score(lemma_idf, tf, oi.document_lengths[doc_id],
                           oi.avg_doc_len, cfg.k1, cfg.b)
            )

    if apply_df_prune:
        index = {
            lemma: docs for lemma, docs in index.items()
            if len(docs) > cfg.min_df_exclusive
        }
    oi.index = dict(index)
    return oi


def _remove_stopwords_and_punctuation(text: str) -> str:
    """retrieval.py:120-144, with sorted (deterministic) set join."""
    words = text.split()
    filtered = {
        w.lower().strip(string.punctuation)
        for w in words
        if w.lower() not in STOPWORDS and w not in _PUNCT and w.lower()
    }
    better = {w for w in filtered if w not in _WORDS_TO_FILTER}
    return " ".join(sorted(filtered)) if not better else " ".join(sorted(better))


def oracle_query_processing(
    query: str,
    synonyms_table: dict[str, list[str]] | None = None,
    rank_cfg: RankConfig = DEFAULT_RANK_CONFIG,
    lemma_table: dict[str, str] | None = None,
) -> tuple[list[tuple[str, int]], str, list[str]]:
    """retrieval.py:146-175 with the synonym stage frozen to a table.

    ``lemma_table`` must match the index build's (IndexConfig.lemma_table)
    or query terms will miss their postings."""
    synonyms_table = synonyms_table or {}
    query = query.lower()
    query = _remove_stopwords_and_punctuation(query)
    words = query.split()
    original_len = len(words)
    words = words + list(rank_cfg.tuebingen_terms)
    extended_query = set(words)
    num_synonyms = max(0, 9 - original_len)

    if num_synonyms > 0:
        for word in words:
            if word in _EXPANSION_FILTERED or word in rank_cfg.tuebingen_terms:
                continue
            extended_query.update(synonyms_table.get(word, [])[:num_synonyms])

    extended = " ".join(sorted(extended_query))
    extended = _remove_stopwords_and_punctuation(extended)
    tokens = tokenize(extended, only_unique_tokens=True,
                      lemma_table=lemma_table)
    original_query = [t for t, _ in tokenize(query, only_unique_tokens=True,
                                             lemma_table=lemma_table)]
    return tokens, extended, original_query


def _get_relevant_lemmas(
    oi: OracleIndex, tokenized_query: list[tuple[str, int]]
) -> dict[str, dict[int, list]]:
    """retrieval.py:27-70 on the logical index: fetch + global min-max."""
    relevant: dict[str, dict[int, list]] = {}
    bm25_values: list[float] = []
    for lemma, _pos in tokenized_query:
        docs = oi.index.get(lemma)
        if docs is None:
            continue
        rel = relevant.setdefault(lemma, {})
        for doc_id, (bm25_value, positions) in docs.items():
            rel[doc_id] = [bm25_value, list(positions)]
            bm25_values.append(bm25_value)
    if bm25_values:
        lo, hi = min(bm25_values), max(bm25_values)
        if hi > lo:
            for docs in relevant.values():
                for entry in docs.values():
                    entry[0] = (entry[0] - lo) / (hi - lo)
    return relevant


def _normalize_scores(scores: dict[int, float]) -> dict[int, float]:
    if not scores:
        return {}
    lo = min(scores.values())
    hi = max(scores.values())
    if hi == lo:
        return {doc_id: 0.0 for doc_id in scores}
    return {d: (s - lo) / (hi - lo) for d, s in scores.items()}


def oracle_rank(
    oi: OracleIndex,
    tokenized_query: list[tuple[str, int]],
    original_query: list[str],
    rank_cfg: RankConfig = DEFAULT_RANK_CONFIG,
) -> list[tuple[int, float]]:
    """retrieval.py:218-275 verbatim semantics; returns [(doc_id, score)]."""
    index = _get_relevant_lemmas(oi, tokenized_query)
    tueb = set(rank_cfg.tuebingen_terms)
    doc_scores: dict[int, list] = defaultdict(lambda: [0.0, 0.0, []])
    include_tuebingen: set[int] = set()

    for lemma, _pos in tokenized_query:
        if lemma not in index:
            continue
        for doc_id, (bm25_value, positions) in index[lemma].items():
            if lemma in tueb:
                include_tuebingen.add(doc_id)
            if lemma in original_query:
                doc_scores[doc_id][2].append(positions)
                if lemma in tueb:
                    doc_scores[doc_id][0] += rank_cfg.w_original_tueb * bm25_value
                    doc_scores[doc_id][1] += rank_cfg.c_original_tueb
                else:
                    doc_scores[doc_id][0] += rank_cfg.w_original * bm25_value
                    doc_scores[doc_id][1] += rank_cfg.c_original
            else:
                if lemma in tueb:
                    doc_scores[doc_id][0] += rank_cfg.w_expansion_tueb * bm25_value
                    doc_scores[doc_id][1] += rank_cfg.c_expansion_tueb
                else:
                    doc_scores[doc_id][0] += rank_cfg.w_expansion * bm25_value
                    doc_scores[doc_id][1] += rank_cfg.c_expansion

    for doc_id in include_tuebingen:
        doc_scores[doc_id][0] += rank_cfg.tueb_boost

    combined = {d: s[0] * math.log1p(s[1]) for d, s in doc_scores.items()}
    norm_combined = _normalize_scores(combined)
    proximity = {
        d: calculate_proximity_score(doc_scores[d][2]) for d in doc_scores
    }
    norm_proximity = _normalize_scores(proximity)
    final = {
        d: rank_cfg.alpha * norm_combined[d]
        + (1 - rank_cfg.alpha) * norm_proximity[d]
        for d in norm_combined
    }
    # stable, deterministic order: score desc then doc_id asc (the
    # reference relies on dict insertion order for ties; we pin doc_id)
    ranked = sorted(final.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[: rank_cfg.top_k]


def oracle_search(
    oi: OracleIndex,
    query: str,
    synonyms_table: dict[str, list[str]] | None = None,
    rank_cfg: RankConfig = DEFAULT_RANK_CONFIG,
    lemma_table: dict[str, str] | None = None,
) -> list[tuple[int, float]]:
    tokens, _extended, original = oracle_query_processing(
        query, synonyms_table, rank_cfg, lemma_table
    )
    return oracle_rank(oi, tokens, original, rank_cfg)
