"""Typed configuration for the engine.

The reference hard-codes these as scattered constants; we lift them into
frozen dataclasses (SURVEY.md §2.10).  Values are the reference's own:

- BM25 k1/b:              /root/reference/indexing.py:163-164
- doc char cap + chunk:   /root/reference/indexing.py:131,193
- df prune (keep df > 5): /root/reference/indexing.py:236-237
- ranking weights, boost: /root/reference/retrieval.py:218,233-256
- blend alpha:            /root/reference/retrieval.py:218,271
- tuebingen_terms:        /root/reference/retrieval.py:25
- result sizes:           /root/reference/retrieval.py:275,329,414
"""

from __future__ import annotations

from dataclasses import dataclass, field


#: Reference retrieval.py:25 — location terms that trigger boosting.
TUEBINGEN_TERMS: tuple[str, ...] = (
    "tuebingen", "tuebing", "hohentuebingen", "waldhaeus", "oesterberg",
    "derendingen", "derending", "lustnau", "lustnauer", "pfrondorf",
    "wilhelmstr", "wilhelmstrass", "72070", "72072", "72074", "72076",
)


@dataclass(frozen=True)
class IndexConfig:
    """Parameters of index construction."""

    k1: float = 1.5
    b: float = 0.75
    #: docs longer than this many chars are skipped at index time but still
    #: counted in num_documents and the avg_doc_len denominator
    #: (reference indexing.py:183,193-200).
    max_doc_chars: int = 800_000
    #: tokenizer chunk size; token char offsets restart per chunk
    #: (reference indexing.py:126-135).
    chunk_chars: int = 800_000
    #: terms with document frequency <= min_df_exclusive are pruned at
    #: persist time (reference indexing.py:236-237: ``len(doc_dict) <= 5``).
    min_df_exclusive: int = 5
    #: number of hash(term) index shards; the one wide shuffle keys on this.
    num_shards: int = 16
    #: postings per block for block-max metadata (WAND pruning).
    block_size: int = 128
    #: prepend comma-separated url words to the document text before
    #: tokenizing (reference indexing.py:195). Off for inputs with no url.
    prepend_url_words: bool = True
    #: surface-form -> lemma lookup applied between the stopword drop
    #: and Porter stemming (the reference's spaCy lemma position,
    #: indexing.py:148-151).  None = identity (round-1 semantics);
    #: functions/lemma.py ships a vendored irregular-forms table and a
    #: loader for the published spacy-lookups-data English table.
    #: Must match the table the query side uses (QueryEngine).
    lemma_table: dict[str, str] | None = field(default=None, hash=False)
    #: parquet row-group size for shard files.  None (default) keeps
    #: pyarrow's whole-table grouping — byte-stable output, right for
    #: eager scorers.  Set (e.g. 256) when serving with
    #: ``ShardScorer(lazy_shards=True)`` so a query touches only the
    #: row groups of its terms instead of paging the whole shard in.
    shard_row_group_size: int | None = None


@dataclass(frozen=True)
class RankConfig:
    """Parameters of the ranking path (reference retrieval.py:218-275)."""

    alpha: float = 0.8                    # blend: alpha*combined + (1-alpha)*proximity
    tueb_boost: float = 100.0             # retrieval.py:255-256
    w_original: float = 6.0               # original non-Tü term bm25 weight
    c_original: float = 1.0               # original non-Tü match credit
    w_original_tueb: float = 0.5
    c_original_tueb: float = 0.2
    w_expansion: float = 4.0
    c_expansion: float = 0.5
    w_expansion_tueb: float = 0.5
    c_expansion_tueb: float = 0.0
    top_k: int = 100                      # batch output size (retrieval.py:275,329)
    tuebingen_terms: tuple[str, ...] = field(default=TUEBINGEN_TERMS)


DEFAULT_INDEX_CONFIG = IndexConfig()
DEFAULT_RANK_CONFIG = RankConfig()
