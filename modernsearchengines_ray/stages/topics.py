"""Topic modelling (reference T4/A13-A14, topic.py).

The reference fits sklearn ``TfidfVectorizer(max_df=0.6, min_df=3,
max_features=1000)`` + ``LatentDirichletAllocation(n_components=11,
random_state=42)`` on the whole corpus in one process (topic.py:28-34),
then assigns each doc its top-3 topics (argsort of the LDA doc-topic
distribution, topic.py:63-74) and maps ids to hand-picked descriptor
strings (topic.py:138-150).

Rebuild shape (sklearn/NLTK/scipy are not in this container — the
needed pieces are reimplemented from their published formulas):

- fit: DRIVER-SIDE on a corpus sample — model fitting is a small-data
  problem once the corpus is reduced to a (sample_docs x <=1000 terms)
  matrix; the distributed work is the reduction, not the solver
  (SURVEY.md §2.5 A13);
- transform: an ACTOR-POOL ``map_batches`` stage — the fitted model
  ships once into the actor constructor and each actor holds it for
  its lifetime (T4);
- LDA solver: standard batch variational Bayes (Blei et al. 2003;
  Hoffman et al. 2010 update equations), fixed seed + iteration count
  so assignments are deterministic; digamma via the standard
  recurrence + asymptotic series.

Preprocessing divergence: the reference lowercases via NLTK
word_tokenize + WordNet lemmatization (M20, topic.py:9-14); here the
vectorizer tokenizes with sklearn's default pattern and skips
lemmatization.  The capability contract (per-doc top-3 topic ids over
an 11-topic TF-IDF LDA + descriptor mapping) is unchanged.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

#: reference topic.py:138-150 — hand-picked descriptor per topic id
TOPIC_DESCRIPTORS = {
    0: "clinical", 1: "event", 2: "University", 3: "articles",
    4: "restaurants", 5: "journal", 6: "German", 7: "music",
    8: "overview", 9: "knowledge", 10: "heritage",
}

_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")


def digamma(x: np.ndarray) -> np.ndarray:
    """ψ(x) for x > 0: recurrence up past 6, then asymptotic series."""
    x = np.asarray(x, dtype=np.float64)
    result = np.zeros_like(x)
    y = x.copy()
    while True:
        small = y < 6.0
        if not small.any():
            break
        result[small] -= 1.0 / y[small]
        y[small] += 1.0
    inv = 1.0 / y
    inv2 = inv * inv
    result += (np.log(y) - 0.5 * inv
               - inv2 * (1.0 / 12 - inv2 * (1.0 / 120 - inv2 / 252)))
    return result


class TfidfModel:
    """sklearn-formula TF-IDF with max_df / min_df / max_features."""

    def __init__(self, vocab: dict[str, int], idf: np.ndarray):
        self.vocab = vocab
        self.idf = idf

    @classmethod
    def fit(cls, docs: list[str], max_df: float = 0.6, min_df: int = 3,
            max_features: int = 1000) -> "TfidfModel":
        n = len(docs)
        df: dict[str, int] = {}
        for doc in docs:
            for t in set(_TOKEN_RE.findall(doc.lower())):
                df[t] = df.get(t, 0) + 1
        kept = {t: c for t, c in df.items()
                if c >= min_df and c <= max_df * n}
        # sklearn keeps the max_features highest-df terms (ties: alpha)
        top = sorted(kept, key=lambda t: (-kept[t], t))[:max_features]
        vocab = {t: i for i, t in enumerate(sorted(top))}
        idf = np.array(
            [np.log((1.0 + n) / (1.0 + kept[t])) + 1.0 for t in sorted(top)]
        )
        return cls(vocab, idf)

    def transform(self, docs: list[str]) -> np.ndarray:
        n, v = len(docs), len(self.vocab)
        mat = np.zeros((n, v))
        for i, doc in enumerate(docs):
            for t in _TOKEN_RE.findall(doc.lower()):
                j = self.vocab.get(t)
                if j is not None:
                    mat[i, j] += 1.0
        mat *= self.idf[None, :]
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return mat / norms


class LdaModel:
    """Batch variational Bayes LDA (seeded, fixed iterations)."""

    def __init__(self, components: np.ndarray, alpha: float):
        self.components = components          # topics x vocab (λ)
        self.alpha = alpha
        self._exp_beta = self._expect_beta()

    def _expect_beta(self) -> np.ndarray:
        lam = self.components
        return np.exp(digamma(lam) - digamma(lam.sum(axis=1, keepdims=True)))

    @classmethod
    def fit(cls, mat: np.ndarray, n_components: int = 11, seed: int = 42,
            iters: int = 30, doc_iters: int = 20) -> "LdaModel":
        n_docs, vocab = mat.shape
        alpha = 1.0 / n_components
        eta = 1.0 / n_components
        rng = np.random.RandomState(seed)
        lam = rng.gamma(100.0, 1.0 / 100.0, (n_components, vocab))
        model = cls(lam, alpha)
        for _ in range(iters):
            _, sstats = model._e_step(mat, doc_iters)
            # Hoffman et al. 2010 M-step: λ = η + sstats ⊙ E[exp β]
            model.components = eta + sstats * model._exp_beta
            model._exp_beta = model._expect_beta()
        return model

    def _e_step(self, mat: np.ndarray, doc_iters: int):
        n_docs = mat.shape[0]
        k = self.components.shape[0]
        gamma = np.ones((n_docs, k))
        exp_beta = self._exp_beta
        sstats = np.zeros_like(self.components)
        for d in range(n_docs):
            counts = mat[d]
            idx = np.flatnonzero(counts)
            if len(idx) == 0:
                continue
            cts = counts[idx]
            betad = exp_beta[:, idx]
            gammad = gamma[d]
            for _ in range(doc_iters):
                exp_theta = np.exp(
                    digamma(gammad) - digamma(gammad.sum())
                )
                phinorm = exp_theta @ betad + 1e-100
                gammad = self.alpha + exp_theta * (
                    (cts / phinorm) @ betad.T
                )
            gamma[d] = gammad
            exp_theta = np.exp(digamma(gammad) - digamma(gammad.sum()))
            phinorm = exp_theta @ betad + 1e-100
            sstats[:, idx] += np.outer(exp_theta, cts / phinorm)
        return gamma, sstats

    def transform(self, mat: np.ndarray, doc_iters: int = 20) -> np.ndarray:
        """Doc-topic distributions (normalized gamma)."""
        gamma, _ = self._e_step(mat, doc_iters)
        return gamma / gamma.sum(axis=1, keepdims=True)


def top_topics(dist: np.ndarray, k: int = 3) -> list[list[int]]:
    """Reference topic.py:67: top-3 ids by (-dist).argsort()."""
    return [(-row).argsort()[:k].tolist() for row in dist]


def topic_top_words(tfidf: "TfidfModel", lda: "LdaModel",
                    num_words: int = 15) -> dict[int, list[str]]:
    """Top words per topic (reference K7, topic.py:87-106 print_topics):
    each vocabulary word is assigned to the topic where its component
    weight is highest (argmax over the topic axis), then each topic's
    words sort by weight descending — ties keep vocabulary (alphabetic)
    order, matching the reference's stable sort over feature_names."""
    feature_names = sorted(tfidf.vocab, key=tfidf.vocab.get)
    owner = lda.components.argmax(axis=0)
    out: dict[int, list[str]] = {t: [] for t in range(lda.components.shape[0])}
    for t in out:
        idx = np.flatnonzero(owner == t)
        order = np.argsort(-lda.components[t, idx], kind="stable")
        out[t] = [feature_names[i] for i in idx[order][:num_words]]
    return out


class TopicModel:
    """TF-IDF + LDA bundle with the reference's parameters."""

    def __init__(self, tfidf: TfidfModel, lda: LdaModel):
        self.tfidf = tfidf
        self.lda = lda

    @classmethod
    def fit(cls, docs: list[str], n_components: int = 11,
            seed: int = 42) -> "TopicModel":
        tfidf = TfidfModel.fit(docs)
        lda = LdaModel.fit(tfidf.transform(docs), n_components, seed)
        return cls(tfidf, lda)

    def assign(self, docs: list[str], k: int = 3) -> list[list[int]]:
        return top_topics(self.lda.transform(self.tfidf.transform(docs)), k)


class TopicAssign:
    """Actor-pool batch fn: text -> top-3 topic ids + descriptors.

    The fitted model arrives via the constructor (once per actor — T4);
    per batch is vectorize + transform + argsort."""

    def __init__(self, model: TopicModel,
                 descriptors: dict[int, str] | None = None):
        self.model = model
        self.descriptors = descriptors or TOPIC_DESCRIPTORS

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        tops = self.model.assign(texts)
        return pa.table({
            "doc_id": batch["doc_id"],
            "topics": pa.array(tops, pa.list_(pa.int32())),
            "topic_descriptors": pa.array(
                [[self.descriptors.get(t, str(t)) for t in row]
                 for row in tops],
                pa.list_(pa.string()),
            ),
        })


def assign_topics(ds, sample_size: int = 2000, n_components: int = 11,
                  seed: int = 42, concurrency=2):
    """corpus(doc_id, text) -> (doc_id, topics, topic_descriptors).

    Fit on a driver-side sample (A13), transform distributed (A14)."""
    sample = ds.limit(sample_size).select_columns(["text"]) \
        .to_pandas()["text"].tolist()
    model = TopicModel.fit(sample, n_components=n_components, seed=seed)
    return ds.map_batches(
        TopicAssign,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={"model": model},
    )
