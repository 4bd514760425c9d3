"""modernsearchengines_ray — a Ray-Data-native full-text indexing + BM25 retrieval engine.

A brand-new engine with the query / data-processing capabilities of the
SelinaUecker/ModernSearchEngines reference (crawler corpus -> positional
inverted index -> BM25 + proximity ranking), re-expressed as idiomatic
`ray.data.Dataset` pipelines:

- HTML -> text extraction and tokenization as `map_batches` stages over
  zero-copy Arrow batches (stateful tokenizers as actor pools),
- posting-list construction via a hash(term)-sharded `groupby` shuffle
  emitting delta-encoded varint-compressed postings with per-block
  max-score metadata,
- query serving via an actor pool of index-shard BM25 scorers whose
  merged result is rank-identical to the reference's logical ranking
  path on the fixture query set.

Layout:
  functions/  pure, deterministic per-row/per-value kernels (no Ray)
  sources/    dataset readers / fixture helpers
  stages/     Ray Data map_batches / groupby stages (Dataset -> Dataset)
  pipelines/  end-to-end pipelines (index build, query serving, corpus prep)
  state/      shard layout, manifests / checkpoints
  oracle/     vendored pure-Python oracle replicating the reference's
              logical semantics for conformance tests

No module in this package calls ray.init()/ray.shutdown(); sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
