"""fulltextsearch_ray — a Ray-Data-native full-text indexing and search engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of PetroProtsyk/FullTextSearch: distributed inverted-index
construction over Parquet corpora via ``ray.data.Dataset`` pipelines,
Boolean (OR/AND), phrase (SEQ), wildcard (WILD) and fuzzy (EDIT) query
evaluation with exact reference match semantics, plus a BM25 top-k layer
and large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing).

Layout:
  tokenizer    — vectorized tokenizer (parity w/ reference BasicTokenizer)
  occurrences  — numpy kernels over (doc, field, token) occurrence triples
  codecs       — delta + varint posting-list compression kernels (numpy)
  parser       — the reference query language parser (OR/AND/SEQ/WORD/WILD/EDIT)
  matchers     — term-dictionary pattern matchers (exact/wildcard/edit-distance)
  dfa          — stack-based DFA matchers (dictionary ∩ automaton protocol)
  fst          — minimal byte-serialized FST term dictionary (opt-in)
  sources/     — corpus readers, schema normalization, deterministic doc ids
  stages/      — map_batches stage callables (tokenize/invert/stats)
  pipelines/   — build_index / search / bm25 dataset pipelines
  state/       — persistent index layout (segments, catalog, manifests)
  functions/   — dedup, similarity, text-analysis, multimodal operators
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level convenience exports (avoid importing ray at
    # package import time)
    if name == "build_index":
        from .pipelines.build import build_index

        return build_index
    if name == "IndexSearcher":
        from .pipelines.query import IndexSearcher

        return IndexSearcher
    if name == "parse_query":
        from .parser import parse_query

        return parse_query
    if name == "Fst":
        from .fst import Fst

        return Fst
    if name == "build_fst":
        from .fst import build_fst

        return build_fst
    if name == "open_metadata_store":
        from .state.kvstore import open_metadata_store

        return open_metadata_store
    raise AttributeError(name)
