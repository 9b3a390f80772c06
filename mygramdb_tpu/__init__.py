"""MygramDB-TPU: a TPU-native in-memory n-gram full-text search engine.

A ground-up rebuild of MygramDB (reference: /root/reference, C++17 single-node
engine) designed TPU-first:

- Host control plane: config, text protocol (TCP) + HTTP/JSON API, query
  parsing, MySQL GTID binlog replication, checkpointing.
- Device data plane (JAX/XLA/Pallas): the n-gram inverted index lives in HBM
  as fixed-width bitmap rows (dense terms) plus a packed CSR posting array
  (sparse terms); SEARCH/COUNT/FACET/BM25 execute as vectorized, micro-batched
  device kernels.

Reference layer map: SURVEY.md §1; this package mirrors its capabilities, not
its implementation.
"""

__version__ = "0.1.0"
