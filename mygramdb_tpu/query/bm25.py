"""BM25 relevance scoring (reference index/bm25_scorer.h:41).

Query-time, term-level scoring: IDF = ln((N - df + 0.5)/(df + 0.5) + 1);
TF = non-overlapping occurrences of the normalized search term in the
stored normalized text; doc length in code points; k1=1.2, b=0.75.

The scoring loop is vectorized: TF counting runs per candidate on host
(numpy over python str.count — C speed) and the BM25 combine runs as one
vectorized expression over the (n_candidates, n_terms) TF matrix. Corpus
stats (doc count, total length) live in BM25Stats (reference
server_types.h:140-194 atomic struct).
"""

from __future__ import annotations

import math
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np


class BM25Stats:
    """Per-table corpus statistics, updated by load/replication."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._doc_count = 0
        self._total_length = 0
        self._doc_lengths: Dict[int, int] = {}

    def add_document(self, doc_id: int, length_cp: int) -> None:
        with self._lock:
            old = self._doc_lengths.get(doc_id)
            if old is not None:
                self._total_length -= old
                self._doc_count -= 1
            self._doc_lengths[doc_id] = length_cp
            self._doc_count += 1
            self._total_length += length_cp

    def remove_document(self, doc_id: int) -> None:
        with self._lock:
            old = self._doc_lengths.pop(doc_id, None)
            if old is not None:
                self._doc_count -= 1
                self._total_length -= old

    def clear(self) -> None:
        with self._lock:
            self._doc_count = 0
            self._total_length = 0
            self._doc_lengths.clear()

    @property
    def doc_count(self) -> int:
        return self._doc_count

    @property
    def total_length(self) -> int:
        return self._total_length

    @property
    def avg_doc_length(self) -> float:
        return self._total_length / self._doc_count if self._doc_count else 0.0

    def doc_length(self, doc_id: int) -> int:
        return self._doc_lengths.get(doc_id, 0)

    def state(self) -> Dict:
        with self._lock:
            return {"doc_lengths": dict(self._doc_lengths)}

    @classmethod
    def from_state(cls, state: Dict) -> "BM25Stats":
        s = cls()
        for d, l in state.get("doc_lengths", {}).items():
            s.add_document(int(d), int(l))
        return s


class BM25Scorer:
    @staticmethod
    def compute_idf(total_docs: int, doc_freq: int) -> float:
        return math.log((total_docs - doc_freq + 0.5) / (doc_freq + 0.5) + 1.0)

    @staticmethod
    def count_term_occurrences(text: str, term: str) -> int:
        if not term:
            return 0
        return text.count(term)

    @staticmethod
    def score_from_tf(tf: np.ndarray, doc_lens: np.ndarray,
                      term_doc_freqs: Sequence[int], total_docs: int,
                      avg_doc_length: float, k1: float = 1.2,
                      b: float = 0.75) -> np.ndarray:
        """BM25 combine over a precomputed (n, t) TF matrix (the TF source
        may be the host text scan or the device counting kernel)."""
        idf = np.asarray([BM25Scorer.compute_idf(total_docs, df)
                          for df in term_doc_freqs], dtype=np.float64)
        tf = tf.astype(np.float64)
        dl = doc_lens.astype(np.float64)
        if avg_doc_length <= 0:
            avg_doc_length = 1.0
        norm = k1 * (1.0 - b + b * dl / avg_doc_length)
        return (tf * (k1 + 1.0) / (tf + norm[:, None])) @ idf

    @staticmethod
    def score_documents(candidates: Sequence[int],
                        search_terms: Sequence[str],
                        term_doc_freqs: Sequence[int],
                        texts: Sequence[Optional[str]],
                        total_docs: int, avg_doc_length: float,
                        k1: float = 1.2, b: float = 0.75) -> np.ndarray:
        """-> (n,) float64 scores aligned with candidates.

        texts[i] is the stored normalized text of candidates[i] (None -> 0).
        """
        n = len(candidates)
        t = len(search_terms)
        if n == 0 or t == 0:
            return np.zeros(n, dtype=np.float64)
        idf = np.asarray([BM25Scorer.compute_idf(total_docs, df)
                          for df in term_doc_freqs], dtype=np.float64)
        from .. import native
        tf_i, dl_i = native.count_occurrences(texts, list(search_terms))
        tf = tf_i.astype(np.float64)
        dl = dl_i.astype(np.float64)
        if avg_doc_length <= 0:
            avg_doc_length = 1.0
        norm = k1 * (1.0 - b + b * dl / avg_doc_length)
        scores = (tf * (k1 + 1.0) / (tf + norm[:, None])) @ idf
        return scores
