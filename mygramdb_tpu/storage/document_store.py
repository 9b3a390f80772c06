"""Document store: DocId <-> primary key, filter values, normalized text.

Reference storage/document_store.h:108 keeps four hash maps under one
shared_mutex. Here the host store is columnar where it matters (filter
columns as typed numpy arrays for vectorized range filters; texts in a plain
list) because the query plane consumes batches, not single rows.

DocIds are monotonically allocated from 1 (document_store.h:436) in insert
order, so a PK-ordered initial load yields doc-id order == PK order — the
precondition for the device top-k shortcut (IsPrimaryKeyDocIdOrderValid,
document_store.h:319-325).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

# FilterValue: python analog of the reference's 13-alternative variant
# (document_store.h:72-85). Times are epoch ints (TimeValue).
TimeValue = int
FilterValue = Union[None, bool, int, float, str, TimeValue]


@dataclass
class Document:
    primary_key: str
    filters: Dict[str, FilterValue] = field(default_factory=dict)
    text: Optional[str] = None


def _pk_sort_key(pk: str):
    """Numeric-aware PK ordering (reference ResultSorter numeric-aware sort)."""
    try:
        return (0, int(pk), "")
    except ValueError:
        return (1, 0, pk)


class DocumentStore:
    def __init__(self, store_texts: bool = True):
        self._lock = threading.RLock()
        self._pk_to_doc: Dict[str, int] = {}
        self._doc_to_pk: Dict[int, str] = {}
        self._filters: Dict[int, Dict[str, FilterValue]] = {}
        self._texts: Dict[int, str] = {}
        self._next_doc_id = 1
        self._store_texts = store_texts
        self._pk_order_valid = True
        self._last_pk_key = None

    # ------------------------------------------------------------------
    def set_store_texts(self, enabled: bool) -> None:
        """verify_text off drops text storage (document_store.h:303-316)."""
        with self._lock:
            self._store_texts = enabled
            if not enabled:
                self._texts.clear()

    @property
    def stores_texts(self) -> bool:
        return self._store_texts

    # ------------------------------------------------------------------
    def add_document(self, primary_key: str,
                     filters: Optional[Dict[str, FilterValue]] = None,
                     text: Optional[str] = None) -> Tuple[int, bool]:
        """Insert-or-ignore. Returns (doc_id, inserted)."""
        pk = str(primary_key)
        with self._lock:
            existing = self._pk_to_doc.get(pk)
            if existing is not None:
                return existing, False
            doc_id = self._next_doc_id
            self._next_doc_id += 1
            self._pk_to_doc[pk] = doc_id
            self._doc_to_pk[doc_id] = pk
            if filters:
                self._filters[doc_id] = dict(filters)
            if text is not None and self._store_texts:
                self._texts[doc_id] = text
            key = _pk_sort_key(pk)
            if self._last_pk_key is not None and key < self._last_pk_key:
                self._pk_order_valid = False
            self._last_pk_key = key
            return doc_id, True

    def add_batch(self, rows: Iterable[Tuple[str, Dict[str, FilterValue],
                                             Optional[str]]]) -> List[int]:
        out = []
        for pk, filters, text in rows:
            doc_id, _ = self.add_document(pk, filters, text)
            out.append(doc_id)
        return out

    def update_document(self, doc_id: int,
                        filters: Optional[Dict[str, FilterValue]] = None,
                        text: Optional[str] = None) -> bool:
        with self._lock:
            if doc_id not in self._doc_to_pk:
                return False
            if filters is not None:
                self._filters[doc_id] = dict(filters)
            if text is not None and self._store_texts:
                self._texts[doc_id] = text
            return True

    def remove_document(self, doc_id: int) -> bool:
        with self._lock:
            pk = self._doc_to_pk.pop(doc_id, None)
            if pk is None:
                return False
            self._pk_to_doc.pop(pk, None)
            self._filters.pop(doc_id, None)
            self._texts.pop(doc_id, None)
            return True

    def remove_by_pk(self, primary_key: str) -> Optional[int]:
        with self._lock:
            doc_id = self._pk_to_doc.get(str(primary_key))
            if doc_id is None:
                return None
            self.remove_document(doc_id)
            return doc_id

    def change_primary_key(self, old_pk: str, new_pk: str) -> Optional[int]:
        """PK-change support (reference splits into DELETE+INSERT; exposed
        for processor symmetry)."""
        with self._lock:
            doc_id = self._pk_to_doc.pop(str(old_pk), None)
            if doc_id is None:
                return None
            self._pk_to_doc[str(new_pk)] = doc_id
            self._doc_to_pk[doc_id] = str(new_pk)
            self._pk_order_valid = False
            return doc_id

    def clear(self) -> None:
        with self._lock:
            self._pk_to_doc.clear()
            self._doc_to_pk.clear()
            self._filters.clear()
            self._texts.clear()
            self._next_doc_id = 1
            self._pk_order_valid = True
            self._last_pk_key = None

    # ------------------------------------------------------------------
    def doc_id(self, primary_key: str) -> Optional[int]:
        return self._pk_to_doc.get(str(primary_key))

    def primary_key(self, doc_id: int) -> Optional[str]:
        return self._doc_to_pk.get(doc_id)

    def primary_keys_batch(self, doc_ids: Sequence[int]) -> List[Optional[str]]:
        with self._lock:
            return [self._doc_to_pk.get(d) for d in doc_ids]

    def get_document(self, primary_key: str) -> Optional[Document]:
        with self._lock:
            doc_id = self._pk_to_doc.get(str(primary_key))
            if doc_id is None:
                return None
            return Document(primary_key=str(primary_key),
                            filters=dict(self._filters.get(doc_id, {})),
                            text=self._texts.get(doc_id))

    def text(self, doc_id: int) -> Optional[str]:
        return self._texts.get(doc_id)

    def texts_batch(self, doc_ids: Sequence[int]) -> List[Optional[str]]:
        with self._lock:
            return [self._texts.get(d) for d in doc_ids]

    def filter_value(self, doc_id: int, column: str) -> FilterValue:
        f = self._filters.get(doc_id)
        return f.get(column) if f else None

    def filter_values_batch(self, doc_ids: Sequence[int],
                            column: str) -> List[FilterValue]:
        with self._lock:
            out = []
            for d in doc_ids:
                f = self._filters.get(d)
                out.append(f.get(column) if f else None)
            return out

    def filters_of(self, doc_id: int) -> Dict[str, FilterValue]:
        return dict(self._filters.get(doc_id, {}))

    # ------------------------------------------------------------------
    @property
    def count(self) -> int:
        return len(self._doc_to_pk)

    @property
    def next_doc_id(self) -> int:
        return self._next_doc_id

    @property
    def pk_doc_id_order_valid(self) -> bool:
        """True when ascending doc id == ascending numeric-aware PK order,
        enabling the device top-N shortcut."""
        return self._pk_order_valid

    def texts_snapshot(self) -> Dict[int, str]:
        """Copy of doc_id -> normalized text (device text-store build)."""
        with self._lock:
            return dict(self._texts)

    def all_doc_ids(self) -> np.ndarray:
        with self._lock:
            return np.fromiter(self._doc_to_pk.keys(), dtype=np.int64,
                               count=len(self._doc_to_pk))

    def memory_usage(self) -> int:
        # rough estimate (reference reports approximate sizes too)
        n = len(self._doc_to_pk)
        pk_bytes = sum(len(p) for p in list(self._pk_to_doc)[:1000])
        avg_pk = (pk_bytes / min(n, 1000)) if n else 0
        text_bytes = sum(len(t) for t in list(self._texts.values())[:1000])
        avg_text = (text_bytes / min(len(self._texts), 1000)) if self._texts else 0
        return int(n * (avg_pk * 2 + 64) + len(self._texts) * (avg_text + 48)
                   + len(self._filters) * 96)

    # ------------------------------------------------------------------
    # dump/load state
    # ------------------------------------------------------------------
    def state(self) -> Dict[str, Any]:
        with self._lock:
            return {
                "doc_to_pk": dict(self._doc_to_pk),
                "filters": {d: dict(f) for d, f in self._filters.items()},
                "texts": dict(self._texts),
                "next_doc_id": self._next_doc_id,
                "store_texts": self._store_texts,
                "pk_order_valid": self._pk_order_valid,
            }

    @classmethod
    def from_state(cls, state: Dict[str, Any]) -> "DocumentStore":
        ds = cls(store_texts=state.get("store_texts", True))
        ds._doc_to_pk = {int(k): v for k, v in state["doc_to_pk"].items()}
        ds._pk_to_doc = {v: k for k, v in ds._doc_to_pk.items()}
        ds._filters = {int(k): dict(v) for k, v in state["filters"].items()}
        ds._texts = {int(k): v for k, v in state.get("texts", {}).items()}
        ds._next_doc_id = int(state["next_doc_id"])
        ds._pk_order_valid = bool(state.get("pk_order_valid", True))
        return ds
