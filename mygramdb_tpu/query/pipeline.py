"""Query execution pipeline (reference server/search_pipeline.{h,cpp}).

``execute_full_pipeline`` is the shared engine behind SEARCH / COUNT / FACET
on both the TCP and HTTP planes: path selection (regular / boolean-AST /
fuzzy / synonym), device index execution, NOT exclusion, column filters,
verify_text post-filter, BM25 scoring, sort + pagination, and per-query
debug info (reference DebugInfo, query_parser.h:180-200).

TPU shape: all AND terms' n-grams collapse into ONE device search (set
intersection is associative, so AND-of-terms == AND-of-all-grams — the
reference's per-term loop with FilterByNgrams probing, search_pipeline.cpp
:615-685, exists only for CPU-side planning). The single-term PK-sorted
fast path maps to the device top-k kernel (the reference Top-N shortcut,
search_pipeline.h:348-367).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from ..utils import textproc
from .parser import (FilterCondition, FilterOp, OrderByClause, Query,
                     QueryType, SortOrder)
from .ast import QueryASTParser, QueryNode, contains_boolean_syntax


def _is_boolean_query(query) -> bool:
    """Boolean-AST routing gate: quoted search text is ONE literal term
    and must never be re-parsed for AND/OR/NOT (the TCP/HTTP parsers set
    search_text_quoted; reference quoted-region semantics)."""
    return (not getattr(query, "search_text_quoted", False)
            and contains_boolean_syntax(query.search_text))
from .bm25 import BM25Scorer
from .sorter import ResultSorter

FILTER_THRESHOLD = 1000  # reference search_pipeline.h:315
MAX_OFFSET_FOR_TOPN = 10000


@dataclass
class TermInfo:
    raw: str
    normalized: str
    grams: List[str]
    estimated_size: int = 0
    doc_freq: int = 0

    @property
    def needs_substring_fallback(self) -> bool:
        return not self.grams and bool(self.normalized)


@dataclass
class DebugInfo:
    query_time_ms: float = 0.0
    parse_time_ms: float = 0.0
    index_time_ms: float = 0.0
    filter_time_ms: float = 0.0
    search_terms: List[str] = field(default_factory=list)
    ngrams_used: List[str] = field(default_factory=list)
    posting_list_sizes: List[int] = field(default_factory=list)
    total_candidates: int = 0
    after_intersection: int = 0
    after_not: int = 0
    after_filters: int = 0
    final_results: int = 0
    optimization_used: str = ""
    order_by_applied: str = ""
    limit_applied: int = 0
    offset_applied: int = 0
    limit_explicit: bool = False
    offset_explicit: bool = False
    cache_status: str = "disabled"
    cache_age_ms: float = 0.0
    cache_saved_ms: float = 0.0
    query_cost_ms: float = 0.0
    cache_key: str = ""
    # per-stage breakdown (ROADMAP #9): wall time around the verify and
    # sort/score stages, plus device dispatches issued while this query
    # ran (process-wide counter delta — approximate under concurrency,
    # exact in DEBUG-mode single-query investigation, which is its use)
    verify_time_ms: float = 0.0
    sort_time_ms: float = 0.0
    device_dispatches: int = 0
    _dispatch_mark: int = 0
    # fuzzy path: candidates whose text crossed to the host for
    # Levenshtein (exact-substring hits resolve on device) — the r4
    # bounded-fuzzy contract gates this, not the total candidate count
    fuzzy_host_verified: int = 0


@dataclass
class PipelineOutput:
    success: bool = True
    error: str = ""
    results: np.ndarray = field(default_factory=lambda: np.empty(0, np.int32))
    total: int = 0
    path: str = "regular"
    debug: Optional[DebugInfo] = None
    all_search_terms: List[str] = field(default_factory=list)
    scores: Optional[np.ndarray] = None
    # the component snapshot the query executed against: callers resolving
    # PKs / texts / facet counts for these results must use it, not the
    # live ctx (a concurrent SYNC/DUMP LOAD swap renumbers doc ids)
    sn: Optional["_CtxSnapshot"] = None


class _CtxSnapshot:
    """Seqlock capture of a context's swappable components.

    SYNC staging swaps and DUMP LOAD replace index/doc_store/filter_index/
    bm25 together; a query that read the OLD index but resolves PKs
    against the NEW doc_store (doc ids renumber on swap) would return
    wrong rows. Writers bump ``_swap_seq`` to odd before swapping and back
    to even after; readers retry until they capture all four components
    under one even sequence — no locks on the query path (the write lock
    is held across whole compactions, so blocking on it would stall
    queries for seconds at scale)."""

    __slots__ = ("index", "doc_store", "filter_index", "bm25", "seq")

    def __init__(self, ctx):
        while True:
            s0 = getattr(ctx, "_swap_seq", 0)
            if s0 % 2 == 0:
                self.index = ctx.index
                self.doc_store = ctx.doc_store
                self.filter_index = ctx.filter_index
                self.bm25 = ctx.bm25
                if getattr(ctx, "_swap_seq", 0) == s0:
                    # the generation this snapshot belongs to: cache entries
                    # are stamped with it so a hit computed against a
                    # pre-swap corpus can never serve a post-swap snapshot
                    self.seq = s0
                    return
            time.sleep(0)  # writer mid-swap; yield and retry


class SearchPipeline:
    """Bound to one table context (duck-typed: .index MutableIndex,
    .doc_store DocumentStore, .filter_index FilterIndex, .bm25 BM25Stats,
    .synonyms Optional[SynonymDictionary], .table_cfg TableConfig,
    .normalize(text)->str)."""

    def __init__(self, ctx, config, cache_manager=None):
        self.ctx = ctx
        self.cfg = config
        self.cache = cache_manager
        import threading
        self._tls = threading.local()

    @property
    def sn(self) -> _CtxSnapshot:
        """The executing query's consistent component snapshot (pipelines
        are shared across worker threads — thread-local)."""
        snap = getattr(self._tls, "snap", None)
        return snap if snap is not None else _CtxSnapshot(self.ctx)

    # ------------------------------------------------------------------
    def _canon_order(self, query: Query) -> Optional[OrderByClause]:
        """SORT <pk-column> is PK order (case-insensitive match against the
        table's primary key, reference search_pipeline.cpp equals_ignore_case
        check)."""
        ob = query.order_by
        if ob is None:
            return None
        if ob.column and ob.column.lower() == \
                self.ctx.table_cfg.primary_key.lower():
            return OrderByClause(column="", order=ob.order)
        return ob

    # ------------------------------------------------------------------
    def term_info(self, raw: str) -> TermInfo:
        t = self.ctx.table_cfg
        normalized = self.ctx.normalize(raw)
        grams = textproc.generate_query_ngrams(
            normalized, t.ngram_size, t.kanji_ngram_size,
            t.cross_boundary_ngrams,
            kanji_extra=self.ctx.kanji_extra_effective)
        grams = sorted(set(grams))
        if normalized in grams:
            # a gram equal to the whole term subsumes every other gram
            # (doc contains the term <=> doc has this gram, and then it
            # necessarily has all sub-grams): the AND collapses to ONE
            # posting lookup — no probes, no dense bitmap gathers. This
            # is where the kanji_extra_ngram emission pays: measured
            # 656 -> ~90 us/query device at 1.1M (redundant unigram
            # probes were the whole cost of the covered dispatch).
            grams = [normalized]
        est = 0
        if grams:
            sizes = [self.sn.index.term_df(g) for g in grams]
            est = min(sizes) if all(s > 0 for s in sizes) else 0
        return TermInfo(raw=raw, normalized=normalized, grams=grams,
                        estimated_size=est)

    # ------------------------------------------------------------------
    def execute(self, query: Query, want_debug: bool = False,
                collect_all: bool = False) -> PipelineOutput:
        """Full pipeline. collect_all: FACET needs the complete result set
        regardless of limit."""
        snap = _CtxSnapshot(self.ctx)
        self._tls.snap = snap
        try:
            out = self._execute_inner(query, want_debug, collect_all)
            out.sn = snap
            return out
        finally:
            self._tls.snap = None

    def _execute_inner(self, query: Query, want_debug: bool,
                       collect_all: bool) -> PipelineOutput:
        t_start = time.perf_counter()
        from ..ops import runtime as _rt
        dbg = DebugInfo()
        dbg._dispatch_mark = _rt.dispatches.count
        out = PipelineOutput(debug=dbg)

        # cache lookup (unsorted full result sets keyed canonically);
        # captures the data version BEFORE computing so the insert below can
        # reject results that raced with a table mutation
        cache_entry = None
        cache_key = None
        cache_version = None
        if self.cache is not None and query.type in (
                QueryType.SEARCH, QueryType.COUNT, QueryType.FACET):
            cache_key, cache_entry, cache_version = self.cache.lookup(
                self.ctx.name, query, self.sn.doc_store,
                generation=self.sn.seq)
            dbg.cache_key = cache_key or ""
        if cache_entry is not None:
            total, ids = cache_entry
            out.total = total
            out.path = "cache"
            dbg.cache_status = "hit"
            all_ids = ids
            terms = [self.term_info(t) for t in query.all_terms]
            out.all_search_terms = [ti.normalized for ti in terms]
            dbg.search_terms = out.all_search_terms
            try:
                self._finalize(query, out, all_ids, terms, t_start,
                               collect_all=collect_all)
            except PipelineError as e:
                out.success = False
                out.error = str(e)
            return out
        if self.cache is not None:
            dbg.cache_status = "miss" if self.cache.enabled else "disabled"

        # COUNT fast path: one device dispatch, no id materialization
        if not collect_all and query.type == QueryType.COUNT:
            fast_count = self._try_count(query, dbg)
            if fast_count is not None:
                total, terms = fast_count
                out.total = total
                out.all_search_terms = [ti.normalized for ti in terms]
                dbg.search_terms = out.all_search_terms
                dbg.final_results = total
                dbg.optimization_used = "device_count"
                self._finish_dbg(dbg, t_start)
                return out

        # fused verified fast path: search -> extract -> window-verify
        # [-> BM25] -> top-k in ONE dispatch (the CJK + verify_text
        # north-star workload; replaces 2-3 sequential dispatches)
        if not collect_all:
            fused = self._try_fused_verified(query, dbg)
            if fused is not None:
                total, page, scores, terms = fused
                out.total = total
                out.results = page
                out.scores = scores
                out.all_search_terms = [ti.normalized for ti in terms]
                dbg.search_terms = out.all_search_terms
                for ti in terms:
                    dbg.ngrams_used.extend(ti.grams)
                dbg.final_results = total
                dbg.optimization_used = (dbg.optimization_used or
                                         "device_fused_verify")
                dbg.limit_applied = query.limit
                dbg.offset_applied = query.offset
                self._finish_dbg(dbg, t_start)
                return out

        # device top-N fast path: single AND-gram set, PK order, no
        # filters/NOT/verify — the whole query is one device kernel
        if not collect_all:
            fast = self._try_topn(query, dbg)
            if fast is not None:
                total, page, terms = fast
                out.total = total
                out.results = page
                out.all_search_terms = [ti.normalized for ti in terms]
                dbg.search_terms = out.all_search_terms
                for ti in terms:
                    dbg.ngrams_used.extend(ti.grams)
                ob = query.order_by or OrderByClause()
                dbg.final_results = total
                dbg.optimization_used = "device_topn"
                dbg.order_by_applied = f"pk {ob.order.value}"
                dbg.limit_applied = query.limit
                dbg.offset_applied = query.offset
                dbg.limit_explicit = query.limit_explicit
                dbg.offset_explicit = query.offset_explicit
                self._finish_dbg(dbg, t_start)
                return out

        t_index = time.perf_counter()
        try:
            if query.fuzzy_max_distance is not None:
                out.path = "fuzzy"
                all_ids, terms = self._execute_fuzzy(query, dbg)
            elif _is_boolean_query(query):
                out.path = "boolean_ast"
                all_ids, terms = self._execute_ast(query, dbg)
            elif self._synonyms_apply(query):
                out.path = "synonym"
                all_ids, terms = self._execute_synonym(query, dbg)
            else:
                out.path = "regular"
                all_ids, terms = self._execute_regular(query, dbg)
        except PipelineError as e:
            out.success = False
            out.error = str(e)
            return out
        dbg.index_time_ms = (time.perf_counter() - t_index) * 1000
        dbg.after_intersection = int(all_ids.size)

        out.all_search_terms = [ti.normalized for ti in terms]
        dbg.search_terms = out.all_search_terms
        for ti in terms:
            dbg.ngrams_used.extend(ti.grams)

        # column filters
        t_f = time.perf_counter()
        if query.filters:
            try:
                all_ids = self._apply_filters(all_ids, query.filters)
            except PipelineError as e:
                out.success = False
                out.error = str(e)
                return out
            dbg.after_filters = int(all_ids.size)
        dbg.filter_time_ms = (time.perf_counter() - t_f) * 1000

        # verify_text post-filter
        if out.path != "fuzzy":
            t_v = time.perf_counter()
            all_ids = self._apply_verify(all_ids, query, terms, out.path)
            dbg.verify_time_ms = (time.perf_counter() - t_v) * 1000

        out.total = int(all_ids.size)

        # cache insert (guarded by data version at insert time)
        if self.cache is not None and cache_key is not None:
            cost_ms = (time.perf_counter() - t_start) * 1000
            dbg.query_cost_ms = cost_ms
            self.cache.insert(self.ctx.name, cache_key, query,
                              (out.total, all_ids), cost_ms,
                              [g for ti in terms for g in ti.grams],
                              version_at_lookup=cache_version,
                              generation=self.sn.seq)

        try:
            self._finalize(query, out, all_ids, terms, t_start,
                           collect_all=collect_all)
        except PipelineError as e:
            out.success = False
            out.error = str(e)
        return out

    # ------------------------------------------------------------------
    def _finalize(self, query: Query, out: PipelineOutput,
                  all_ids: np.ndarray, terms: List[TermInfo],
                  t_start: float, collect_all: bool = False) -> None:
        dbg = out.debug
        out.total = int(all_ids.size)
        ob = self._canon_order(query) or OrderByClause()
        t_sort = time.perf_counter()
        if collect_all:
            out.results = all_ids
        elif ob.is_score:
            out.results, out.scores = self._score_sort(query, all_ids, terms)
        elif not ob.is_primary_key and \
                self.sn.filter_index.has_column(ob.column):
            out.results = self._column_sort_fast(all_ids, ob, query)
        else:
            out.results = ResultSorter.sort_and_paginate(
                all_ids, ob, query.limit, query.offset,
                self.sn.doc_store, self.sn.doc_store.pk_doc_id_order_valid)
        dbg.sort_time_ms = (time.perf_counter() - t_sort) * 1000
        dbg.final_results = out.total
        dbg.order_by_applied = (f"{ob.column or 'pk'} {ob.order.value}")
        dbg.limit_applied = query.limit
        dbg.offset_applied = query.offset
        dbg.limit_explicit = query.limit_explicit
        dbg.offset_explicit = query.offset_explicit
        self._finish_dbg(dbg, t_start)

    @staticmethod
    def _finish_dbg(dbg: DebugInfo, t_start: float) -> None:
        from ..ops import runtime as _rt
        dbg.query_time_ms = (time.perf_counter() - t_start) * 1000
        dbg.device_dispatches = max(
            0, _rt.dispatches.count - dbg._dispatch_mark)

    # ------------------------------------------------------------------
    # Device filters: FILTER clauses ride the device query as extra AND
    # word rows (reference ApplyFiltersWithBitmap,
    # search_pipeline.cpp:785-793) instead of a host post-mask over
    # materialized ids — the fast paths stay at ONE dispatch. EQ on
    # bitmap-indexed columns uses the maintained value bitmaps; range /
    # NE / NULL ops (and EQ on unindexed numeric or dict-compressed
    # columns) use computed-and-cached compare rows
    # (FilterIndex.cmp_bitmap_device).
    # ------------------------------------------------------------------
    def _device_eq_filters(self, query: Query):
        """Device word rows when EVERY filter has a device form -> list
        of rows ([] if no filters); None => at least one filter needs the
        host path (plain string column, unparseable value)."""
        if not query.filters:
            return []
        fi = self.sn.filter_index
        device = self.sn.index.device
        target = device._row_sharding or device._device
        rows = []
        for f in query.filters:
            if f.op == FilterOp.EQ and fi.is_bitmap(f.column):
                row = fi.eq_bitmap_device(
                    f.column, f.value, device.n_words, target)
            else:
                row = fi.cmp_bitmap_device(
                    f.column, f.op.value, f.value, device.n_words, target)
            if row is None:
                return None
            rows.append(row)
        return rows

    def _delta_filterer(self, query: Query):
        """Host filter hook for delta-resident ids merged into a device
        fast path (their filter values live host-side only)."""
        if not query.filters:
            return None
        return lambda ids: self._apply_filters(ids, query.filters)

    # ------------------------------------------------------------------
    # COUNT fast path: no NOT/verify => the popcount IS the answer
    # (bitmap-EQ filters fold into the same dispatch as extra AND rows)
    # ------------------------------------------------------------------
    def _try_count(self, query: Query, dbg: DebugInfo):
        if query.fuzzy_max_distance is not None or query.not_terms:
            return None
        if _is_boolean_query(query) or \
                self._synonyms_apply(query):
            return None
        extra = self._device_eq_filters(query)
        if extra is None:
            return None
        terms = [self.term_info(t) for t in query.all_terms]
        if not terms or any(ti.needs_substring_fallback for ti in terms):
            return None
        if (self._verify_applies(terms)
                and not all(self._covered_exact(ti) for ti in terms)) or \
                self._coverage_requires_text_check(terms):
            return None
        if any(ti.estimated_size == 0 for ti in terms):
            return 0, terms
        grams = sorted({g for ti in terms for g in ti.grams})
        try:
            total, _ = self.sn.index.search_and(
                grams, count_only=True, extra_words=extra or None,
                delta_filter=self._delta_filterer(query))
        except PipelineError:
            raise
        except Exception:
            if extra:
                return None  # raced a segment swap; exact path re-runs
            raise
        return total, terms

    # ------------------------------------------------------------------
    # Fused verified fast path: one dispatch for search + verify_text
    # (+ BM25 score) + top-k. Applies when the rarest gram's df bounds
    # the candidate count, the text store fully covers the corpus, and
    # there is no delta overlay (steady state after compaction).
    # ------------------------------------------------------------------
    def _try_fused_verified(self, query: Query, dbg: DebugInfo):
        if query.type not in (QueryType.SEARCH, QueryType.COUNT):
            return None
        if query.fuzzy_max_distance is not None or query.not_terms:
            return None
        if _is_boolean_query(query) or \
                self._synonyms_apply(query):
            return None
        # bitmap-EQ filters ride the fused dispatch as extra AND rows
        # (reference ApplyFiltersWithBitmap); any other filter shape
        # needs the host path
        extra = self._device_eq_filters(query)
        if extra is None:
            return None
        dev_text = self.ctx.fresh_device_text()
        if dev_text is None or dev_text._overflow:
            return None
        index = self.sn.index
        if len(index.delta) or index.frozen_delta is not None:
            return None
        terms = [self.term_info(t) for t in query.all_terms]
        if not terms or any(ti.needs_substring_fallback for ti in terms):
            return None
        ob = self._canon_order(query) or OrderByClause()
        score_mode = False
        if query.type == QueryType.SEARCH:
            if ob.is_score and ob.order == SortOrder.DESC and \
                    query.limit > 0:
                score_mode = True
            elif not (ob.is_primary_key and query.limit > 0 and
                      query.offset <= MAX_OFFSET_FOR_TOPN and
                      self.sn.doc_store.pk_doc_id_order_valid):
                return None
        # require_match: verify_text semantics filter the result set to
        # literal-substring matches; score-only queries keep every gram
        # match (the reference scores the raw SearchAnd set) but still
        # ride the fused kernel for its TF pass
        require_match = ((self._verify_applies(terms)
                          and not all(self._covered_exact(ti)
                                      for ti in terms))
                         or self._coverage_requires_text_check(terms))
        if not require_match and not score_mode:
            return None  # plain topn/count paths are cheaper
        from ..ops.verify_ops import NEEDLE_CAP
        needles = [ti.normalized for ti in terms]
        if any(not nd or len(nd) > NEEDLE_CAP for nd in needles):
            return None
        if any(ti.estimated_size == 0 for ti in terms):
            return 0, np.empty(0, dtype=np.int32), None, terms
        # candidate bound: intersection size <= rarest gram's df
        grams = sorted({g for ti in terms for g in ti.grams})
        tids = index.query_tids(grams)
        if tids is None:
            return (0, np.empty(0, dtype=np.int32), None, terms)
        device = index.device
        from ..ops.verify_ops import has_self_overlap
        nonoverlap = score_mode and any(has_self_overlap(nd)
                                        for nd in needles)

        from ..storage.device_text import DeviceTextStore
        from ..index.device_index import _bucket_of, _LIMIT_BUCKETS
        n_need = query.limit + query.offset if query.limit > 0 else 1
        n_b = min(_bucket_of(max(n_need, 1), _LIMIT_BUCKETS),
                  device.n_docs_capacity)
        desc = (ob.order == SortOrder.DESC or ob.is_score)
        Nn_b = _bucket_of(len(needles), (2, 4))
        ndl, nlens = DeviceTextStore._pack_needles(needles)
        ndl_p = np.zeros((Nn_b, ndl.shape[1]), dtype=np.uint32)
        ndl_p[:ndl.shape[0]] = ndl
        nlens_p = np.zeros(Nn_b, dtype=np.int32)
        nlens_p[:nlens.shape[0]] = nlens
        idf = None
        force_probes = False
        idf_scale_from_pre = False
        if score_mode:
            if len(terms) == 1 and not extra and \
                    index.device.postings_sh is None:
                # (with filters, pre includes the filter mask — not the
                # term's corpus df — so the idf-from-pre shortcut is off;
                # on a mesh the probeless pre is a driver-df partial, so
                # single-term score queries compute idf via the df branch
                # below like multi-term ones)
                # single term: its df IS the query's pre-verify AND count
                # (the reference's SearchAnd(ngrams).size(),
                # search_pipeline.cpp:453-455), which the fused kernel
                # already computes as `pre` — score in-kernel with idf=1
                # and scale by the real IDF afterwards (order-preserving:
                # one positive scalar). force_probes keeps pre exact on
                # the sparse-driver path (probeless pre = driver df).
                idf = np.zeros(Nn_b, dtype=np.float32)
                idf[0] = 1.0
                force_probes = True
                idf_scale_from_pre = True
            else:
                dfs = []
                for ti in terms:
                    total_df, _ = index.search_and(ti.grams, limit=1)
                    dfs.append(total_df)
                idf_t = np.asarray(
                    [BM25Scorer.compute_idf(self.sn.bm25.doc_count, df)
                     for df in dfs], dtype=np.float32)
                idf = np.zeros(Nn_b, dtype=np.float32)
                idf[:idf_t.shape[0]] = idf_t
        # dense or sparse driver: one dispatch, batched when possible;
        # None => no fused shape / match set exceeded the verify width.
        # (r5: the positional occurrence index no longer rides the
        # serving path — it lost its A/B against the text-window verify
        # 5x at 1.1M with 83% no_bucket coverage, and the scanned global
        # compaction widened that gap; the index itself stays for the
        # dump lifecycle and bench tooling, routed only by explicit
        # search_verified_positional calls.)
        try:
            out_sv = device.search_and_verified(
                tids, dev_text, ndl_p, nlens_p, n_b, desc,
                score_mode=score_mode, idf=idf, k1=self.cfg.bm25.k1,
                b=self.cfg.bm25.b, avgdl=self.sn.bm25.avg_doc_length,
                nonoverlap=nonoverlap, require_match=require_match,
                force_probes=force_probes, extra_words=extra)
        except Exception:
            if extra:
                return None  # raced a segment swap; exact path re-runs
            raise
        if out_sv is None:
            return None
        total, ids, scores, pre = out_sv
        if query.type == QueryType.COUNT:
            return total, np.empty(0, dtype=np.int32), None, terms
        keep = ids >= 0
        ids = ids[keep]
        page = ids[query.offset:query.offset + query.limit]
        page_scores = None
        if score_mode:
            page_scores = scores[keep][
                query.offset:query.offset + query.limit].astype(np.float64)
            if idf_scale_from_pre:
                page_scores = page_scores * BM25Scorer.compute_idf(
                    self.sn.bm25.doc_count, pre)
        return total, page.astype(np.int32), page_scores, terms

    # ------------------------------------------------------------------
    # Top-N fast path (reference search_pipeline.h:348-367 shortcut,
    # promoted here to a device top-k kernel that skips materialization)
    # ------------------------------------------------------------------
    def _try_topn(self, query: Query, dbg: DebugInfo):
        if query.type != QueryType.SEARCH:
            return None
        if query.fuzzy_max_distance is not None or query.not_terms:
            return None
        if _is_boolean_query(query) or \
                self._synonyms_apply(query):
            return None
        extra = self._device_eq_filters(query)
        if extra is None:
            return None
        ob = self._canon_order(query) or OrderByClause()
        if not ob.is_primary_key or query.limit <= 0 or \
                query.offset > MAX_OFFSET_FOR_TOPN:
            return None
        if not self.sn.doc_store.pk_doc_id_order_valid:
            return None
        terms = [self.term_info(t) for t in query.all_terms]
        if not terms or any(ti.needs_substring_fallback for ti in terms):
            return None
        if (self._verify_applies(terms)
                and not all(self._covered_exact(ti) for ti in terms)) or \
                self._coverage_requires_text_check(terms):
            return None
        if any(ti.estimated_size == 0 for ti in terms):
            return 0, np.empty(0, dtype=np.int32), terms
        grams = sorted({g for ti in terms for g in ti.grams})
        try:
            total, ids = self.sn.index.search_and(
                grams, limit=query.offset + query.limit,
                descending=(ob.order == SortOrder.DESC),
                extra_words=extra or None,
                delta_filter=self._delta_filterer(query))
        except PipelineError:
            raise
        except Exception:
            if extra:
                return None  # raced a segment swap; exact path re-runs
            raise
        page = ids[query.offset:]
        return total, page.astype(np.int32), terms

    # ------------------------------------------------------------------
    # Regular path
    # ------------------------------------------------------------------
    def _execute_regular(self, query: Query, dbg: DebugInfo,
                         extra_terms: Optional[List[TermInfo]] = None
                         ) -> Tuple[np.ndarray, List[TermInfo]]:
        terms = [self.term_info(t) for t in query.all_terms]
        # terms whose grams all exist drive the device AND; short terms
        # (no grams) fall back to substring scan over stored text
        gram_terms = [ti for ti in terms if ti.grams]
        short_terms = [ti for ti in terms if ti.needs_substring_fallback]
        if short_terms and not self.sn.doc_store.stores_texts:
            raise PipelineError(
                "query term shorter than n-gram size requires stored "
                "text (memory.verify_text) for substring search")

        all_grams: List[str] = []
        for ti in gram_terms:
            all_grams.extend(ti.grams)
        all_grams = sorted(set(all_grams))

        if gram_terms:
            # any unknown gram => empty intersection
            if any(ti.estimated_size == 0 for ti in gram_terms):
                ids = np.empty(0, dtype=np.int32)
            else:
                _, ids = self.sn.index.search_and(all_grams, limit=0)
        elif short_terms:
            ids = self._substring_scan_all(short_terms)
            short_terms = []
        else:
            ids = np.empty(0, dtype=np.int32)

        if short_terms and ids.size:
            ids = self._substring_filter(ids, [ti.normalized
                                               for ti in short_terms])
        dbg.total_candidates = int(ids.size)

        # NOT exclusion: each NOT term excludes docs containing ALL its grams
        if query.not_terms and ids.size:
            ids = self._apply_not(ids, query.not_terms)
            dbg.after_not = int(ids.size)
        return ids, terms

    def _apply_not(self, ids: np.ndarray,
                   not_terms: Sequence[str]) -> np.ndarray:
        for raw in not_terms:
            if not ids.size:
                break
            ti = self.term_info(raw)
            if ti.grams:
                if ti.estimated_size == 0:
                    continue
                _, bad = self.sn.index.search_and(ti.grams, limit=0)
            elif ti.normalized and self.sn.doc_store.stores_texts:
                bad = self._substring_scan_all([ti])
            else:
                continue
            if bad.size:
                ids = ids[~np.isin(ids, bad, assume_unique=True)]
        return ids

    def _substring_scan_all(self, terms: List[TermInfo]) -> np.ndarray:
        """Full-store substring scan for terms shorter than the n-gram size."""
        doc_ids = np.sort(self.sn.doc_store.all_doc_ids())
        return self._substring_filter(doc_ids.astype(np.int32),
                                      [ti.normalized for ti in terms])

    def _substring_filter(self, ids: np.ndarray,
                          needles: Sequence[str]) -> np.ndarray:
        dev_text = self.ctx.fresh_device_text()
        if dev_text is not None and ids.size >= 256:
            dirty = self.sn.index.dirty_doc_ids()
            mask = dev_text.verify(ids, list(needles),
                                   self.sn.doc_store.texts_batch,
                                   dirty=dirty)
            return ids[mask].astype(np.int32)
        texts = self.sn.doc_store.texts_batch(ids.tolist())
        from .. import native
        mask = native.substring_verify(texts, list(needles))
        return ids[mask].astype(np.int32)

    # ------------------------------------------------------------------
    # Boolean AST path
    # ------------------------------------------------------------------
    def _execute_ast(self, query: Query, dbg: DebugInfo
                     ) -> Tuple[np.ndarray, List[TermInfo]]:
        parser = QueryASTParser()
        ast = parser.parse(query.search_text)
        if ast is None:
            raise PipelineError(
                f"Invalid boolean search expression: {parser.error}")

        def search_term(term: str) -> np.ndarray:
            ti = self.term_info(term)
            if ti.grams:
                if ti.estimated_size == 0:
                    return np.empty(0, dtype=np.int32)
                _, ids = self.sn.index.search_and(ti.grams, limit=0)
                return ids
            if ti.normalized and self.sn.doc_store.stores_texts:
                return self._substring_scan_all([ti])
            return np.empty(0, dtype=np.int32)

        def all_docs() -> np.ndarray:
            return np.sort(self.sn.doc_store.all_doc_ids()).astype(np.int32)

        ids = self._ast_device_ids(ast)
        if ids is not None:
            dbg.optimization_used = "device_ast"
        else:
            ids = ast.evaluate(search_term, all_docs).astype(np.int32)
        dbg.total_candidates = int(ids.size)

        # AND clause terms still apply on top of the expression
        for raw in query.and_terms:
            if not ids.size:
                break
            ti = self.term_info(raw)
            if ti.grams:
                ids = self.sn.index.filter_by_ngrams(ids, ti.grams) \
                    if ids.size <= FILTER_THRESHOLD else \
                    self._intersect_with_term(ids, ti)
            elif ti.normalized:
                ids = self._substring_filter(ids, [ti.normalized])
        if query.not_terms and ids.size:
            ids = self._apply_not(ids, query.not_terms)
            dbg.after_not = int(ids.size)

        # exact text post-filter removes n-gram false positives per the
        # boolean structure (PostFilterByBooleanText)
        if self.sn.doc_store.stores_texts and ids.size:
            ids = self._ast_text_filter(ast, ids)

        terms = [self.term_info(t)
                 for t in ast.collect_scoring_terms() + query.and_terms]
        return ids, terms

    def _ast_device_ids(self, ast: QueryNode) -> Optional[np.ndarray]:
        """Evaluate the boolean AST as device bitmap algebra — ONE
        compiled program per tree shape; only W result words cross to the
        host (the host path materializes every clause's full id set).
        None => host fallback (delta present, short terms, oversized
        sparse grams)."""
        index = self.sn.index
        if len(index.delta) or index.frozen_delta is not None:
            return None
        device = index.device
        leaf_idx: Dict[str, int] = {}
        leaf_tids: List[Optional[List[int]]] = []
        has_not = False

        def sig_of(node: QueryNode):
            nonlocal has_not
            if node.type.value == "TERM":
                ti = self.term_info(node.term)
                if ti.needs_substring_fallback:
                    raise PipelineError("_host")  # short term: host scan
                key = ti.normalized
                if key not in leaf_idx:
                    leaf_idx[key] = len(leaf_tids)
                    leaf_tids.append(index.query_tids(ti.grams)
                                     if ti.grams else None)
                return ("t", leaf_idx[key])
            if node.type.value == "NOT":
                has_not = True
                return ("!", sig_of(node.children[0]))
            tag = "&" if node.type.value == "AND" else "|"
            return (tag,) + tuple(sig_of(c) for c in node.children)

        try:
            sig = sig_of(ast)
        except PipelineError:
            return None
        universe = device._ones_words
        if has_not:
            universe = self._universe_words(index, device)
        words = device.ast_words(sig, leaf_tids, universe)
        if words is None:
            return None
        from ..index.device_index import DeviceIndex
        return DeviceIndex._bitmap_to_ids(words)

    def _universe_words(self, index, device):
        """All-live-docs device bitmap for NOT complements, cached per
        (segment generation, mutation version) on the table context."""
        key = (index.built_generation, index.version,
               self.sn.doc_store.count)
        cached = getattr(self.ctx, "_ast_universe", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        uni = device.universe_words(self.sn.doc_store.all_doc_ids())
        self.ctx._ast_universe = (key, uni)
        return uni

    def _ast_text_filter(self, ast: QueryNode,
                         ids: np.ndarray) -> np.ndarray:
        """Exact-text post-filter for the boolean path. Large candidate
        sets go through the device per-needle contains kernel + numpy
        AST algebra (one dispatch per 16k-candidate chunk); small sets /
        no device pack keep the per-doc host evaluation."""
        norm_terms: List[str] = []
        for t in ast.collect_terms():
            n = self.ctx.normalize(t)
            if n not in norm_terms:
                norm_terms.append(n)
        dev_text = self.ctx.fresh_device_text()
        from ..ops.verify_ops import NEEDLE_CAP
        if dev_text is not None and ids.size >= 256 and norm_terms and \
                all(0 < len(n) <= NEEDLE_CAP for n in norm_terms):
            dirty = self.sn.index.dirty_doc_ids()
            masks = dev_text.contains_masks(
                ids, norm_terms, self.sn.doc_store.texts_batch,
                dirty=dirty)
            col = {n: masks[:, j] for j, n in enumerate(norm_terms)}
            keep = ast.evaluate_masks(
                lambda term: col[self.ctx.normalize(term)])
            return ids[keep].astype(np.int32)
        texts = self.sn.doc_store.texts_batch(ids.tolist())
        keep_idx = []
        for i, tx in enumerate(texts):
            if tx is None:
                keep_idx.append(i)
                continue
            if ast.matches_text(
                    lambda term, _tx=tx: self.ctx.normalize(term) in _tx):
                keep_idx.append(i)
        return ids[np.asarray(keep_idx, dtype=np.int64)] if keep_idx else \
            np.empty(0, dtype=np.int32)

    def _intersect_with_term(self, ids: np.ndarray, ti: TermInfo) -> np.ndarray:
        _, other = self.sn.index.search_and(ti.grams, limit=0)
        return np.intersect1d(ids, other, assume_unique=True).astype(np.int32)

    # ------------------------------------------------------------------
    # Synonym path
    # ------------------------------------------------------------------
    def _synonyms_apply(self, query: Query) -> bool:
        syn = getattr(self.ctx, "synonyms", None)
        if syn is None or syn.group_count == 0:
            return False
        return any(syn.has(t) for t in query.all_terms)

    def _execute_synonym(self, query: Query, dbg: DebugInfo
                         ) -> Tuple[np.ndarray, List[TermInfo]]:
        """OR within each synonym group, AND across groups
        (search_pipeline.h:255-259).

        The expansion IS a boolean AST — ('&', ('|', variants...), ...)
        — so on a delta-free table it rides the device bitmap-algebra
        program in ONE dispatch (the host union/intersect loop
        materialized every variant's full id set: a hot synonym at 1M+
        docs pulled megabytes over the tunnel per query)."""
        syn = self.ctx.synonyms
        groups: List[List[TermInfo]] = []
        for raw in query.all_terms:
            variants = syn.expand(raw)
            groups.append([self.term_info(v) for v in variants])
        ids = self._synonym_device_ids(groups)
        if ids is not None:
            dbg.optimization_used = "device_synonym_ast"
        else:
            ids = self._synonym_host_ids(groups)
        dbg.total_candidates = int(ids.size)
        if query.not_terms and ids.size:
            ids = self._apply_not(ids, query.not_terms)
            dbg.after_not = int(ids.size)
        # verify: every group must have >=1 variant present in text
        if self._verify_applies([ti for g in groups for ti in g]) and ids.size:
            ids = self._synonym_text_filter(groups, ids)
        terms = [g[0] for g in groups]
        return ids, terms

    def _synonym_host_ids(self, groups: List[List[TermInfo]]) -> np.ndarray:
        result: Optional[np.ndarray] = None
        for group in groups:
            union = np.empty(0, dtype=np.int32)
            for ti in group:
                if not ti.grams or ti.estimated_size == 0:
                    if ti.needs_substring_fallback and \
                            self.sn.doc_store.stores_texts:
                        ids = self._substring_scan_all([ti])
                    else:
                        continue
                else:
                    _, ids = self.sn.index.search_and(ti.grams, limit=0)
                union = np.union1d(union, ids)
            result = union if result is None else \
                np.intersect1d(result, union, assume_unique=True)
            if result.size == 0:
                break
        return (result if result is not None
                else np.empty(0, dtype=np.int32)).astype(np.int32)

    def _synonym_device_ids(self,
                            groups: List[List[TermInfo]]
                            ) -> Optional[np.ndarray]:
        """One-dispatch synonym candidates via the device AST program;
        None -> host set algebra (delta present, short variants, leaf
        exceeds a device shape)."""
        index = self.sn.index
        if len(index.delta) or index.frozen_delta is not None:
            return None
        device = index.device
        leaf_idx: Dict[str, int] = {}
        leaf_tids: List[Optional[List[int]]] = []
        gsigs = []
        for group in groups:
            vs = []
            for ti in group:
                if ti.needs_substring_fallback:
                    return None  # short variant: host substring scan
                key = ti.normalized
                if key not in leaf_idx:
                    leaf_idx[key] = len(leaf_tids)
                    leaf_tids.append(index.query_tids(ti.grams)
                                     if ti.grams else None)
                vs.append(("t", leaf_idx[key]))
            if not vs:
                return None
            gsigs.append(vs[0] if len(vs) == 1 else ("|",) + tuple(vs))
        if not gsigs:
            return None
        sig = gsigs[0] if len(gsigs) == 1 else ("&",) + tuple(gsigs)
        words = device.ast_words(sig, leaf_tids, device._ones_words)
        if words is None:
            return None
        from ..index.device_index import DeviceIndex
        return DeviceIndex._bitmap_to_ids(words)

    def _synonym_text_filter(self, groups: List[List[TermInfo]],
                             ids: np.ndarray) -> np.ndarray:
        """Exact-text verify with the synonym boolean structure. Large
        candidate sets ride the device per-needle contains kernel (one
        dispatch per 16k-candidate chunk) + numpy group OR/AND; small
        sets keep the per-doc host pass (old behavior: docs with no
        stored text drop out)."""
        norm_terms: List[str] = []
        for group in groups:
            for ti in group:
                if ti.normalized and ti.normalized not in norm_terms:
                    norm_terms.append(ti.normalized)
        dev_text = self.ctx.fresh_device_text()
        from ..ops.verify_ops import NEEDLE_CAP
        if dev_text is not None and ids.size >= 256 and norm_terms and \
                all(len(n) <= NEEDLE_CAP for n in norm_terms):
            dirty = self.sn.index.dirty_doc_ids()
            masks = dev_text.contains_masks(
                ids, norm_terms, self.sn.doc_store.texts_batch,
                dirty=dirty)
            col = {n: masks[:, j] for j, n in enumerate(norm_terms)}
            keep = np.ones(ids.size, dtype=bool)
            for group in groups:
                gm = np.zeros(ids.size, dtype=bool)
                for ti in group:
                    if ti.normalized:
                        gm |= col[ti.normalized]
                    else:
                        gm[:] = True
                keep &= gm
            return ids[keep].astype(np.int32)
        texts = self.sn.doc_store.texts_batch(ids.tolist())
        keep_idx = []
        for i, tx in enumerate(texts):
            if tx is None:
                continue
            if all(any(ti.normalized in tx for ti in group)
                   for group in groups):
                keep_idx.append(i)
        return ids[np.asarray(keep_idx, dtype=np.int64)] if keep_idx else \
            np.empty(0, dtype=np.int32)

    # ------------------------------------------------------------------
    # Fuzzy path
    # ------------------------------------------------------------------
    def _execute_fuzzy(self, query: Query, dbg: DebugInfo
                       ) -> Tuple[np.ndarray, List[TermInfo]]:
        """Per term: n-gram threshold candidate generation (threshold =
        max(1, |grams| - dist*n), search_pipeline.cpp:1377-1383) then
        text verification: exact substring first, else token Levenshtein."""
        if not self.sn.doc_store.stores_texts:
            raise PipelineError("FUZZY requires stored text "
                                "(memory.verify_text must not be off)")
        dist = query.fuzzy_max_distance or 1
        t = self.ctx.table_cfg
        terms = [self.term_info(x) for x in query.all_terms]
        result: Optional[np.ndarray] = None
        for ti in terms:
            if not ti.normalized:
                continue
            n = max(t.ngram_size, 1)
            # fuzzy gram-count bound uses the STANDARD emission: the
            # kanji_extra grams would inflate |grams| (and a d-edit match
            # destroys extra grams too), breaking the reference's
            # threshold = |ngrams| - dist*n shape
            base_grams = sorted(set(textproc.generate_query_ngrams(
                ti.normalized, t.ngram_size, t.kanji_ngram_size,
                t.cross_boundary_ngrams)))
            threshold = max(1, len(base_grams) - dist * n)
            cand = self.sn.index.search_by_threshold(base_grams,
                                                     threshold) \
                if base_grams else \
                np.sort(self.sn.doc_store.all_doc_ids()).astype(np.int32)
            # verify candidates against text (exact substring, then token
            # Levenshtein). Exact-substring hits resolve ON DEVICE via the
            # contains kernel (distance 0 <= any dist) so only the
            # non-exact tail pays host text transfer + Levenshtein — a
            # dist-1 common term at 1M+ docs was hauling up to 131,072
            # texts to the host per query (r3 verdict weak #3); the common
            # term's candidates are mostly exact, so the host tail is
            # small. Reference cost shape: heap merge + bounded
            # Levenshtein (index.cpp:448-528).
            from .. import native
            from ..ops.verify_ops import NEEDLE_CAP
            dev_text = self.ctx.fresh_device_text()
            if dev_text is not None and cand.size >= 256 and \
                    0 < len(ti.normalized) <= NEEDLE_CAP:
                masks = dev_text.contains_masks(
                    cand, [ti.normalized], self.sn.doc_store.texts_batch,
                    dirty=self.sn.index.dirty_doc_ids())
                exact = masks[:, 0]
                rest = cand[~exact]
                if rest.size:
                    texts = self.sn.doc_store.texts_batch(rest.tolist())
                    mask2 = native.fuzzy_verify(texts, ti.normalized, dist)
                    cand = np.sort(np.concatenate(
                        [cand[exact], rest[mask2]])).astype(np.int32)
                else:
                    cand = cand[exact].astype(np.int32)
                dbg.fuzzy_host_verified = int(rest.size) + \
                    getattr(dbg, "fuzzy_host_verified", 0)
            else:
                # prefilter-inapplicable branch (no device text pack /
                # needle past the kernel cap / tiny candidate set): page
                # the host text haul — one texts_batch over 131k
                # candidates spikes host RSS with fresh allocations
                # (~35 MB/s first touch) and starves concurrent serving
                # on the 1-core VM. Exactness kept: every page is still
                # Levenshtein-verified, just in bounded bites.
                dbg.fuzzy_host_verified = int(cand.size) + \
                    getattr(dbg, "fuzzy_host_verified", 0)
                PAGE = 8192
                if cand.size <= PAGE:
                    texts = self.sn.doc_store.texts_batch(cand.tolist())
                    mask = native.fuzzy_verify(texts, ti.normalized, dist)
                    cand = cand[mask].astype(np.int32)
                else:
                    parts = []
                    for lo in range(0, cand.size, PAGE):
                        page = cand[lo:lo + PAGE]
                        texts = self.sn.doc_store.texts_batch(
                            page.tolist())
                        mask = native.fuzzy_verify(texts, ti.normalized,
                                                   dist)
                        parts.append(page[mask])
                    cand = np.concatenate(parts).astype(np.int32)
            result = cand if result is None else \
                np.intersect1d(result, cand, assume_unique=True)
            if result.size == 0:
                break
        ids = (result if result is not None
               else np.empty(0, dtype=np.int32)).astype(np.int32)
        dbg.total_candidates = int(ids.size)
        if query.not_terms and ids.size:
            ids = self._apply_not(ids, query.not_terms)
            dbg.after_not = int(ids.size)
        return ids, terms

    # ------------------------------------------------------------------
    # Filters
    # ------------------------------------------------------------------
    def _apply_filters(self, ids: np.ndarray,
                       filters: Sequence[FilterCondition]) -> np.ndarray:
        if not ids.size:
            return ids
        mask = np.ones(ids.size, dtype=bool)
        for f in filters:
            if not self.sn.filter_index.has_column(f.column):
                raise PipelineError(f"unknown filter column: {f.column}")
            mask &= self.sn.filter_index.match_mask(
                f.column, ids.astype(np.int64), f.op.value, f.value)
        return ids[mask]

    # ------------------------------------------------------------------
    # verify_text
    # ------------------------------------------------------------------
    @staticmethod
    def _covered_exact(ti: TermInfo) -> bool:
        """A query gram EQUALS the whole normalized term: the gram AND is
        exactly substring semantics (docs with the covering gram contain
        the term; docs without it cannot), so the text post-filter can
        never change the result set. With kanji_extra_ngram this is
        every 1-2 char CJK term — the bulk of the CJK stream — and every
        ngram_size-length ASCII term."""
        return bool(ti.normalized) and ti.normalized in ti.grams

    def _verify_applies(self, terms: List[TermInfo]) -> bool:
        mode = self.cfg.memory.verify_text
        if mode == "off" or not self.sn.doc_store.stores_texts:
            return False
        if mode == "all":
            return True
        # ascii: only when every term is pure ASCII
        return all(ti.normalized.isascii() for ti in terms if ti.normalized)

    def _coverage_requires_text_check(self, terms: List[TermInfo]) -> bool:
        """Hybrid n-gram fragments that don't cover every term position
        can't guarantee adjacency — force the exact-text post-filter
        (reference RequiresExactTextForHybridFragments)."""
        t = self.ctx.table_cfg
        extra = self.ctx.kanji_extra_effective
        for ti in terms:
            s = ti.normalized
            if not s or not ti.grams:
                continue
            # a single gram equal to the whole term is EXACT substring
            # semantics — no adjacency to prove, no text check (this is
            # what the kanji_extra_ngram emission buys 2-char CJK terms)
            if s in ti.grams and all(
                    g == s or len(g) < len(s) for g in ti.grams):
                continue
            covered = [False] * len(s)
            for i, ch in enumerate(s):
                is_cjk = textproc.is_cjk_ideograph(ord(ch))
                n = t.kanji_ngram_size if is_cjk and t.kanji_ngram_size > 0 \
                    else t.ngram_size
                if i + n <= len(s) and not (
                        not t.cross_boundary_ngrams and n > 1 and any(
                            textproc.is_cjk_ideograph(ord(s[i + j]))
                            != is_cjk for j in range(1, n))):
                    for j in range(n):
                        covered[i + j] = True
                if (extra > 1 and is_cjk and i + extra <= len(s)
                        and all(textproc.is_cjk_ideograph(ord(s[i + j]))
                                for j in range(1, extra))):
                    for j in range(extra):
                        covered[i + j] = True
            if not all(covered):
                return True
        return False

    def _apply_verify(self, ids: np.ndarray, query: Query,
                      terms: List[TermInfo], path: str) -> np.ndarray:
        if not ids.size or path == "boolean_ast" or path == "synonym":
            return ids  # those paths verify internally
        uncov = [ti for ti in terms if not self._covered_exact(ti)]
        needed = (self._verify_applies(terms) and uncov) or \
            self._coverage_requires_text_check(terms)
        if not needed:
            return ids
        needles = [ti.normalized for ti in uncov if ti.normalized]
        if not needles:  # coverage-gap terms with empty normals
            needles = [ti.normalized for ti in terms if ti.normalized]
        return self._substring_filter(ids, needles)

    # ------------------------------------------------------------------
    def _column_sort_fast(self, ids: np.ndarray, ob: OrderByClause,
                          query: Query) -> np.ndarray:
        """Vectorized filter-column sort through the FilterIndex's typed
        numpy columns (NULLs last both directions); falls back to the
        generic sorter for string columns."""
        col = self.sn.filter_index._columns.get(ob.column)
        if col is None or not col.numeric:
            return ResultSorter.sort_and_paginate(
                ids, ob, query.limit, query.offset, self.sn.doc_store,
                self.sn.doc_store.pk_doc_id_order_valid)
        size = col.present.shape[0]
        in_range = ids < size
        safe = np.where(in_range, ids, 0)
        present = col.present[safe] & in_range
        vals = col.values[safe]
        desc = ob.order == SortOrder.DESC
        keys = np.where(present, -vals if desc else vals, np.inf)
        order = np.argsort(keys, kind="stable")
        ordered = ids[order]
        return ResultSorter.paginate(ordered, query.limit, query.offset)

    # ------------------------------------------------------------------
    # BM25 scoring
    # ------------------------------------------------------------------
    def _score_sort(self, query: Query, all_ids: np.ndarray,
                    terms: List[TermInfo]) -> Tuple[np.ndarray, np.ndarray]:
        if not self.sn.doc_store.stores_texts:
            raise PipelineError(
                "SORT _score requires stored normalized text "
                "(memory.verify_text must not be off)")
        ob = query.order_by or OrderByClause()
        ids_list = all_ids.tolist()
        dfs = []
        for ti in terms:
            if ti.doc_freq:
                dfs.append(ti.doc_freq)
            elif ti.grams and ti.estimated_size > 0:
                total, _ = self.sn.index.search_and(ti.grams, limit=1)
                dfs.append(total)
            else:
                dfs.append(0)
        norm_terms = [ti.normalized for ti in terms]
        dev_text = self.ctx.fresh_device_text()
        # fused device score+top-k: only limit+offset (id, score) pairs
        # cross to the host (SORT _score DESC with a LIMIT — the headline
        # CJK BM25 workload)
        if dev_text is not None and all_ids.size >= 512 and \
                query.limit > 0 and ob.order == SortOrder.DESC:
            idf = np.asarray(
                [BM25Scorer.compute_idf(self.sn.bm25.doc_count, df)
                 for df in dfs], dtype=np.float64)
            fused = dev_text.score_topk(
                all_ids, norm_terms, idf, self.sn.bm25.avg_doc_length,
                self.cfg.bm25.k1, self.cfg.bm25.b,
                query.limit + query.offset, self.sn.doc_store.texts_batch,
                dirty=self.sn.index.dirty_doc_ids())
            if fused is not None:
                ids_top, scores_top = fused
                page = ids_top[query.offset:]
                return page.astype(np.int32), scores_top[query.offset:]
        if dev_text is not None and all_ids.size >= 512:
            tf, dl = dev_text.count_tf(
                all_ids, norm_terms, self.sn.doc_store.texts_batch,
                dirty=self.sn.index.dirty_doc_ids())
            scores = BM25Scorer.score_from_tf(
                tf, dl, dfs, self.sn.bm25.doc_count,
                self.sn.bm25.avg_doc_length,
                self.cfg.bm25.k1, self.cfg.bm25.b)
        else:
            texts = self.sn.doc_store.texts_batch(ids_list)
            scores = BM25Scorer.score_documents(
                ids_list, norm_terms, dfs, texts,
                self.sn.bm25.doc_count, self.sn.bm25.avg_doc_length,
                self.cfg.bm25.k1, self.cfg.bm25.b)
        order = ResultSorter.sort_by_score(
            ids_list, scores.tolist(), ob.order == SortOrder.DESC)
        ordered = np.asarray(order, dtype=np.int32)
        page = ResultSorter.paginate(ordered, query.limit, query.offset)
        # align returned scores with the page
        pos = {d: i for i, d in enumerate(ids_list)}
        page_scores = np.asarray([scores[pos[d]] for d in page.tolist()])
        return page, page_scores


class PipelineError(Exception):
    pass
