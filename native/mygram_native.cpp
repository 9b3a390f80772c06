// Native host-path kernels for mygramdb-tpu.
//
// The reference engine is C++17 throughout; in this framework the TPU owns
// the index data plane and these C++ kernels own the host-side hot loops
// that remain: verify_text substring scans, BM25 term-frequency counting,
// fuzzy Levenshtein verification, hybrid n-gram shredding, and sorted-set
// operations. Exposed as a plain C ABI consumed via ctypes
// (mygramdb_tpu/native.py); all buffers are caller-allocated numpy arrays.
//
// Text is passed as UTF-32 code points (numpy uint32) — Python's
// str.encode('utf-32-le') produces it at C speed, and code-point indexing
// matches the reference's semantics (lengths and offsets in code points).
//
// Build: make -C native   (produces libmygram_native.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Levenshtein (banded, O(min) space) — reference utils/edit_distance.cpp
// ---------------------------------------------------------------------------
int64_t mg_levenshtein(const uint32_t* a, int64_t la, const uint32_t* b,
                       int64_t lb, int64_t max_d) {
  if (la > lb) {
    std::swap(a, b);
    std::swap(la, lb);
  }
  if (lb - la > max_d) return max_d + 1;
  std::vector<int64_t> prev(la + 1), cur(la + 1);
  for (int64_t i = 0; i <= la; ++i) prev[i] = i;
  for (int64_t j = 1; j <= lb; ++j) {
    cur[0] = j;
    uint32_t bj = b[j - 1];
    int64_t row_min = cur[0];
    for (int64_t i = 1; i <= la; ++i) {
      int64_t cost = (a[i - 1] == bj) ? 0 : 1;
      int64_t v = std::min({prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost});
      cur[i] = v;
      if (v < row_min) row_min = v;
    }
    if (row_min > max_d) return max_d + 1;
    std::swap(prev, cur);
  }
  return prev[la] <= max_d ? prev[la] : max_d + 1;
}

// token-level fuzzy contains: any whitespace-delimited token of text within
// max_d of term (reference ContainsFuzzyMatch)
static bool is_space_cp(uint32_t c) {
  return c == 0x20 || c == 0x09 || c == 0x0A || c == 0x0D || c == 0x3000;
}

int32_t mg_contains_fuzzy(const uint32_t* text, int64_t lt,
                          const uint32_t* term, int64_t lterm,
                          int64_t max_d) {
  if (lterm == 0) return 1;
  int64_t i = 0;
  while (i < lt) {
    while (i < lt && is_space_cp(text[i])) ++i;
    int64_t start = i;
    while (i < lt && !is_space_cp(text[i])) ++i;
    int64_t len = i - start;
    if (len > 0 && llabs(len - lterm) <= max_d) {
      if (mg_levenshtein(text + start, len, term, lterm, max_d) <= max_d)
        return 1;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Substring search over code points
// ---------------------------------------------------------------------------
static bool contains_cp(const uint32_t* hay, int64_t lh, const uint32_t* nee,
                        int64_t ln) {
  if (ln == 0) return true;
  if (ln > lh) return false;
  const uint32_t first = nee[0];
  for (int64_t i = 0; i + ln <= lh; ++i) {
    if (hay[i] != first) continue;
    if (std::memcmp(hay + i, nee, sizeof(uint32_t) * ln) == 0) return true;
  }
  return false;
}

// verify_text: out_mask[d] = 1 iff every needle is a substring of text d.
// texts: concatenated code points with offsets (n_texts+1 entries).
void mg_substring_verify(const uint32_t* text_buf, const int64_t* text_off,
                         int64_t n_texts, const uint32_t* needle_buf,
                         const int64_t* needle_off, int64_t n_needles,
                         uint8_t* out_mask) {
  for (int64_t d = 0; d < n_texts; ++d) {
    const uint32_t* t = text_buf + text_off[d];
    int64_t lt = text_off[d + 1] - text_off[d];
    uint8_t ok = 1;
    for (int64_t n = 0; n < n_needles; ++n) {
      const uint32_t* ne = needle_buf + needle_off[n];
      int64_t ln = needle_off[n + 1] - needle_off[n];
      if (!contains_cp(t, lt, ne, ln)) {
        ok = 0;
        break;
      }
    }
    out_mask[d] = ok;
  }
}

// BM25 TF: out[d * n_terms + k] = non-overlapping occurrences of term k in
// text d; out_len[d] = text length in code points.
void mg_count_occurrences(const uint32_t* text_buf, const int64_t* text_off,
                          int64_t n_texts, const uint32_t* term_buf,
                          const int64_t* term_off, int64_t n_terms,
                          int32_t* out_tf, int32_t* out_len) {
  for (int64_t d = 0; d < n_texts; ++d) {
    const uint32_t* t = text_buf + text_off[d];
    int64_t lt = text_off[d + 1] - text_off[d];
    out_len[d] = static_cast<int32_t>(lt);
    for (int64_t k = 0; k < n_terms; ++k) {
      const uint32_t* te = term_buf + term_off[k];
      int64_t ln = term_off[k + 1] - term_off[k];
      int32_t count = 0;
      if (ln > 0) {
        int64_t i = 0;
        while (i + ln <= lt) {
          if (t[i] == te[0] &&
              std::memcmp(t + i, te, sizeof(uint32_t) * ln) == 0) {
            ++count;
            i += ln;  // non-overlapping
          } else {
            ++i;
          }
        }
      }
      out_tf[d * n_terms + k] = count;
    }
  }
}

// fuzzy verification batch: out_mask[d] = 1 iff term is an exact substring
// OR a whitespace token within max_d.
void mg_fuzzy_verify(const uint32_t* text_buf, const int64_t* text_off,
                     int64_t n_texts, const uint32_t* term, int64_t lterm,
                     int64_t max_d, uint8_t* out_mask) {
  for (int64_t d = 0; d < n_texts; ++d) {
    const uint32_t* t = text_buf + text_off[d];
    int64_t lt = text_off[d + 1] - text_off[d];
    out_mask[d] = contains_cp(t, lt, term, lterm) ||
                  mg_contains_fuzzy(t, lt, term, lterm, max_d);
  }
}

// ---------------------------------------------------------------------------
// Sorted-set operations (int32 doc ids) — host-side AST/merge paths
// ---------------------------------------------------------------------------
int64_t mg_intersect_sorted(const int32_t* a, int64_t la, const int32_t* b,
                            int64_t lb, int32_t* out) {
  int64_t i = 0, j = 0, n = 0;
  while (i < la && j < lb) {
    if (a[i] < b[j])
      ++i;
    else if (a[i] > b[j])
      ++j;
    else {
      out[n++] = a[i];
      ++i;
      ++j;
    }
  }
  return n;
}

int64_t mg_union_sorted(const int32_t* a, int64_t la, const int32_t* b,
                        int64_t lb, int32_t* out) {
  int64_t i = 0, j = 0, n = 0;
  while (i < la && j < lb) {
    int32_t v;
    if (a[i] < b[j])
      v = a[i++];
    else if (a[i] > b[j])
      v = b[j++];
    else {
      v = a[i];
      ++i;
      ++j;
    }
    out[n++] = v;
  }
  while (i < la) out[n++] = a[i++];
  while (j < lb) out[n++] = b[j++];
  return n;
}

int64_t mg_difference_sorted(const int32_t* a, int64_t la, const int32_t* b,
                             int64_t lb, int32_t* out) {
  int64_t i = 0, j = 0, n = 0;
  while (i < la) {
    while (j < lb && b[j] < a[i]) ++j;
    if (j >= lb || b[j] != a[i]) out[n++] = a[i];
    ++i;
  }
  return n;
}

// ---------------------------------------------------------------------------
// Hybrid n-gram shredding over code points (reference
// string_utils.cpp:460-517 semantics). Emits (start, len) pairs; Python
// slices the original string once per gram only for unseen hashes.
// Also emits FNV-1a 64-bit hashes for fast term-dict probing.
// ---------------------------------------------------------------------------
// Gram hash: 64-bit mul-xorshift mix per CODE POINT (not per byte — the
// byte-wise FNV-1a loop was 16 multiplies per bigram and dominated the
// shredder's inner loop; this is 2 + a final avalanche). The hash is
// internal-only (gram-hash -> tid tables rebuilt per process; never
// persisted), but the two emitters below and mg_shred_batch MUST agree:
// the builder mixes per-doc and batched paths over one h2t table.
static inline uint64_t gram_hash(const uint32_t* cp, int32_t size) {
  uint64_t h = 0x243F6A8885A308D3ULL ^ static_cast<uint64_t>(size);
  for (int32_t j = 0; j < size; ++j) {
    h ^= cp[j];
    h *= 0x9E3779B97F4A7C15ULL;
    h ^= h >> 29;
  }
  h ^= h >> 32;
  h *= 0xD6E8FEB86659FD93ULL;
  h ^= h >> 32;
  return h;
}

static bool is_cjk_ideograph(uint32_t cp) {
  return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
         (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
         (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0xF900 && cp <= 0xFAFF);
}

// returns number of grams; caller buffers sized >= n_cps
int64_t mg_hybrid_ngrams(const uint32_t* cps, int64_t n, int32_t ascii_n,
                         int32_t kanji_n, int32_t cross_boundary,
                         int32_t* out_start, int32_t* out_len,
                         uint64_t* out_hash) {
  if (ascii_n <= 0 || kanji_n <= 0 || n <= 0) return 0;
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    bool start_cjk = is_cjk_ideograph(cps[i]);
    int32_t size = start_cjk ? kanji_n : ascii_n;
    if (i + size > n) continue;
    if (!cross_boundary && size > 1) {
      bool crossed = false;
      for (int32_t j = 1; j < size; ++j) {
        if (is_cjk_ideograph(cps[i + j]) != start_cjk) {
          crossed = true;
          break;
        }
      }
      if (crossed) continue;
    }
    uint64_t h = gram_hash(cps + i, size);
    out_start[count] = static_cast<int32_t>(i);
    out_len[count] = size;
    out_hash[count] = h;
    ++count;
  }
  return count;
}

// Batched hybrid shred with PER-DOC dedup: one call shreds a whole loader
// batch (the per-call ctypes overhead and the per-doc numpy dedup were the
// index-build bottleneck). Input: concatenated UTF-32 buffer + per-doc
// offsets/lengths. Output: per-doc-unique gram hashes with (start,len)
// into the buffer for first occurrences, plus per-doc gram counts.
// Returns total grams written (capacity = sum of doc lengths).
int64_t mg_shred_batch(const uint32_t* cps, const int64_t* doc_off,
                       const int32_t* doc_len, int64_t n_docs,
                       int32_t ascii_n, int32_t kanji_n,
                       int32_t cross_boundary, int32_t* out_start,
                       int32_t* out_len, uint64_t* out_hash,
                       int32_t* out_doc_counts) {
  if (ascii_n <= 0 || kanji_n <= 0) return 0;
  int64_t total = 0;
  // open-addressing set reused across docs (docs have <= few hundred grams)
  std::vector<uint64_t> slots;
  for (int64_t d = 0; d < n_docs; ++d) {
    const uint32_t* t = cps + doc_off[d];
    const int64_t n = doc_len[d];
    int32_t dcount = 0;
    size_t cap = 64;
    while (cap < static_cast<size_t>(n) * 2 + 8) cap <<= 1;
    slots.assign(cap, 0);
    for (int64_t i = 0; i < n; ++i) {
      bool start_cjk = is_cjk_ideograph(t[i]);
      int32_t size = start_cjk ? kanji_n : ascii_n;
      if (i + size > n) continue;
      if (!cross_boundary && size > 1) {
        bool crossed = false;
        for (int32_t j = 1; j < size; ++j) {
          if (is_cjk_ideograph(t[i + j]) != start_cjk) {
            crossed = true;
            break;
          }
        }
        if (crossed) continue;
      }
      uint64_t h = gram_hash(t + i, size);
      uint64_t key = h ? h : 1;  // reserve 0 for empty slots
      size_t pos = static_cast<size_t>(key) & (cap - 1);
      bool dup = false;
      while (slots[pos]) {
        if (slots[pos] == key) {
          dup = true;
          break;
        }
        pos = (pos + 1) & (cap - 1);
      }
      if (dup) continue;
      slots[pos] = key;
      out_start[total] = static_cast<int32_t>(doc_off[d] + i);
      out_len[total] = size;
      out_hash[total] = h;
      ++total;
      ++dcount;
    }
    out_doc_counts[d] = dcount;
  }
  return total;
}

// Batched hybrid shred WITHOUT dedup: one entry per gram OCCURRENCE, in
// document order then position order — the positional-index build input
// (index/positional.py). Same emission rules as mg_shred_batch; per-doc
// counts are occurrence counts. Capacity = sum of doc lengths.
int64_t mg_shred_batch_all(const uint32_t* cps, const int64_t* doc_off,
                           const int32_t* doc_len, int64_t n_docs,
                           int32_t ascii_n, int32_t kanji_n,
                           int32_t cross_boundary, int32_t* out_start,
                           int32_t* out_len, uint64_t* out_hash,
                           int32_t* out_doc_counts) {
  if (ascii_n <= 0 || kanji_n <= 0) return 0;
  int64_t total = 0;
  for (int64_t d = 0; d < n_docs; ++d) {
    const uint32_t* t = cps + doc_off[d];
    const int64_t n = doc_len[d];
    int32_t dcount = 0;
    for (int64_t i = 0; i < n; ++i) {
      bool start_cjk = is_cjk_ideograph(t[i]);
      int32_t size = start_cjk ? kanji_n : ascii_n;
      if (i + size > n) continue;
      if (!cross_boundary && size > 1) {
        bool crossed = false;
        for (int32_t j = 1; j < size; ++j) {
          if (is_cjk_ideograph(t[i + j]) != start_cjk) {
            crossed = true;
            break;
          }
        }
        if (crossed) continue;
      }
      out_start[total] = static_cast<int32_t>(doc_off[d] + i);
      out_len[total] = size;
      out_hash[total] = gram_hash(t + i, size);
      ++total;
      ++dcount;
    }
    out_doc_counts[d] = dcount;
  }
  return total;
}


// kanji_extra emission (textproc.generate_hybrid_ngrams kanji_extra):
// CJK positions ALSO emit a kanji_extra-gram when the whole window is
// CJK. Returns the extra size to emit at i, or 0.
static inline int32_t mg_extra_at(const uint32_t* t, int64_t n, int64_t i,
                                  bool start_cjk, int32_t kanji_n,
                                  int32_t kanji_extra) {
  if (kanji_extra <= 1 || !start_cjk || kanji_extra == kanji_n ||
      i + kanji_extra > n)
    return 0;
  for (int32_t j = 1; j < kanji_extra; ++j)
    if (!is_cjk_ideograph(t[i + j])) return 0;
  return kanji_extra;
}

// _x variants: same as the originals plus kanji_extra emission. Separate
// symbols (not changed signatures) so a stale prebuilt .so can never be
// called with the wrong ABI — python falls back to the pure path when
// the symbol is absent.
extern "C" int64_t mg_hybrid_ngrams_x(const uint32_t* cps, int64_t n,
                                      int32_t ascii_n, int32_t kanji_n,
                                      int32_t cross_boundary,
                                      int32_t kanji_extra,
                                      int32_t* out_start, int32_t* out_len,
                                      uint64_t* out_hash) {
  if (ascii_n <= 0 || kanji_n <= 0 || n <= 0) return 0;
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    bool start_cjk = is_cjk_ideograph(cps[i]);
    int32_t size = start_cjk ? kanji_n : ascii_n;
    if (i + size <= n) {
      bool crossed = false;
      if (!cross_boundary && size > 1) {
        for (int32_t j = 1; j < size; ++j) {
          if (is_cjk_ideograph(cps[i + j]) != start_cjk) {
            crossed = true;
            break;
          }
        }
      }
      if (!crossed) {
        out_start[count] = static_cast<int32_t>(i);
        out_len[count] = size;
        out_hash[count] = gram_hash(cps + i, size);
        ++count;
      }
    }
    int32_t ex = mg_extra_at(cps, n, i, start_cjk, kanji_n, kanji_extra);
    if (ex) {
      out_start[count] = static_cast<int32_t>(i);
      out_len[count] = ex;
      out_hash[count] = gram_hash(cps + i, ex);
      ++count;
    }
  }
  return count;
}

extern "C" int64_t mg_shred_batch_x(const uint32_t* cps,
                                    const int64_t* doc_off,
                                    const int32_t* doc_len, int64_t n_docs,
                                    int32_t ascii_n, int32_t kanji_n,
                                    int32_t cross_boundary,
                                    int32_t kanji_extra, int32_t* out_start,
                                    int32_t* out_len, uint64_t* out_hash,
                                    int32_t* out_doc_counts) {
  if (ascii_n <= 0 || kanji_n <= 0) return 0;
  int64_t total = 0;
  std::vector<uint64_t> slots;
  for (int64_t d = 0; d < n_docs; ++d) {
    const uint32_t* t = cps + doc_off[d];
    const int64_t n = doc_len[d];
    int32_t dcount = 0;
    size_t cap = 64;
    while (cap < static_cast<size_t>(n) * 4 + 8) cap <<= 1;
    slots.assign(cap, 0);
    for (int64_t i = 0; i < n; ++i) {
      bool start_cjk = is_cjk_ideograph(t[i]);
      int32_t sizes[2];
      int32_t n_sizes = 0;
      int32_t size = start_cjk ? kanji_n : ascii_n;
      if (i + size <= n) {
        bool crossed = false;
        if (!cross_boundary && size > 1) {
          for (int32_t j = 1; j < size; ++j) {
            if (is_cjk_ideograph(t[i + j]) != start_cjk) {
              crossed = true;
              break;
            }
          }
        }
        if (!crossed) sizes[n_sizes++] = size;
      }
      int32_t ex = mg_extra_at(t, n, i, start_cjk, kanji_n, kanji_extra);
      if (ex) sizes[n_sizes++] = ex;
      for (int32_t si = 0; si < n_sizes; ++si) {
        int32_t sz = sizes[si];
        uint64_t h = gram_hash(t + i, sz);
        uint64_t key = h ? h : 1;
        size_t pos = static_cast<size_t>(key) & (cap - 1);
        bool dup = false;
        while (slots[pos]) {
          if (slots[pos] == key) {
            dup = true;
            break;
          }
          pos = (pos + 1) & (cap - 1);
        }
        if (dup) continue;
        slots[pos] = key;
        out_start[total] = static_cast<int32_t>(doc_off[d] + i);
        out_len[total] = sz;
        out_hash[total] = h;
        ++total;
        ++dcount;
      }
    }
    out_doc_counts[d] = dcount;
  }
  return total;
}

extern "C" int64_t mg_shred_batch_all_x(const uint32_t* cps,
                                        const int64_t* doc_off,
                                        const int32_t* doc_len,
                                        int64_t n_docs, int32_t ascii_n,
                                        int32_t kanji_n,
                                        int32_t cross_boundary,
                                        int32_t kanji_extra,
                                        int32_t* out_start,
                                        int32_t* out_len,
                                        uint64_t* out_hash,
                                        int32_t* out_doc_counts) {
  if (ascii_n <= 0 || kanji_n <= 0) return 0;
  int64_t total = 0;
  for (int64_t d = 0; d < n_docs; ++d) {
    const uint32_t* t = cps + doc_off[d];
    const int64_t n = doc_len[d];
    int32_t dcount = 0;
    for (int64_t i = 0; i < n; ++i) {
      bool start_cjk = is_cjk_ideograph(t[i]);
      int32_t size = start_cjk ? kanji_n : ascii_n;
      if (i + size <= n) {
        bool crossed = false;
        if (!cross_boundary && size > 1) {
          for (int32_t j = 1; j < size; ++j) {
            if (is_cjk_ideograph(t[i + j]) != start_cjk) {
              crossed = true;
              break;
            }
          }
        }
        if (!crossed) {
          out_start[total] = static_cast<int32_t>(doc_off[d] + i);
          out_len[total] = size;
          out_hash[total] = gram_hash(t + i, size);
          ++total;
          ++dcount;
        }
      }
      int32_t ex = mg_extra_at(t, n, i, start_cjk, kanji_n, kanji_extra);
      if (ex) {
        out_start[total] = static_cast<int32_t>(doc_off[d] + i);
        out_len[total] = ex;
        out_hash[total] = gram_hash(t + i, ex);
        ++total;
        ++dcount;
      }
    }
    out_doc_counts[d] = dcount;
  }
  return total;
}

// ---------------------------------------------------------------------------
// Positional finalize, pass A: per-term occurrence + unique-doc histograms
// over one occurrence chunk. last_doc (V,) persists across chunks (stream
// order keeps the counting sort stable); initialize to -1 before chunk 0.
// ---------------------------------------------------------------------------
void mg_pos_hist(const int32_t* tids, const int32_t* doc_ids,
                 const int64_t* doc_counts, int64_t n_rle,
                 int64_t* occ_counts, int64_t* uniq_counts,
                 int32_t* last_doc) {
  int64_t k = 0;
  for (int64_t j = 0; j < n_rle; ++j) {
    const int32_t d = doc_ids[j];
    const int64_t c = doc_counts[j];
    for (int64_t i = 0; i < c; ++i, ++k) {
      const int32_t t = tids[k];
      occ_counts[t]++;
      if (last_doc[t] != d) {
        uniq_counts[t]++;
        last_doc[t] = d;
      }
    }
  }
}

// Positional finalize, pass B: scatter one chunk into the CSR + occurrence
// arrays. doc_cursors: per-term write position into out_postings/out_occ_cnt
// (init = exclusive prefix sum of uniq_counts); occ_cursors: per-term write
// position into out_occ_pos (init = the 8-ALIGNED region starts); last_doc:
// (V,) re-initialized to -1 before chunk 0 (pass B tracks its own). Emits
// the DEDUPED doc CSR, per-posting occurrence counts, and the grouped
// position stream in one pass — no separate dedup step.
void mg_scatter_pos(const int32_t* tids, const int32_t* doc_ids,
                    const int64_t* doc_counts, int64_t n_rle,
                    const uint16_t* pos, int64_t* doc_cursors,
                    int64_t* occ_cursors, int32_t* last_doc,
                    int32_t* out_postings, uint16_t* out_occ_cnt,
                    uint16_t* out_occ_pos) {
  int64_t k = 0;
  for (int64_t j = 0; j < n_rle; ++j) {
    const int32_t d = doc_ids[j];
    const int64_t c = doc_counts[j];
    for (int64_t i = 0; i < c; ++i, ++k) {
      const int32_t t = tids[k];
      if (last_doc[t] != d) {
        out_postings[doc_cursors[t]] = d;
        out_occ_cnt[doc_cursors[t]] = 1;
        doc_cursors[t]++;
        last_doc[t] = d;
      } else {
        out_occ_cnt[doc_cursors[t] - 1]++;
      }
      out_occ_pos[occ_cursors[t]++] = pos[k];
    }
  }
}

// ---------------------------------------------------------------------------
// Persistent gram-hash -> term-id table (reference: Index's term hash map,
// index.cpp:79-115). The builder's per-batch np.unique over ALL gram hashes
// was the remaining index-build bottleneck; this table turns the steady
// state (vocabulary saturated) into one linear C pass per batch, with only
// never-seen hashes escaping to Python for string materialization.
// Open addressing, linear probing, capacity always a power of two.
// ---------------------------------------------------------------------------
struct MgH2T {
  std::vector<uint64_t> keys;  // 0 = empty (hashes are remapped 0 -> 1)
  std::vector<int64_t> vals;
  size_t used = 0;

  explicit MgH2T(size_t cap = 1 << 16) : keys(cap, 0), vals(cap, 0) {}

  void grow() {
    std::vector<uint64_t> ok;
    std::vector<int64_t> ov;
    ok.swap(keys);
    ov.swap(vals);
    keys.assign(ok.size() * 2, 0);
    vals.assign(ok.size() * 2, 0);
    const size_t mask = keys.size() - 1;
    for (size_t i = 0; i < ok.size(); ++i) {
      if (!ok[i]) continue;
      size_t pos = static_cast<size_t>(ok[i]) & mask;
      while (keys[pos]) pos = (pos + 1) & mask;
      keys[pos] = ok[i];
      vals[pos] = ov[i];
    }
  }

  void insert(uint64_t key, int64_t val) {
    if (!key) key = 1;
    if ((used + 1) * 10 >= keys.size() * 7) grow();
    const size_t mask = keys.size() - 1;
    size_t pos = static_cast<size_t>(key) & mask;
    while (keys[pos]) {
      if (keys[pos] == key) {
        vals[pos] = val;
        return;
      }
      pos = (pos + 1) & mask;
    }
    keys[pos] = key;
    vals[pos] = val;
    ++used;
  }

  bool find(uint64_t key, int64_t* out) const {
    if (!key) key = 1;
    const size_t mask = keys.size() - 1;
    size_t pos = static_cast<size_t>(key) & mask;
    while (keys[pos]) {
      if (keys[pos] == key) {
        *out = vals[pos];
        return true;
      }
      pos = (pos + 1) & mask;
    }
    return false;
  }
};

void* mg_h2t_create(void) { return new MgH2T(); }

void mg_h2t_destroy(void* h) { delete static_cast<MgH2T*>(h); }

int64_t mg_h2t_size(void* h) {
  return static_cast<int64_t>(static_cast<MgH2T*>(h)->used);
}

// Writes tid (or -1 when absent) per hash; returns the miss count.
int64_t mg_h2t_lookup(void* h, const uint64_t* hashes, int64_t n,
                      int64_t* tids_out) {
  const MgH2T* t = static_cast<MgH2T*>(h);
  int64_t misses = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t v;
    if (t->find(hashes[i], &v)) {
      tids_out[i] = v;
    } else {
      tids_out[i] = -1;
      ++misses;
    }
  }
  return misses;
}

void mg_h2t_insert(void* h, const uint64_t* hashes, const int64_t* tids,
                   int64_t n) {
  MgH2T* t = static_cast<MgH2T*>(h);
  for (int64_t i = 0; i < n; ++i) t->insert(hashes[i], tids[i]);
}

// ---------------------------------------------------------------------------
// Parallel stable counting sort of (tid, doc) pairs by tid — the index
// builder's finalize step (replaces np.argsort over 100M+ pairs: the
// reference's InitialLoader batch path builds hash-map postings per batch,
// index.cpp:79-115; our sorted-segment design needs one grouping pass).
// Stability preserves per-term doc arrival order, so a doc-sorted stream
// yields sorted postings with no comparison sort anywhere.
// ---------------------------------------------------------------------------
void mg_radix_finalize(const int32_t* tids, const int32_t* docs, int64_t E,
                       int32_t V, int32_t n_threads, int32_t* out_postings,
                       int32_t* out_lengths) {
  int T = n_threads > 0 ? (n_threads < 8 ? n_threads : 8) : 1;
  if (E < (1 << 20)) T = 1;
  int64_t chunk = (E + T - 1) / T;
  // pass 1: per-thread histograms
  std::vector<std::vector<int64_t>> starts(T, std::vector<int64_t>(V, 0));
  {
    std::vector<std::thread> th;
    for (int t = 0; t < T; ++t) {
      th.emplace_back([&, t] {
        int64_t s = t * chunk;
        int64_t e = s + chunk < E ? s + chunk : E;
        auto& c = starts[t];
        for (int64_t i = s; i < e; ++i) c[tids[i]]++;
      });
    }
    for (auto& x : th) x.join();
  }
  // exclusive prefix over (tid, thread): starts[t][v] becomes the scatter
  // base for thread t's occurrences of tid v
  int64_t run = 0;
  for (int32_t v = 0; v < V; ++v) {
    int64_t tot = 0;
    for (int t = 0; t < T; ++t) {
      int64_t c = starts[t][v];
      starts[t][v] = run + tot;
      tot += c;
    }
    out_lengths[v] = static_cast<int32_t>(tot);
    run += tot;
  }
  // pass 2: stable scatter
  {
    std::vector<std::thread> th;
    for (int t = 0; t < T; ++t) {
      th.emplace_back([&, t] {
        int64_t s = t * chunk;
        int64_t e = s + chunk < E ? s + chunk : E;
        auto& cur = starts[t];
        for (int64_t i = s; i < e; ++i) out_postings[cur[tids[i]]++] = docs[i];
      });
    }
    for (auto& x : th) x.join();
  }
}

// ---------------------------------------------------------------------------
// Chunked/RLE variants of the finalize passes. The builder accumulates
// (tid, doc) pairs in chunks; materializing them into the two flat arrays
// mg_radix_finalize wants costs a full extra copy of the pair stream at
// peak (the dominant host-RSS spike at 1M+ docs: ~2 GB/1M). These helpers
// let the builder keep chunks as-is — doc ids run-length encoded (they
// repeat once per gram of the doc) — and stream them through the same
// histogram + stable-scatter algorithm with a shared cursor array, freeing
// each chunk as it is consumed.
// ---------------------------------------------------------------------------
void mg_tid_hist(const int32_t* tids, int64_t E, int64_t* counts) {
  for (int64_t i = 0; i < E; ++i) counts[tids[i]]++;
}

// Scatter one chunk's pairs into the postings array. tids: (E,) gram term
// ids in stream order; docs are RLE: doc_ids[j] repeats doc_counts[j]
// times, sum(doc_counts) == E. cursors: (V,) running per-term write
// positions (caller initializes to the exclusive prefix sum of lengths and
// passes the SAME array for every chunk, in stream order — that is what
// keeps the counting sort stable).
void mg_scatter_rle(const int32_t* tids, const int32_t* doc_ids,
                    const int64_t* doc_counts, int64_t n_docs,
                    int64_t* cursors, int32_t* out_postings) {
  int64_t k = 0;
  for (int64_t j = 0; j < n_docs; ++j) {
    const int32_t d = doc_ids[j];
    const int64_t c = doc_counts[j];
    for (int64_t i = 0; i < c; ++i, ++k)
      out_postings[cursors[tids[k]]++] = d;
  }
}

// ---------------------------------------------------------------------------
// One-pass UTF-8 -> UTF-16 corpus decode (DeviceTextStore pack path).
//
// The frozen doc store keeps normalized texts as one UTF-8 blob; the device
// text pack wants a flat uint16 code-point array (BMP corpora halve HBM and
// host bytes). The Python route (per-chunk str decode -> utf-32 -> concat ->
// astype(u16)) allocates ~5x the corpus size in intermediates — on hosts
// where first-touch page faults dominate (measured ~35 MB/s vs 4.8 GB/s on
// warm pages), that is the entire pack cost. This decodes the whole blob
// into ONE caller-allocated buffer.
//
// Per doc d: decodes bytes [byte_off[d], byte_off[d+1]) into
// out[cp_off[d] .. cp_off[d+1]). Code points >= 0xFFFF (non-BMP, or the
// U+FFFF sentinel itself) write `sentinel` and set bad_doc[d] = 1 — those
// docs route to the host verify path. Malformed sequences or a count
// mismatch vs cp_off also mark the doc bad (cells sentinel-filled, offsets
// stay aligned). Returns total cells written.
// ---------------------------------------------------------------------------
int64_t mg_utf8_decode_u16(const uint8_t* blob, const int64_t* byte_off,
                           const int64_t* cp_off, int64_t n_docs,
                           uint16_t* out, uint16_t sentinel,
                           uint8_t* bad_doc) {
  int64_t total = 0;
  for (int64_t d = 0; d < n_docs; ++d) {
    const uint8_t* p = blob + byte_off[d];
    const uint8_t* end = blob + byte_off[d + 1];
    uint16_t* o = out + cp_off[d];
    uint16_t* omax = out + cp_off[d + 1];
    uint8_t bad = 0;
    while (p < end && o < omax) {
      uint32_t cp;
      uint8_t b0 = *p;
      if (b0 < 0x80) {
        cp = b0;
        p += 1;
      } else if ((b0 >> 5) == 0x6 && p + 1 < end) {
        cp = ((uint32_t)(b0 & 0x1F) << 6) | (p[1] & 0x3F);
        p += 2;
      } else if ((b0 >> 4) == 0xE && p + 2 < end) {
        cp = ((uint32_t)(b0 & 0x0F) << 12) |
             ((uint32_t)(p[1] & 0x3F) << 6) | (p[2] & 0x3F);
        p += 3;
      } else if ((b0 >> 3) == 0x1E && p + 3 < end) {
        cp = ((uint32_t)(b0 & 0x07) << 18) |
             ((uint32_t)(p[1] & 0x3F) << 12) |
             ((uint32_t)(p[2] & 0x3F) << 6) | (p[3] & 0x3F);
        p += 4;
      } else {  // truncated/malformed: poison the doc, stop decoding it
        cp = 0xFFFFFFFFu;
        p = end;
        bad = 1;
      }
      if (cp >= 0xFFFFu) {
        *o++ = sentinel;
        bad = 1;
      } else {
        *o++ = (uint16_t)cp;
      }
    }
    if (o != omax || p != end) bad = 1;
    while (o < omax) *o++ = sentinel;
    bad_doc[d] = bad;
    total += cp_off[d + 1] - cp_off[d];
  }
  return total;
}

}  // extern "C"
