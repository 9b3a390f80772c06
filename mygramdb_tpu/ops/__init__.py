"""Device-side ops: the TPU data plane.

Every op has a pure-jnp (XLA) reference implementation; the hot ones also
have Pallas TPU kernels selected at runtime (``runtime.use_pallas()``).
Tests run the jnp path on a virtual CPU mesh; the TPU serving path runs the
Pallas variants.

Reference hot loops these replace (SURVEY.md §3.2): posting-list
intersection (index.cpp:286-352), bitmap filter AND, threshold k-way merge
(index.cpp:448-528), BM25 TF/score, top-N extraction.
"""

from . import runtime

# Persistent XLA compilation cache: kernel compiles survive restarts (vital
# on tunneled TPU backends where each compile is a network roundtrip).
runtime.configure_compilation_cache()

from .bitmap_ops import (  # noqa: E402
    popcount_words, and_rows, or_rows, andnot, expand_bits,
    topn_from_bitmap, count_bitmap, bit_member, make_bitmap_from_ids,
)
from .posting_ops import (
    SENTINEL, gather_slices, membership_sorted, bitmap_membership,
    mask_to_topn, intersect_candidates,
)
from .threshold_ops import threshold_merge

__all__ = [
    "runtime", "popcount_words", "and_rows", "or_rows", "andnot",
    "expand_bits", "topn_from_bitmap", "count_bitmap", "bit_member",
    "make_bitmap_from_ids", "SENTINEL", "gather_slices",
    "membership_sorted", "bitmap_membership", "mask_to_topn",
    "intersect_candidates", "threshold_merge",
]
