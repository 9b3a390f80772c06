"""Delta-packed uint16 result transport parity (bitmap_ops).

dense_search_topn_packed must return byte-identical results to
dense_search_topn across direction, padding (-1 rows), counts > n, empty
results, and the uint16 delta-overflow fallback (sparse matches spread
wider than 65535 doc ids apart).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mygramdb_tpu.ops import bitmap_ops


def _mk(bits_by_row, W):
    """bits_by_row: list of sorted doc-id lists -> (V+2, W) uint32 matrix
    with the usual ones/zeros sentinel rows appended."""
    V = len(bits_by_row)
    bm = np.zeros((V + 2, W), dtype=np.uint32)
    for r, ids in enumerate(bits_by_row):
        for d in ids:
            bm[r, d >> 5] |= np.uint32(1) << (d & 31)
    bm[V] = 0xFFFFFFFF  # ones sentinel
    bm[V + 1] = 0       # zeros sentinel
    return bm, V, V + 1


@pytest.mark.parametrize("descending", [True, False])
@pytest.mark.parametrize("seed", [0, 1])
def test_packed_matches_unpacked(descending, seed):
    rng = np.random.default_rng(seed)
    W = 2048  # 65536 docs: exercises the hierarchical extractor
    n_docs = W * 32
    rows_sets = []
    for _ in range(6):
        df = int(rng.integers(5, 4000))
        rows_sets.append(sorted(rng.choice(n_docs - 2, size=df,
                                           replace=False) + 1))
    bm, ones, zeros = _mk(rows_sets, W)
    bitmaps = jnp.asarray(bm)
    deleted = jnp.zeros(W, dtype=jnp.uint32)
    extra = jnp.zeros((1, W), dtype=jnp.uint32)
    B, K, n = 16, 4, 128
    rows = rng.integers(0, len(rows_sets), size=(B, K)).astype(np.int32)
    rows[:, K - 1] = ones  # padding slot
    nrows = np.full((B, 1), zeros, dtype=np.int32)

    c0, i0 = bitmap_ops.dense_search_topn(
        bitmaps, jnp.asarray(rows), jnp.asarray(nrows), deleted, extra,
        False, False, n, descending)
    c1, i1 = bitmap_ops.dense_search_topn_packed(
        bitmaps, jnp.asarray(rows), jnp.asarray(nrows), deleted, extra,
        False, False, n, descending)
    assert (np.asarray(c0) == c1).all()
    assert (np.asarray(i0) == i1).all()


@pytest.mark.parametrize("descending", [True, False])
def test_packed_overflow_fallback(descending):
    """Matches > 65535 ids apart force the int32 fallback pull — results
    must still be exact."""
    W = 8192  # 262144 docs
    spread = [1, 70_000, 140_001, 260_000]  # deltas ~70k > u16
    near = list(range(100, 130))
    bm, ones, zeros = _mk([spread, near], W)
    bitmaps = jnp.asarray(bm)
    deleted = jnp.zeros(W, dtype=jnp.uint32)
    extra = jnp.zeros((1, W), dtype=jnp.uint32)
    rows = np.asarray([[0, ones], [1, ones]], dtype=np.int32)
    nrows = np.full((2, 1), zeros, dtype=np.int32)
    n = 128

    c0, i0 = bitmap_ops.dense_search_topn(
        bitmaps, jnp.asarray(rows), jnp.asarray(nrows), deleted, extra,
        False, False, n, descending)
    c1, i1 = bitmap_ops.dense_search_topn_packed(
        bitmaps, jnp.asarray(rows), jnp.asarray(nrows), deleted, extra,
        False, False, n, descending)
    assert (np.asarray(c0) == c1).all()
    assert (np.asarray(i0) == i1).all()
    assert c1[0] == len(spread) and c1[1] == len(near)


def test_packed_empty_and_full_rows():
    W = 2048
    bm, ones, zeros = _mk([[5], []], W)
    bitmaps = jnp.asarray(bm)
    deleted = jnp.zeros(W, dtype=jnp.uint32)
    extra = jnp.zeros((1, W), dtype=jnp.uint32)
    # q0: AND(row0, row1) = empty; q1: row0 alone = {5}
    rows = np.asarray([[0, 1], [0, ones]], dtype=np.int32)
    nrows = np.full((2, 1), zeros, dtype=np.int32)
    c, ids = bitmap_ops.dense_search_topn_packed(
        bitmaps, jnp.asarray(rows), jnp.asarray(nrows), deleted, extra,
        False, False, 16, True)
    assert c[0] == 0 and (ids[0] == -1).all()
    assert c[1] == 1 and ids[1][0] == 5 and (ids[1][1:] == -1).all()


def test_unpack_counts_exceeding_n():
    """count > n: the id prefix has exactly n valid entries."""
    W = 2048
    many = list(range(1, 1001))
    bm, ones, zeros = _mk([many], W)
    bitmaps = jnp.asarray(bm)
    deleted = jnp.zeros(W, dtype=jnp.uint32)
    extra = jnp.zeros((1, W), dtype=jnp.uint32)
    rows = np.asarray([[0, ones]], dtype=np.int32)
    nrows = np.full((1, 1), zeros, dtype=np.int32)
    n = 32
    c, ids = bitmap_ops.dense_search_topn_packed(
        bitmaps, jnp.asarray(rows), jnp.asarray(nrows), deleted, extra,
        False, False, n, False)
    assert c[0] == 1000
    assert (ids[0] == np.arange(1, n + 1)).all()
