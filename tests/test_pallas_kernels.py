"""Pallas kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mygramdb_tpu.ops import bitmap_ops as B


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(21)
    V, W = 24, 1024
    bm = rng.integers(0, 2 ** 32, size=(V, W), dtype=np.uint32)
    bm[V - 2] = 0xFFFFFFFF  # AND identity
    bm[V - 1] = 0           # OR identity
    deleted = np.zeros(W, dtype=np.uint32)
    deleted[100] = 0xFFFF
    rows = np.asarray([[0, 1, 2, 22, 22, 22, 22, 22],
                       [3, 4, 5, 6, 22, 22, 22, 22],
                       [7, 22, 22, 22, 22, 22, 22, 22]], dtype=np.int32)
    return jnp.asarray(bm), jnp.asarray(rows), jnp.asarray(deleted)


def test_dense_query_pallas_parity(data):
    bm, rows, deleted = data
    nrows = jnp.full((rows.shape[0], 1), 23, dtype=jnp.int32)
    ones = jnp.full((1, bm.shape[1]), 0xFFFFFFFF, dtype=jnp.uint32)
    c_p, r_p = B.dense_query_pallas(bm, rows, deleted, interpret=True)
    c_j, r_j = B.dense_query(bm, rows, nrows, deleted, ones,
                             has_not=False, has_extra=False)
    assert np.array_equal(np.asarray(r_p), np.asarray(r_j))
    assert np.array_equal(np.asarray(c_p), np.asarray(c_j))


def test_reduce_rows_pallas_parity(data):
    bm, rows, _ = data
    for op in ("and", "or"):
        p = B._reduce_rows_pallas(bm, rows, op=op, interpret=True)
        j = B._reduce_rows_jnp(bm, rows, op)
        assert np.array_equal(np.asarray(p), np.asarray(j)), op


def test_single_row_and_full_k(data):
    bm, _, deleted = data
    rows = jnp.asarray(np.asarray([[9] * 8], dtype=np.int32))
    c_p, r_p = B.dense_query_pallas(bm, rows, deleted, interpret=True)
    expect = np.asarray(bm[9]) & ~np.asarray(deleted)
    assert np.array_equal(np.asarray(r_p)[0], expect)
    assert int(c_p[0]) == int(
        np.unpackbits(expect.view(np.uint8)).sum())

def test_wide_chunk_words_divides_and_fits():
    # 10M docs: W = 313344 = 306*1024 is NOT a multiple of the 131072
    # VMEM cap — the regression that crashed the first 10M bench run.
    for W in (313344, 131072, 132096, 262144, 1024, 139264, 513 * 1024):
        chunk = B._wide_chunk_words(W)
        assert W % chunk == 0, (W, chunk)
        assert chunk % B.PBLOCK == 0
        assert chunk <= B._MAX_ROW_TILE_WORDS
    # prefers the largest fitting divisor
    assert B._wide_chunk_words(313344) == 104448
    assert B._wide_chunk_words(262144) == 131072


def test_dense_query_pallas_wide_branch_parity():
    """Force the wide (chunked) branch with a small cap and check parity
    against the jnp path at a width that does NOT divide the cap."""
    rng = np.random.default_rng(7)
    V, W = 12, 3 * 1024  # 3 chunks of 1024 under a tiny cap
    bm = jnp.asarray(rng.integers(0, 2 ** 32, size=(V, W), dtype=np.uint32))
    deleted = np.zeros(W, dtype=np.uint32)
    deleted[W - 1] = 0xF0F0F0F0
    deleted = jnp.asarray(deleted)
    rows = jnp.asarray(np.asarray([[0, 1, 2], [3, 4, 5]], dtype=np.int32))
    nrows = jnp.full((2, 1), V, dtype=jnp.int32)
    ones = jnp.full((1, W), 0xFFFFFFFF, dtype=jnp.uint32)
    orig_max, orig_kop = B._MAX_ROW_TILE_WORDS, B._KOP_MAX
    B._MAX_ROW_TILE_WORDS, B._KOP_MAX = 2048, 0
    try:
        B.dense_query_pallas.clear_cache()
        c_p, r_p = B.dense_query_pallas(bm, rows, deleted, interpret=True)
    finally:
        B._MAX_ROW_TILE_WORDS, B._KOP_MAX = orig_max, orig_kop
        B.dense_query_pallas.clear_cache()
    c_j, r_j = B.dense_query(bm, rows, nrows, deleted, ones,
                             has_not=False, has_extra=False)
    assert np.array_equal(np.asarray(r_p), np.asarray(r_j))
    assert np.array_equal(np.asarray(c_p), np.asarray(c_j))
