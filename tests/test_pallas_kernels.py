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
