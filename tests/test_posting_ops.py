"""membership_sorted parity vs np.isin across its three internal paths.

The blocked probe (posting_ops.membership_sorted) replaces
jnp.searchsorted (a data-dependent gather loop on TPU) for sorted-array
membership. Paths under test:
- searchsorted fallback: C2 <= _MEMBER_BLK or C2 % _MEMBER_BLK != 0
- blocked unchunked:     C2 blocked, C <= _MEMBER_CHUNK
- blocked chunked:       C > _MEMBER_CHUNK, incl. non-multiple C
  (ceil-div padded tail — a user-set candidate bucket like 3072 must
  not fall back to the unchunked (C, BLK) gather, the 10M OOM shape;
  advisor finding r3).
Reference semantics: Index::FilterByNgrams membership probe
(/root/reference/src/index/index.cpp:355-376).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mygramdb_tpu.ops import posting_ops
from mygramdb_tpu.ops.posting_ops import SENTINEL, membership_sorted


def _rows(rng, k, c2, hi):
    """k sorted rows padded with SENTINEL at random fill levels."""
    rows = np.full((k, c2), int(SENTINEL), dtype=np.int32)
    fills = rng.integers(0, c2 + 1, size=k)
    for i, f in enumerate(fills):
        vals = np.unique(rng.integers(0, hi, size=max(int(f), 1)))
        rows[i, :vals.size] = vals.astype(np.int32)
    return rows, fills


@pytest.mark.parametrize("c2", [64, 128, 384, 4096, 4160])
@pytest.mark.parametrize("C", [128, 2048, 3072, 4096, 8192])
def test_membership_sorted_matches_isin(c2, C):
    rng = np.random.default_rng(c2 * 31 + C)
    rows, fills = _rows(rng, 4, c2, hi=200_000)
    # mix of present and absent candidates, sorted ascending like a CSR
    # driver slice; include SENTINEL padding at the tail like real
    # candidate vectors
    present = rows[0, :max(int(fills[0]), 1)]
    cands = np.unique(np.concatenate([
        rng.choice(present, size=min(C // 2, present.size), replace=False),
        rng.integers(0, 200_000, size=C)]))[:C].astype(np.int32)
    cands = np.sort(cands)
    pad = C - cands.size
    if pad:
        cands = np.concatenate(
            [cands, np.full(pad, int(SENTINEL), dtype=np.int32)])
    got = np.asarray(membership_sorted(jnp.asarray(rows),
                                       jnp.asarray(cands)))
    real = cands != int(SENTINEL)  # SENTINEL pads are unspecified: every
    # caller ANDs the result with (cands != SENTINEL) downstream
    for i in range(rows.shape[0]):
        valid = rows[i][rows[i] != int(SENTINEL)]
        want = np.isin(cands, valid)
        np.testing.assert_array_equal(got[i][real], want[real],
                                      err_msg=f"row {i} c2={c2} C={C}")


def test_membership_chunked_path_taken_for_non_multiple_C(monkeypatch):
    """A candidate width that is NOT a multiple of _MEMBER_CHUNK must
    still produce correct output through the padded chunk scan."""
    assert posting_ops._MEMBER_CHUNK == 2048  # test targets 3072 > chunk
    rng = np.random.default_rng(7)
    rows, _ = _rows(rng, 2, 1024, hi=50_000)
    C = 3072
    cands = np.sort(rng.integers(0, 50_000, size=C).astype(np.int32))
    got = np.asarray(membership_sorted(jnp.asarray(rows),
                                       jnp.asarray(cands)))
    for i in range(2):
        valid = rows[i][rows[i] != int(SENTINEL)]
        np.testing.assert_array_equal(got[i], np.isin(cands, valid))
