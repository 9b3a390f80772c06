"""u16 delta-packed postings transport (ops/wire.py) parity.

The decoded device array must equal the raw int32 postings + sentinel
tail byte-for-byte across: empty rows, single-element rows, interior
deltas >= 2^16 (exceptions), multi-segment splits at row boundaries,
and cumsum wraparound (int32 mod-2^32 arithmetic — per-segment sums of
row spans exceed 2^31 long before doc ids do).
"""

import numpy as np
import pytest

import jax

from mygramdb_tpu.ops import wire
from mygramdb_tpu.ops.posting_ops import SENTINEL, SLICE_GATHER_PAD


def _random_csr(rng, n_rows, n_docs, max_len, p_empty=0.2,
                big_gaps=False):
    lengths = np.zeros(n_rows, dtype=np.int32)
    rows = []
    for r in range(n_rows):
        if rng.random() < p_empty:
            rows.append(np.empty(0, dtype=np.int32))
            continue
        ln = int(rng.integers(1, max_len + 1))
        if big_gaps:
            ids = np.unique(rng.integers(1, n_docs, size=ln))
        else:
            start = int(rng.integers(1, max(2, n_docs - 4 * ln)))
            ids = start + np.unique(rng.integers(0, 4 * ln, size=ln))
        rows.append(ids.astype(np.int32))
        lengths[r] = ids.size
    postings = (np.concatenate(rows) if rows else
                np.empty(0, dtype=np.int32)).astype(np.int32)
    offsets = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    return postings, offsets, lengths


def _roundtrip(postings, offsets, lengths, tail=True):
    dev = jax.devices()[0]
    t = (np.full(SLICE_GATHER_PAD, int(SENTINEL), dtype=np.int32)
         if tail else None)
    detail = {}
    out = wire.delta_put_postings(postings, offsets, lengths, dev,
                                  tail=t, detail=detail)
    got = np.asarray(out)
    want = postings if t is None else np.concatenate([postings, t])
    np.testing.assert_array_equal(got, want)
    return detail


@pytest.fixture(autouse=True)
def _force_wire(monkeypatch):
    # the 32 MB floor would route every test through the raw path
    monkeypatch.setattr(wire, "_MIN_WIRE_BYTES", 0)
    monkeypatch.setattr(wire, "_MIN_E", 1 << 8)


def test_small_csr_roundtrip():
    rng = np.random.default_rng(7)
    p, o, ln = _random_csr(rng, 200, 50_000, 64)
    _roundtrip(p, o, ln)


def test_big_gap_exceptions():
    # deltas far beyond 2^16: df=2 rows spanning a 20M-doc space
    rng = np.random.default_rng(11)
    p, o, ln = _random_csr(rng, 300, 20_000_000, 8, big_gaps=True)
    assert np.any(np.diff(p) >= (1 << 16))  # the path under test
    _roundtrip(p, o, ln)


def test_multi_segment_split(monkeypatch):
    monkeypatch.setattr(wire, "_MAX_SEG_E", 1 << 10)
    rng = np.random.default_rng(13)
    p, o, ln = _random_csr(rng, 400, 1_000_000, 48, big_gaps=True)
    assert p.size > (1 << 10) * 2  # really multi-segment
    _roundtrip(p, o, ln)


def test_wraparound_sums():
    # many rows each spanning most of a 1M-doc space: per-segment
    # cumsum of in-row deltas exceeds 2^31 and must wrap correctly
    n = 3000
    rows = [np.array([1, 999_983], dtype=np.int32) for _ in range(n)]
    p = np.concatenate(rows).astype(np.int32)
    ln = np.full(n, 2, dtype=np.int32)
    o = np.zeros(n, dtype=np.int64)
    np.cumsum(ln[:-1], out=o[1:])
    assert np.sum(np.float64(999_982) * n) > 2 ** 31
    _roundtrip(p, o, ln)


def test_single_row_and_no_tail():
    p = np.arange(1, 513, dtype=np.int32)
    o = np.zeros(1, dtype=np.int64)
    ln = np.array([512], dtype=np.int32)
    _roundtrip(p, o, ln, tail=False)


def test_row_longer_than_segment_falls_back(monkeypatch):
    monkeypatch.setattr(wire, "_MAX_SEG_E", 256)
    p = np.arange(1, 1025, dtype=np.int32)  # one 1024-long row
    o = np.zeros(1, dtype=np.int64)
    ln = np.array([1024], dtype=np.int32)
    _roundtrip(p, o, ln)


def test_disable_env(monkeypatch):
    monkeypatch.setenv("MYGRAM_DISABLE_U16_WIRE", "1")
    rng = np.random.default_rng(3)
    p, o, ln = _random_csr(rng, 100, 10_000, 32)
    detail = _roundtrip(p, o, ln)
    assert "postings_wire_mb" not in detail


def test_wire_bytes_roughly_halved():
    rng = np.random.default_rng(5)
    p, o, ln = _random_csr(rng, 500, 100_000, 256, p_empty=0.0)
    detail = _roundtrip(p, o, ln)
    # u16 low + small tables; padding can inflate tiny inputs, so just
    # require better than the raw int32 bytes at this size
    assert detail["postings_wire_mb"] * 2 ** 20 < p.nbytes * 0.9 + 2 ** 16


def test_empty_postings_forced_wire():
    # _MIN_WIRE_BYTES is 0 under the fixture, so an empty array reaches
    # delta_put_postings directly; the explicit size guard must route it
    # to the raw path instead of an empty segment loop.
    p = np.empty(0, dtype=np.int32)
    o = np.empty(0, dtype=np.int64)
    ln = np.empty(0, dtype=np.int32)
    _roundtrip(p, o, ln, tail=False)
    _roundtrip(p, o, ln, tail=True)


def test_unsorted_row_degrades_to_raw():
    # A violated sorted-per-term precondition (negative in-row delta)
    # must fall back to the raw transport, not silently truncate the
    # delta to 16 bits.
    p = np.array([10, 5, 7, 20, 21], dtype=np.int32)  # row 0 unsorted
    o = np.array([0, 3], dtype=np.int64)
    ln = np.array([3, 2], dtype=np.int32)
    detail = _roundtrip(p, o, ln)
    assert "postings_wire_mb" not in detail  # raw path taken


def test_pad_bucket_roundtrip():
    # E lands just above a pow2 bucket: device-side zero pad approaches
    # 100% of E — parity must hold and wire bytes must not include it.
    rng = np.random.default_rng(11)
    p, o, ln = _random_csr(rng, 40, 50_000, 12, p_empty=0.0)
    # force E just over the minimum bucket
    while p.size <= (1 << 8):
        p2, o2, ln2 = _random_csr(rng, 40, 50_000, 12, p_empty=0.0)
        p = np.concatenate([p, p2])
        o = np.concatenate([o, o2 + ln.sum()])
        ln = np.concatenate([ln, ln2])
    detail = _roundtrip(p, o, ln)
    assert detail["postings_wire_mb"] * 2 ** 20 < p.nbytes
