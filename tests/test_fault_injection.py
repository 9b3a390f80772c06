"""Fault injection on the device/compaction and dump-save paths.

The reference proves one-shot failure semantics on Roaring posting ops
(posting_list.h:205-219: a failed optimize batch must leave the index
serving and a retry must complete) and dump writes are tmp+rename atomic
(dump.cpp). Our analogs:

- optimize(): the device build/upload can fail (HBM OOM, tunnel drop).
  The except-path merges the frozen delta back into the live one so no
  document is lost, the index keeps serving, and a retry converges
  (delta.py optimize() BaseException handler).
- save_dump(): any OSError mid-write must leave a previously-saved dump
  file byte-identical and loadable, and leave no temp litter behind.
"""

import os

import numpy as np
import pytest

from mygramdb_tpu.index.delta import MutableIndex
from mygramdb_tpu.storage import dump as dump_mod
from mygramdb_tpu.storage.dump import DumpError, TableState, load_dump, save_dump

from test_optimize_concurrency import N_DOCS, synth_index


class _Boom(RuntimeError):
    pass


def _search_set(idx, grams, lo=0):
    total, ids = idx.search_and(grams, limit=0)
    return {int(x) for x in ids if int(x) >= lo}


class TestOptimizeFaultInjection:
    def test_device_build_failure_loses_nothing(self, monkeypatch):
        idx = synth_index(seed=21)
        base = N_DOCS + 1
        for d in range(base, base + 300):
            idx.add_document(d, "abc")        # grams ab, bc
        idx.remove_document(base)             # tombstone a delta doc
        idx.remove_document(7)                # tombstone a baked doc
        before = _search_set(idx, ["ab", "bc"])
        assert base not in before and base + 1 in before

        real = MutableIndex._build_device

        def boom(self, built):
            raise _Boom("injected device build failure")

        monkeypatch.setattr(MutableIndex, "_build_device", boom)
        with pytest.raises(_Boom):
            idx.optimize()
        # failed compaction: nothing lost, nothing resurrected
        assert idx.frozen_delta is None
        assert _search_set(idx, ["ab", "bc"]) == before
        assert 7 not in _search_set(idx, ["ab"])

        # retry with the fault cleared converges to the same answer
        monkeypatch.setattr(MutableIndex, "_build_device", real)
        idx.optimize()
        assert _search_set(idx, ["ab", "bc"]) == before
        assert len(idx.delta) == 0

    def test_repeated_failures_then_success(self, monkeypatch):
        idx = synth_index(seed=22)
        base = N_DOCS + 1
        for d in range(base, base + 100):
            idx.add_document(d, "qrs")        # grams qr, rs
        before = _search_set(idx, ["qr", "rs"], lo=base)
        real = MutableIndex._build_device
        calls = {"n": 0}

        def flaky(self, built):
            calls["n"] += 1
            if calls["n"] <= 2:
                raise _Boom(f"injected failure #{calls['n']}")
            return real(self, built)

        monkeypatch.setattr(MutableIndex, "_build_device", flaky)
        for _ in range(2):
            with pytest.raises(_Boom):
                idx.optimize()
            assert _search_set(idx, ["qr", "rs"], lo=base) == before
        idx.optimize()  # third attempt succeeds
        assert _search_set(idx, ["qr", "rs"], lo=base) == before
        assert len(idx.delta) == 0 and idx.frozen_delta is None

    def test_mutations_racing_failed_optimize_win(self, monkeypatch):
        """Writes that land while the doomed build runs must survive the
        failure rollback; deletes since the snapshot must stay deleted
        (the 'newer writes win' clause of the except-path merge)."""
        idx = synth_index(seed=23)
        base = N_DOCS + 1
        for d in range(base, base + 50):
            idx.add_document(d, "mno")        # grams mn, no

        racing_add = base + 1000
        racing_del = base + 3

        def boom(self, built, *a):
            # simulate concurrent mutations mid-build, then die
            idx.add_document(racing_add, "mno")
            idx.remove_document(racing_del)
            raise _Boom("injected mid-build failure")

        monkeypatch.setattr(MutableIndex, "_optimize_build_and_swap", boom)
        with pytest.raises(_Boom):
            idx.optimize()

        got = _search_set(idx, ["mn", "no"], lo=base)
        assert racing_add in got, "racing add lost by rollback"
        assert racing_del not in got, "racing delete resurrected"
        assert base + 4 in got, "frozen-delta doc lost"

    def test_update_during_failed_optimize_not_stale(self, monkeypatch):
        """A doc UPDATEd while the doomed build runs must keep its new
        terms after rollback (frozen version must not clobber it)."""
        idx = synth_index(seed=24)
        victim = N_DOCS + 9
        idx.add_document(victim, "abc")       # ab, bc

        def boom(self, built, *a):
            idx.update_document(victim, "xyz")   # xy, yz
            raise _Boom("injected")

        monkeypatch.setattr(MutableIndex, "_optimize_build_and_swap", boom)
        with pytest.raises(_Boom):
            idx.optimize()
        assert victim in _search_set(idx, ["xy", "yz"])
        assert victim not in _search_set(idx, ["ab", "bc"])


def _tiny_state(name="t"):
    return TableState(
        name=name,
        terms=["ab", "bc"],
        offsets=np.asarray([0, 2], dtype=np.int64),
        lengths=np.asarray([2, 1], dtype=np.int32),
        postings=np.asarray([1, 2, 2], dtype=np.int32),
        max_doc_id=2, n_docs=2,
        doc_store_state={"pks": ["1", "2"]},
        filter_state={}, bm25_state={})


class TestDumpSaveFaultInjection:
    def test_failed_save_preserves_previous_dump(self, tmp_path,
                                                 monkeypatch):
        path = str(tmp_path / "x.dump")
        cfg = {"tables": [{"name": "t"}]}
        save_dump(path, cfg, [_tiny_state()], gtid="g:1")
        golden = open(path, "rb").read()

        real = dump_mod._write_section
        calls = {"n": 0}

        def flaky(f, sec, payload):
            calls["n"] += 1
            if calls["n"] == 2:
                raise OSError(28, "No space left on device")
            return real(f, sec, payload)

        monkeypatch.setattr(dump_mod, "_write_section", flaky)
        with pytest.raises(DumpError):
            save_dump(path, cfg, [_tiny_state()], gtid="g:2")
        monkeypatch.setattr(dump_mod, "_write_section", real)

        # previous dump byte-identical + loadable; no tmp litter
        assert open(path, "rb").read() == golden
        info, tables = load_dump(path)
        assert info.gtid == "g:1" and tables[0].name == "t"
        litter = [p for p in os.listdir(tmp_path)
                  if p.startswith(".mgtp_tmp_")]
        assert litter == []

    @pytest.mark.parametrize("fail_call", [1, 3])
    def test_failure_at_every_stage_is_atomic(self, tmp_path, monkeypatch,
                                              fail_call):
        path = str(tmp_path / "y.dump")
        cfg = {"tables": [{"name": "t"}]}
        real = dump_mod._write_section
        calls = {"n": 0}

        def flaky(f, sec, payload):
            calls["n"] += 1
            if calls["n"] == fail_call:
                raise OSError(5, "I/O error")
            return real(f, sec, payload)

        monkeypatch.setattr(dump_mod, "_write_section", flaky)
        with pytest.raises(DumpError):
            save_dump(path, cfg, [_tiny_state()], gtid="g:1")
        # no partial dump ever becomes visible at the target path
        assert not os.path.exists(path)
        assert [p for p in os.listdir(tmp_path)
                if p.startswith(".mgtp_tmp_")] == []
