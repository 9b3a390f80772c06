"""Checkpoint format robustness (reference dump integrity semantics)."""

import os

import numpy as np
import pytest

from mygramdb_tpu.storage import dump as df
from mygramdb_tpu.utils.errors import DumpError


def make_state():
    return df.TableState(
        name="t", terms=["ab", "bc"],
        offsets=np.asarray([0, 2], dtype=np.int64),
        lengths=np.asarray([2, 1], dtype=np.int32),
        postings=np.asarray([1, 2, 2], dtype=np.int32),
        max_doc_id=2, n_docs=2,
        doc_store_state={"doc_to_pk": {1: "1", 2: "2"}, "filters": {},
                         "texts": {}, "next_doc_id": 3, "store_texts": True,
                         "pk_order_valid": True},
        filter_state={"columns": {}},
        bm25_state={"doc_lengths": {1: 5, 2: 7}})


def test_roundtrip(tmp_path):
    path = str(tmp_path / "x.dmp")
    df.save_dump(path, {"a": 1}, [make_state()], gtid="uuid:1-5")
    info, tables = df.load_dump(path)
    assert info.gtid == "uuid:1-5"
    assert len(tables) == 1
    ts = tables[0]
    assert ts.terms == ["ab", "bc"]
    assert ts.postings.tolist() == [1, 2, 2]
    assert df.verify_dump(path).tables[0]["docs"] == 2


def test_corruption_detected(tmp_path):
    path = str(tmp_path / "x.dmp")
    df.save_dump(path, {}, [make_state()])
    data = bytearray(open(path, "rb").read())
    # flip a byte in the middle (inside a section payload)
    data[len(data) // 2] ^= 0xFF
    open(path, "wb").write(bytes(data))
    with pytest.raises(DumpError, match="CRC"):
        df.verify_dump(path)


def test_truncation_detected(tmp_path):
    path = str(tmp_path / "x.dmp")
    df.save_dump(path, {}, [make_state()])
    data = open(path, "rb").read()
    open(path, "wb").write(data[:len(data) - 10])
    with pytest.raises(DumpError):
        df.verify_dump(path)


def test_bad_magic(tmp_path):
    path = str(tmp_path / "x.dmp")
    open(path, "wb").write(b"NOPE" + b"\x00" * 100)
    with pytest.raises(DumpError, match="magic"):
        df.verify_dump(path)


def test_atomic_write_no_partial(tmp_path):
    # failed write must not leave a target file behind
    path = str(tmp_path / "sub" / "x.dmp")
    df.save_dump(path, {}, [make_state()])
    assert os.path.exists(path)
    leftovers = [f for f in os.listdir(os.path.dirname(path))
                 if f.startswith(".mgtp_tmp_")]
    assert not leftovers
