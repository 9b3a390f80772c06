"""Adversarial robustness: dump fuzzing, kernel boundary shapes,
mid-transaction binlog reconnect (reference test tiers 2-3:
fault-injection hooks, optimize_concurrency_test, binlog replay).
"""

import threading
import time

import numpy as np
import pytest

from mygramdb_tpu.storage import dump as df
from mygramdb_tpu.utils.errors import DumpError

from binlog_builder import EventBuilder
from test_replication import COLS, METAS, NAMES, SID, make_env


# ---------------------------------------------------------------------------
# Dump fuzzing: a bit flip ANYWHERE in the file must either raise DumpError
# or leave the loaded state byte-identical to the original (undetected
# corruption that silently changes data is the failure mode).
# ---------------------------------------------------------------------------

def _make_state():
    rng = np.random.default_rng(5)
    postings = np.sort(rng.choice(np.arange(1, 500), size=64,
                                  replace=False)).astype(np.int32)
    return df.TableState(
        name="t", terms=["ab", "bc", "cd"],
        offsets=np.asarray([0, 20, 50], dtype=np.int64),
        lengths=np.asarray([20, 30, 14], dtype=np.int32),
        postings=postings, max_doc_id=int(postings.max()), n_docs=40,
        doc_store_state={"doc_to_pk": {int(d): str(d) for d in postings},
                         "filters": {int(postings[0]): {"s": 1}},
                         "texts": {int(postings[0]): "hello world"},
                         "next_doc_id": 1000, "store_texts": True,
                         "pk_order_valid": True},
        filter_state={"columns": {}},
        bm25_state={"doc_lengths": {int(d): 11 for d in postings}})


def _snapshot(tables):
    out = []
    for t in tables:
        out.append((t.name, list(t.terms), t.offsets.tobytes(),
                    t.lengths.tobytes(), t.postings.tobytes(),
                    t.max_doc_id, t.n_docs,
                    sorted(t.doc_store_state["doc_to_pk"].items())))
    return out


class TestDumpFuzzing:
    def test_single_bit_flips_every_region(self, tmp_path):
        path = str(tmp_path / "f.dmp")
        df.save_dump(path, {"k": "v"}, [_make_state()], gtid="uuid:1-9")
        blob = bytearray(open(path, "rb").read())
        _, orig_tables = df.load_dump(path)
        orig = _snapshot(orig_tables)

        undetected_changes = []
        crashes = []
        # flip one bit at every 7th byte (full coverage of every section
        # at ~9% sampling density, deterministic)
        for off in range(0, len(blob), 11):
            mutated = bytearray(blob)
            mutated[off] ^= 0x10
            fuzz_path = str(tmp_path / "fz.dmp")
            with open(fuzz_path, "wb") as fh:
                fh.write(mutated)
            try:
                _, tables = df.load_dump(fuzz_path)
            except DumpError:
                continue  # detected: good
            except Exception as e:  # noqa: BLE001
                crashes.append((off, repr(e)))
                continue
            if _snapshot(tables) != orig:
                undetected_changes.append(off)
        assert not crashes, f"non-DumpError crashes at {crashes[:5]}"
        assert not undetected_changes, (
            f"silent corruption at offsets {undetected_changes[:10]}")

    def test_double_flip_and_section_swap(self, tmp_path):
        path = str(tmp_path / "f.dmp")
        df.save_dump(path, {"k": "v"}, [_make_state()], gtid="uuid:1-9")
        blob = bytearray(open(path, "rb").read())
        rng = np.random.default_rng(11)
        for trial in range(60):
            mutated = bytearray(blob)
            for _ in range(2):
                off = int(rng.integers(0, len(blob)))
                mutated[off] ^= int(rng.integers(1, 256))
            fz = str(tmp_path / "fz2.dmp")
            with open(fz, "wb") as fh:
                fh.write(mutated)
            try:
                _, tables = df.load_dump(fz)
                assert _snapshot(tables) == _snapshot(
                    df.load_dump(path)[1]), f"silent corruption trial {trial}"
            except DumpError:
                pass

    def test_verify_matches_load_verdict(self, tmp_path):
        path = str(tmp_path / "f.dmp")
        df.save_dump(path, {}, [_make_state()], gtid="g:1")
        blob = bytearray(open(path, "rb").read())
        blob[len(blob) // 2] ^= 0xFF
        fz = str(tmp_path / "fzv.dmp")
        with open(fz, "wb") as fh:
            fh.write(bytes(blob))
        with pytest.raises(DumpError):
            df.verify_dump(fz)
        with pytest.raises(DumpError):
            df.load_dump(fz)


# ---------------------------------------------------------------------------
# Kernel boundary shapes: fused search+topn vs numpy brute force at word/
# bucket/capacity edges.
# ---------------------------------------------------------------------------

class TestKernelBoundaries:
    @pytest.mark.parametrize("W", [1024, 1025, 4096])
    @pytest.mark.parametrize("descending", [True, False])
    def test_topn_edges_vs_numpy(self, W, descending):
        import jax
        import jax.numpy as jnp
        from mygramdb_tpu.ops import bitmap_ops

        rng = np.random.default_rng(W)
        cases = []
        # adversarial bit patterns
        z = np.zeros(W, dtype=np.uint32)
        cases.append(z)                                   # empty
        one_lo = z.copy(); one_lo[0] = 1                  # doc 0 only
        cases.append(one_lo)
        one_hi = z.copy(); one_hi[-1] = 1 << 31           # last doc only
        cases.append(one_hi)
        edges = z.copy(); edges[0] = 0x80000001; edges[-1] = 0x80000001
        cases.append(edges)                               # word-boundary bits
        cases.append(np.full(W, 0xFFFFFFFF, dtype=np.uint32))  # all docs
        sparse = z.copy()
        sparse[rng.integers(0, W, size=40)] = 1 << 17
        cases.append(sparse)
        cases.append(rng.integers(0, 2**32, size=W, dtype=np.uint32))

        words = jnp.asarray(np.stack(cases))
        for n in (1, 129, 1024):
            ids = np.asarray(bitmap_ops.topn_from_bitmap(
                words, n, descending))
            for i, row in enumerate(cases):
                bits = np.unpackbits(row.view(np.uint8), bitorder="little")
                exp = np.flatnonzero(bits)
                exp = exp[::-1][:n] if descending else exp[:n]
                got = ids[i][ids[i] >= 0]
                assert np.array_equal(got, exp), (W, descending, n, i)

    def test_k_bucket_edges(self):
        """AND with K at and beyond every probe bucket edge."""
        from mygramdb_tpu.index import IndexBuilder, DeviceIndex, \
            SearchOptions
        b = IndexBuilder()
        # 40 docs, each containing terms t0..t39 cumulatively:
        # doc d contains grams g_i for i <= d
        for d in range(1, 41):
            text = " ".join(f"x{i:02d}" for i in range(d))
            b.add_document(d, text)
        built = b.finalize()
        idx = DeviceIndex(built, dense_df_ratio=0.0000001)
        g = built.term_dict.get
        for K in (1, 7, 8, 9, 31, 32, 33):
            # grams of the K highest terms -> docs K..40 (x{K-1} appears
            # from doc K onward); use full gram ids of x-tokens
            tids = [g(f"x{i:02d}"[:2]) for i in range(K)]
            tids = [t for t in tids if t is not None]
            total, ids = idx.search_and(
                sorted(set(tids)), opts=SearchOptions(limit=100))
            assert total > 0

    def test_limit_bucket_edges_and_overfetch(self):
        from mygramdb_tpu.index import IndexBuilder, DeviceIndex, \
            SearchOptions
        b = IndexBuilder()
        for d in range(1, 2001):
            b.add_document(d, "zz common")
        built = b.finalize()
        idx = DeviceIndex(built, dense_df_ratio=0.0000001)
        t = built.term_dict.get("zz")
        for limit in (1, 127, 128, 129, 1023, 1024, 1025, 3000):
            total, ids = idx.search_and([t],
                                        opts=SearchOptions(limit=limit))
            assert total == 2000
            expect = np.arange(2000, 2000 - min(limit, 2000), -1)
            assert np.array_equal(ids, expect), limit


# ---------------------------------------------------------------------------
# Binlog mid-transaction reconnect: a connection dropping between a GTID's
# row events and its COMMIT must replay the whole transaction on reconnect
# with no duplicates and no premature GTID advance (reference
# pending_commit_gtid semantics, binlog_reader.h:429-432).
# ---------------------------------------------------------------------------

class DroppingConnection:
    """Serves scripted events then raises (mid-stream disconnect)."""

    def __init__(self, events, drop_after: int, uuid="server-uuid-1"):
        self.events = list(events)
        self.drop_after = drop_after
        self.uuid = uuid
        self.database = "db"
        self.served = 0
        self.closed = threading.Event()

    def connect(self):
        pass

    @property
    def is_mariadb(self):
        return False

    def fetch_server_uuid(self):
        return self.uuid

    def validate_replication_prereqs(self):
        return []

    def fetch_executed_gtid(self):
        return ""

    def fetch_table_columns(self, database, table):
        return [{"name": n, "data_type": "", "column_type": "", "key": ""}
                for n in NAMES]

    def start_binlog_dump_gtid(self, server_id, gtid_set):
        self.requested_gtid = gtid_set

    def start_binlog_dump_mariadb(self, server_id, pos):
        pass

    def read_binlog_event(self):
        if self.drop_after is not None and self.served >= self.drop_after:
            raise ConnectionResetError("mid-transaction disconnect")
        if self.events:
            self.served += 1
            return self.events.pop(0)
        self.closed.wait(timeout=5)
        return None

    def close(self):
        self.closed.set()


class TestMidTransactionReconnect:
    def test_replay_no_duplicates_no_premature_gtid(self):
        from mygramdb_tpu.replication.reader import BinlogReader
        cfg, cat, proc = make_env()
        ctx = cat.resolve("articles")
        b = EventBuilder()
        txn = [b.gtid(SID, 1),
               b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES),
               b.rows(9, "insert", COLS, METAS,
                      [[1, "replay once", 1, 1]]),
               b.xid()]
        first = [b.fde()] + txn
        # connection 1 drops after serving gtid+table_map+rows (before XID)
        conn1 = DroppingConnection(first, drop_after=4)
        # connection 2 replays the SAME transaction from the start (the
        # server resends everything after the last COMMITTED gtid) plus a
        # second transaction
        second = [b.fde()] + [bytes(e) for e in txn] + [
            b.gtid(SID, 2),
            b.table_map(9, "db", "articles", COLS, METAS, col_names=NAMES),
            b.rows(9, "insert", COLS, METAS, [[2, "second txn", 1, 1]]),
            b.xid()]
        conn2 = DroppingConnection(second, drop_after=None)
        conns = [conn1, conn2]

        def factory():
            return conns.pop(0) if conns else DroppingConnection(
                [b.fde()], drop_after=None)

        reader = BinlogReader(cfg.mysql, cfg.replication, proc,
                              connection_factory=factory)
        # fast reconnect for the test
        reader.repl_cfg.reconnect_backoff_min_ms = 10
        reader.start()
        deadline = time.time() + 15
        while time.time() < deadline and ctx.doc_count < 2:
            time.sleep(0.05)
        reader.stop()
        assert ctx.doc_count == 2, ctx.doc_count
        # exactly one copy of each row (no duplicate apply of the replay)
        assert ctx.doc_store.doc_id("1") is not None
        assert ctx.doc_store.doc_id("2") is not None
        total, _ = ctx.index.search_and(["re"], limit=0)  # 'replay once'
        assert total == 1
        # GTID advanced only through commits: both txns committed
        assert reader.gtid_position().endswith(":1-2") or \
            reader.gtid_position().endswith(":2")
        assert reader.stats.reconnects >= 1
