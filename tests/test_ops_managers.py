"""SnapshotScheduler, RateLimiter, and Application lifecycle tests."""

import asyncio
import json
import os
import time

import pytest

from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.rate_limiter import RateLimiter


class TestRateLimiter:
    def test_burst_then_throttle(self):
        rl = RateLimiter(capacity=5, refill_rate=1000.0, max_clients=10)
        assert all(rl.allow("1.2.3.4") for _ in range(5))
        # 6th within the same instant: bucket empty
        rl2 = RateLimiter(capacity=5, refill_rate=0.0001, max_clients=10)
        for _ in range(5):
            rl2.allow("a")
        assert not rl2.allow("a")

    def test_per_client_isolation(self):
        rl = RateLimiter(capacity=1, refill_rate=0.0001, max_clients=10)
        assert rl.allow("a")
        assert not rl.allow("a")
        assert rl.allow("b")

    def test_refill(self):
        rl = RateLimiter(capacity=2, refill_rate=200.0, max_clients=10)
        rl.allow("a")
        rl.allow("a")
        assert not rl.allow("a")
        time.sleep(0.02)
        assert rl.allow("a")

    def test_max_clients_lru(self):
        rl = RateLimiter(capacity=1, refill_rate=0.0001, max_clients=3)
        for ip in ("a", "b", "c", "d"):
            rl.allow(ip)
        assert rl.tracked_clients == 3

    def test_disabled(self):
        rl = RateLimiter(capacity=1, refill_rate=0.0001, enabled=False)
        assert all(rl.allow("x") for _ in range(100))

    def test_sweep_idle(self):
        rl = RateLimiter(capacity=1, refill_rate=1.0, max_clients=10)
        rl.allow("a")
        assert rl.sweep_idle(idle_seconds=0.0) == 1
        assert rl.tracked_clients == 0


class TestSnapshotScheduler:
    def test_auto_dump_and_retention(self, tmp_path):
        from mygramdb_tpu.catalog import TableCatalog
        from mygramdb_tpu.config import config_to_dict
        from mygramdb_tpu.server.dump_manager import DumpManager
        from mygramdb_tpu.server.snapshot_scheduler import SnapshotScheduler

        cfg = load_config_from_dict({
            "tables": [{"name": "t", "text_source": {"column": "c"}}],
            "dump": {"dir": str(tmp_path), "interval_sec": 1, "retain": 2},
        })
        cat = TableCatalog(cfg)
        cat.resolve("t").add_row("1", "hello", {})
        dm = DumpManager(cat, cfg, config_to_dict(cfg))
        sched = SnapshotScheduler(dm, cfg.dump)
        # trigger ticks manually (deterministic)
        for i in range(4):
            sched._tick()
            time.sleep(1.1)  # distinct timestamps in filenames
        autos = [f for f in os.listdir(tmp_path) if f.startswith("auto_")]
        assert len(autos) <= 2
        assert sched.last_result in ("saved", "skipped_busy")

    def test_skip_when_busy(self, tmp_path):
        from mygramdb_tpu.catalog import TableCatalog
        from mygramdb_tpu.config import config_to_dict
        from mygramdb_tpu.server.dump_manager import DumpManager
        from mygramdb_tpu.server.snapshot_scheduler import SnapshotScheduler

        cfg = load_config_from_dict({
            "tables": [{"name": "t", "text_source": {"column": "c"}}],
            "dump": {"dir": str(tmp_path), "interval_sec": 1},
        })
        cat = TableCatalog(cfg)
        dm = DumpManager(cat, cfg, config_to_dict(cfg))
        sched = SnapshotScheduler(dm, cfg.dump, busy=lambda: True)
        sched._tick()
        assert sched.last_result == "skipped_busy"


class TestApplicationLifecycle:
    def test_boot_serve_shutdown(self, tmp_path):
        seed = tmp_path / "seed.jsonl"
        with open(seed, "w") as f:
            for i, text in [(1, "hello world"), (2, "quick test")]:
                f.write(json.dumps({"id": i, "content": text,
                                    "status": 1}) + "\n")
        cfg = load_config_from_dict({
            "tables": [{"name": "t", "text_source": {"column": "content"},
                        "filters": [{"name": "status", "type": "int"}]}],
            "memory": {"verify_text": "all"},
            "api": {"tcp": {"bind": "127.0.0.1", "port": 0},
                    "http": {"enable": True, "bind": "127.0.0.1",
                             "port": 0}},
            "network": {"allow_cidrs": ["127.0.0.0/8"]},
            "dump": {"dir": str(tmp_path)},
            "replication": {"enable": False},
        })

        from mygramdb_tpu.app.application import Application
        app = Application(cfg, seed_path=str(seed))
        app.initialize()
        assert app.catalog.resolve("t").doc_count == 2

        async def drive():
            task = asyncio.ensure_future(app.run_async())
            for _ in range(100):
                await asyncio.sleep(0.05)
                if app.tcp is not None and app.tcp.port:
                    break
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", app.tcp.port)
            writer.write(b"SEARCH t hello\r\n")
            await writer.drain()
            resp = (await reader.readline()).decode().rstrip()
            writer.close()
            # HTTP plane up too
            import aiohttp
            async with aiohttp.ClientSession() as s:
                async with s.get(
                        f"http://127.0.0.1:{app.http.port}/health") as r:
                    health = await r.json()
            app.request_stop()
            await asyncio.wait_for(task, timeout=20)
            return resp, health

        resp, health = asyncio.run(drive())
        assert resp == "OK RESULTS 1 1"
        assert health["status"] == "ok"

    def test_restart_persistence_roundtrip(self, tmp_path):
        """Boot -> mutate -> DUMP SAVE -> shutdown -> boot with --restore:
        results identical across process generations (reference e2e
        persistence suite semantics)."""
        seed = tmp_path / "seed.jsonl"
        with open(seed, "w") as f:
            for i, text in [(1, "hello world"), (2, "quick test"),
                            (3, "日本語 検索")]:
                f.write(json.dumps({"id": i, "content": text,
                                    "status": i % 2}) + "\n")
        base = {
            "tables": [{"name": "t", "text_source": {"column": "content"},
                        "filters": [{"name": "status", "type": "int",
                                     "bitmap_index": True}]}],
            "memory": {"verify_text": "all"},
            "dump": {"dir": str(tmp_path)},
            "replication": {"enable": False},
        }
        from mygramdb_tpu.app.application import Application
        app1 = Application(load_config_from_dict(dict(base)),
                           seed_path=str(seed))
        app1.initialize()
        core1 = app1.core
        # live mutation after the seed, then checkpoint
        app1.catalog.resolve("t").add_row("9", "hello again", {"status": 1})
        assert core1.handle_line("DUMP SAVE persist.dmp").startswith("OK")
        core1.dump_manager.wait(30)
        q1 = core1.handle_line("SEARCH t hello SORT id ASC LIMIT 10")
        q2 = core1.handle_line("SEARCH t 日本語 LIMIT 10")
        q3 = core1.handle_line("COUNT t hello FILTER status = 1")

        app2 = Application(load_config_from_dict(dict(base)),
                           restore_dump="persist.dmp")
        app2.initialize()
        core2 = app2.core
        assert app2.catalog.resolve("t").doc_count == 4
        assert core2.handle_line(
            "SEARCH t hello SORT id ASC LIMIT 10") == q1
        assert core2.handle_line("SEARCH t 日本語 LIMIT 10") == q2
        assert core2.handle_line("COUNT t hello FILTER status = 1") == q3
        # restored store still accepts writes
        app2.catalog.resolve("t").add_row("11", "hello third", {"status": 0})
        assert core2.handle_line("COUNT t hello") == "OK COUNT 3"

    def test_config_test_mode(self, tmp_path):
        cfg_file = tmp_path / "c.yaml"
        cfg_file.write_text(
            "tables:\n  - name: t\n    text_source:\n      column: c\n")
        from mygramdb_tpu.app.main import main
        assert main(["--config", str(cfg_file), "--config-test"]) == 0
        bad = tmp_path / "bad.yaml"
        bad.write_text("tables: []\n")
        assert main(["--config", str(bad), "--config-test"]) == 1


class TestStartupChecks:
    """Root refusal + dump-directory verification at startup (reference
    application.cpp CheckRootPrivilege / VerifyDumpDirectory +
    integration/scripts/root_prevention.sh)."""

    def test_root_refused_without_optout(self, monkeypatch):
        import os
        from mygramdb_tpu.app.main import check_root_privilege
        monkeypatch.delenv("MYGRAM_ALLOW_ROOT", raising=False)
        monkeypatch.setattr(os, "getuid", lambda: 0)
        monkeypatch.setattr(os, "geteuid", lambda: 0)
        assert check_root_privilege() is False
        assert check_root_privilege(allow_root=True) is True
        monkeypatch.setenv("MYGRAM_ALLOW_ROOT", "1")
        assert check_root_privilege() is True

    def test_nonroot_allowed(self, monkeypatch):
        import os
        from mygramdb_tpu.app.main import check_root_privilege
        monkeypatch.delenv("MYGRAM_ALLOW_ROOT", raising=False)
        monkeypatch.setattr(os, "getuid", lambda: 1000)
        monkeypatch.setattr(os, "geteuid", lambda: 1000)
        assert check_root_privilege() is True

    def test_dump_dir_dotdot_rejected(self, tmp_path):
        import pytest
        from mygramdb_tpu.app.application import Application
        from mygramdb_tpu.config import load_config_from_dict
        from mygramdb_tpu.utils.errors import ConfigError
        cfg = load_config_from_dict({
            "tables": [{"name": "t",
                        "text_source": {"column": "content"}}],
            "dump": {"dir": str(tmp_path) + "/sub/../escape"},
        })
        with pytest.raises(ConfigError, match="'\\.\\.' component"):
            Application(cfg).initialize()

    def test_dump_dir_created_at_startup(self, tmp_path):
        from mygramdb_tpu.app.application import Application
        from mygramdb_tpu.config import load_config_from_dict
        target = tmp_path / "made" / "at" / "boot"
        cfg = load_config_from_dict({
            "tables": [{"name": "t",
                        "text_source": {"column": "content"}}],
            "dump": {"dir": str(target)},
        })
        Application(cfg).initialize()
        assert target.is_dir()

    def test_dump_dir_unwritable_rejected(self, tmp_path):
        import os
        import pytest
        if os.geteuid() == 0:
            pytest.skip("write perms are not enforced for root")
        from mygramdb_tpu.app.application import Application
        from mygramdb_tpu.config import load_config_from_dict
        from mygramdb_tpu.utils.errors import ConfigError
        ro = tmp_path / "ro"
        ro.mkdir()
        ro.chmod(0o500)
        cfg = load_config_from_dict({
            "tables": [{"name": "t",
                        "text_source": {"column": "content"}}],
            "dump": {"dir": str(ro)},
        })
        with pytest.raises(ConfigError, match="not writable"):
            Application(cfg).initialize()
