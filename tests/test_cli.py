"""CLI tests (reference tests/cli/mygram_cli_test.cpp analog): one-shot
-e execution with exit-code mapping, REPL loop over a live server."""

import asyncio
import io
import threading

import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.core import ServerCore
from mygramdb_tpu.server.tcp_server import TcpServer

CFG = {
    "tables": [{"name": "t", "text_source": {"column": "content"}}],
    "memory": {"verify_text": "all"},
    "api": {"tcp": {"bind": "127.0.0.1", "port": 0}},
    "network": {"allow_cidrs": ["127.0.0.0/8"]},
}


@pytest.fixture()
def live_port():
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("t")
    ctx.add_row("1", "hello world", {})
    ctx.add_row("2", "goodbye world", {})
    core = ServerCore(cfg, cat)
    loop = asyncio.new_event_loop()
    srv = TcpServer(core, cfg)
    started = threading.Event()

    async def run():
        await srv.start()
        started.set()
        await stop_ev.wait()
        await srv.stop()

    stop_ev = None

    def runner():
        nonlocal stop_ev
        asyncio.set_event_loop(loop)
        stop_ev = asyncio.Event()
        loop.run_until_complete(run())

    th = threading.Thread(target=runner, daemon=True)
    th.start()
    assert started.wait(20)
    yield srv.port
    loop.call_soon_threadsafe(stop_ev.set)
    th.join(20)


def run_cli(argv, stdin_text=""):
    import sys
    from mygramdb_tpu.cli import repl
    old_in, old_out, old_err = sys.stdin, sys.stdout, sys.stderr
    sys.stdin = io.StringIO(stdin_text)
    sys.stdout = io.StringIO()
    sys.stderr = io.StringIO()
    try:
        rc = repl.main(argv)
        return rc, sys.stdout.getvalue(), sys.stderr.getvalue()
    finally:
        sys.stdin, sys.stdout, sys.stderr = old_in, old_out, old_err


class TestCliOneShot:
    def test_execute_ok(self, live_port):
        rc, out, _ = run_cli(["-p", str(live_port),
                              "-e", "SEARCH t hello"])
        assert rc == 0
        assert out.startswith("OK RESULTS 1 1")

    def test_execute_error_maps_rc1(self, live_port):
        rc, out, _ = run_cli(["-p", str(live_port),
                              "-e", "SEARCH missing hello"])
        assert rc == 1
        assert out.startswith("ERROR")

    def test_connection_failure_maps_rc2(self):
        rc, _out, err = run_cli(["-p", "1", "-e", "INFO"])
        assert rc == 2
        assert "cannot connect" in err

    def test_debug_on_single_line(self, live_port):
        rc, out, _ = run_cli(["-p", str(live_port), "-e", "DEBUG ON"])
        assert rc == 0
        assert out.strip() == "OK DEBUG_ON"

    def test_info_end_framed(self, live_port):
        rc, out, _ = run_cli(["-p", str(live_port), "-e", "INFO"])
        assert rc == 0
        assert out.rstrip().endswith("END")


class TestCliRepl:
    def test_repl_session(self, live_port):
        rc, out, _ = run_cli(
            ["-p", str(live_port)],
            stdin_text="SEARCH t world\nCOUNT t hello\nQUIT\n")
        assert rc == 0
        assert "OK RESULTS 2" in out
        assert "OK COUNT 1" in out

    def test_repl_eof_exits_cleanly(self, live_port):
        rc, out, _ = run_cli(["-p", str(live_port)], stdin_text="")
        assert rc == 0

    def test_repl_debug_session_no_desync(self, live_port):
        # DEBUG ON -> debug-framed SEARCH (leading-blank body) ->
        # DEBUG OFF -> normal command still answers correctly (a framing
        # bug here leaves the debug body unread and desyncs the wire)
        rc, out, _ = run_cli(
            ["-p", str(live_port)],
            stdin_text="DEBUG ON\nSEARCH t hello\nDEBUG OFF\n"
                       "COUNT t world\nQUIT\n")
        assert rc == 0
        assert "OK DEBUG_ON" in out
        assert "# DEBUG" in out
        assert "OK DEBUG_OFF" in out
        assert "OK COUNT 2" in out
