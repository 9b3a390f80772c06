"""C++ client library test: build with g++, drive a live server via ctypes."""

import asyncio
import ctypes
import os
import shutil
import subprocess
import threading

import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.core import ServerCore
from mygramdb_tpu.server.tcp_server import TcpServer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "native")

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="g++ not available")


@pytest.fixture(scope="module")
def client_lib():
    subprocess.run(["make", "-C", NATIVE, "client"], check=True,
                   capture_output=True, timeout=120)
    lib = ctypes.CDLL(os.path.join(NATIVE, "libmygram_client.so"))
    lib.mg_client_new.restype = ctypes.c_void_p
    lib.mg_client_new.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                  ctypes.c_int]
    lib.mg_client_connect.argtypes = [ctypes.c_void_p]
    lib.mg_client_command.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_char_p, ctypes.c_size_t]
    lib.mg_client_count.restype = ctypes.c_long
    lib.mg_client_count.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_char_p]
    lib.mg_client_free.argtypes = [ctypes.c_void_p]
    lib.mg_client_close.argtypes = [ctypes.c_void_p]
    return lib


@pytest.fixture(scope="module")
def server():
    holder = {}
    started = threading.Event()

    async def main():
        cfg = load_config_from_dict({
            "tables": [{"name": "t", "text_source": {"column": "c"}}],
            "memory": {"verify_text": "all"},
            "api": {"tcp": {"bind": "127.0.0.1", "port": 0}},
            "network": {"allow_cidrs": ["127.0.0.0/8"]},
        })
        cat = TableCatalog(cfg)
        ctx = cat.resolve("t")
        for i, text in [(1, "hello world"), (2, "hello cpp"),
                        (3, "goodbye")]:
            ctx.add_row(str(i), text, {})
        srv = TcpServer(ServerCore(cfg, cat), cfg)
        await srv.start()
        holder["port"] = srv.port
        holder["stop"] = asyncio.get_running_loop().create_future()
        started.set()
        await holder["stop"]
        await srv.stop()

    t = threading.Thread(target=lambda: asyncio.run(main()), daemon=True)
    t.start()
    started.wait(30)
    yield holder
    holder["stop"].get_loop().call_soon_threadsafe(
        holder["stop"].set_result, None)
    t.join(10)


def test_cpp_client_end_to_end(client_lib, server):
    lib = client_lib
    c = lib.mg_client_new(b"127.0.0.1", server["port"], 20)
    assert c
    assert lib.mg_client_connect(c) == 0
    buf = ctypes.create_string_buffer(4096)
    rc = lib.mg_client_command(c, b"SEARCH t hello", buf, len(buf))
    assert rc == 0
    assert buf.value.decode() == "OK RESULTS 2 2 1"
    assert lib.mg_client_count(c, b"t", b"hello") == 2
    rc = lib.mg_client_command(c, b"SEARCH nope x", buf, len(buf))
    assert rc == 1
    assert buf.value.decode().startswith("ERROR")
    lib.mg_client_close(c)
    lib.mg_client_free(c)
