"""Wire-faithful fake MySQL server for end-to-end replication tests.

Speaks enough of the real protocol that ``MysqlConnection`` (raw-socket
client) connects, authenticates, validates prerequisites, snapshots a
table through ``InitialLoader``, registers as a slave and streams binlog
events built by ``tests/binlog_builder.py`` — the loader+reader loop the
reference exercises against dockerized MySQL (reference e2e/tests/
replication/) without needing a MySQL daemon or network egress.

Implements: handshake v10 (mysql_native_password), COM_QUERY text
protocol (system variables, INFORMATION_SCHEMA.COLUMNS, paged
``SELECT ... ORDER BY pk LIMIT n`` over an in-memory table, SET/BEGIN/
COMMIT as OK), COM_PING, COM_REGISTER_SLAVE, COM_BINLOG_DUMP_GTID /
COM_BINLOG_DUMP streaming with a live event queue.
"""

from __future__ import annotations

import os
import queue
import re
import socket
import struct
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

from mygramdb_tpu.replication import packets as pk
from mygramdb_tpu.replication.packets import PacketStream

_EOF = b"\xfe\x00\x00\x00\x00"  # EOF: warnings=0 status=0 (len 5 < 9)
_STREAM_END = object()


def _lenc(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n <= 0xFFFF:
        return b"\xfc" + struct.pack("<H", n)
    if n <= 0xFFFFFF:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def _lenc_str(s: Optional[str]) -> bytes:
    if s is None:
        return b"\xfb"  # NULL
    b = s.encode("utf-8")
    return _lenc(len(b)) + b


def _ok_packet(affected: int = 0) -> bytes:
    return b"\x00" + _lenc(affected) + _lenc(0) + struct.pack("<HH", 2, 0)


def _err_packet(code: int, msg: str) -> bytes:
    return (b"\xff" + struct.pack("<H", code) + b"#HY000" +
            msg.encode("utf-8"))


def _coldef(name: str) -> bytes:
    """Column definition 4.1: the client reads catalog/schema/table/
    org_table/name (mygramdb_tpu.replication.connection._column_name)."""
    out = _lenc_str("def") + _lenc_str("") + _lenc_str("")
    out += _lenc_str("") + _lenc_str(name) + _lenc_str(name)
    out += bytes([0x0C])                    # fixed-length fields length
    out += struct.pack("<H", 45)            # charset utf8mb4
    out += struct.pack("<I", 1024)          # column length
    out += bytes([0xFD])                    # type VAR_STRING
    out += struct.pack("<H", 0)             # flags
    out += bytes([0])                       # decimals
    out += b"\x00\x00"                      # filler
    return out


class FakeMysqlServer:
    """In-process MySQL server double. ``table`` maps pk (int) -> row dict;
    ``columns`` orders the served columns (first must be the pk column)."""

    def __init__(self, *, database: str = "testdb", table: str = "articles",
                 pk_col: str = "id",
                 columns: Optional[Sequence[str]] = None,
                 rows: Optional[Dict[int, Dict[str, Any]]] = None,
                 variables: Optional[Dict[str, str]] = None,
                 schema_types: Optional[Dict[str, Tuple[str, str]]] = None,
                 server_version: str = "8.0.36-fake"):
        self.database = database
        self.table = table
        self.pk_col = pk_col
        self.columns = list(columns or [pk_col])
        self.rows: Dict[int, Dict[str, Any]] = dict(rows or {})
        self.server_version = server_version
        uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
        self.variables = {
            "server_uuid": uuid,
            "server_id": "1",
            "gtid_mode": "ON",
            "enforce_gtid_consistency": "ON",
            "binlog_format": "ROW",
            "binlog_row_image": "FULL",
            "binlog_checksum": "CRC32",
            "gtid_executed": f"{uuid}:1-5",
            "gtid_current_pos": "0-1-5",
            "log_bin": "1",
            "version": server_version,
        }
        self.variables.update(variables or {})
        # column -> (DATA_TYPE, COLUMN_TYPE); default everything varchar
        self.schema_types = dict(schema_types or {})
        self.queries: List[str] = []           # every COM_QUERY received
        self.binlog_queue: "queue.Queue" = queue.Queue()
        self.binlog_started = threading.Event()
        self.dump_requests: List[bytes] = []
        self._sock: Optional[socket.socket] = None
        self._threads: List[threading.Thread] = []
        self._stop = threading.Event()
        self.port = 0
        self._lock = threading.Lock()

    # ------------------------------------------------------------------
    def start(self) -> int:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("127.0.0.1", 0))
        s.listen(8)
        s.settimeout(0.2)
        self._sock = s
        self.port = s.getsockname()[1]
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self.port

    def stop(self) -> None:
        self._stop.set()
        self.binlog_queue.put(_STREAM_END)
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass

    def __enter__(self) -> "FakeMysqlServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    # ------------------------------------------------------------------
    def push_event(self, raw: bytes) -> None:
        """Queue one raw binlog event (header+body+checksum) for dump
        connections."""
        self.binlog_queue.put(raw)

    def end_binlog(self) -> None:
        """Terminate the binlog stream with a server EOF."""
        self.binlog_queue.put(_STREAM_END)

    # ------------------------------------------------------------------
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            t = threading.Thread(target=self._serve, args=(conn,),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def _handshake(self, stream: PacketStream) -> None:
        nonce = os.urandom(20)
        caps = (pk.CLIENT_PROTOCOL_41 | pk.CLIENT_SECURE_CONNECTION |
                pk.CLIENT_PLUGIN_AUTH | pk.CLIENT_LONG_PASSWORD |
                pk.CLIENT_TRANSACTIONS)
        payload = bytes([10])
        payload += self.server_version.encode() + b"\x00"
        payload += struct.pack("<I", 7)          # thread id
        payload += nonce[:8] + b"\x00"           # auth-data-1 + filler
        payload += struct.pack("<H", caps & 0xFFFF)
        payload += bytes([45])                   # charset
        payload += struct.pack("<H", 2)          # status
        payload += struct.pack("<H", caps >> 16)
        payload += bytes([21])                   # auth data len
        payload += b"\x00" * 10
        payload += nonce[8:] + b"\x00"           # auth-data-2
        payload += b"mysql_native_password\x00"
        stream.seq = 0
        stream.write_packet(payload)
        stream.read_packet()                     # handshake response
        stream.write_packet(_ok_packet())        # accept any credentials

    def _serve(self, conn: socket.socket) -> None:
        conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        stream = PacketStream(conn)
        try:
            self._handshake(stream)
            while not self._stop.is_set():
                payload = stream.read_packet()
                if not payload:
                    return
                cmd = payload[0]
                if cmd == pk.COM_QUIT:
                    return
                if cmd == pk.COM_PING:
                    stream.write_packet(_ok_packet())
                elif cmd == pk.COM_QUERY:
                    sql = payload[1:].decode("utf-8", "replace")
                    with self._lock:
                        self.queries.append(sql)
                    self._handle_query(stream, sql)
                elif cmd == pk.COM_REGISTER_SLAVE:
                    stream.write_packet(_ok_packet())
                elif cmd in (pk.COM_BINLOG_DUMP, pk.COM_BINLOG_DUMP_GTID):
                    self.dump_requests.append(payload)
                    self.binlog_started.set()
                    self._stream_binlog(stream)
                    return
                else:
                    stream.write_packet(
                        _err_packet(1047, f"unknown command {cmd:#x}"))
        except Exception:
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    # ------------------------------------------------------------------
    def _send_resultset(self, stream: PacketStream, columns: Sequence[str],
                        rows: Sequence[Sequence[Optional[str]]]) -> None:
        stream.write_packet(_lenc(len(columns)))
        for c in columns:
            stream.write_packet(_coldef(c))
        stream.write_packet(_EOF)
        for r in rows:
            stream.write_packet(b"".join(_lenc_str(v) for v in r))
        stream.write_packet(_EOF)

    _VAR_RE = re.compile(
        r"^\s*(?:SELECT|select)\s+@@(?:GLOBAL\.|global\.)?(\w+)\s*$")

    def _handle_query(self, stream: PacketStream, sql: str) -> None:
        s = sql.strip()
        up = s.upper()
        m = self._VAR_RE.match(s)
        if m:
            name = m.group(1).lower()
            val = self.variables.get(name)
            self._send_resultset(stream, [f"@@{name}"], [[val]])
            return
        if up.startswith(("SET ", "START TRANSACTION", "BEGIN", "COMMIT",
                          "ROLLBACK", "FLUSH ", "USE ")):
            stream.write_packet(_ok_packet())
            return
        if "INFORMATION_SCHEMA.COLUMNS" in up:
            rows = []
            for c in self.columns:
                dt, ct = self.schema_types.get(
                    c, ("int", "int") if c == self.pk_col
                    else ("varchar", "varchar(1024)"))
                key = "PRI" if c == self.pk_col else ""
                rows.append([c, dt, ct, key])
            self._send_resultset(
                stream, ["COLUMN_NAME", "DATA_TYPE", "COLUMN_TYPE",
                         "COLUMN_KEY"], rows)
            return
        m = re.match(r"^SELECT\s+(.*?)\s+FROM\s+(\S+)(?:\s+WHERE\s+`?(\w+)`?"
                     r"\s*>\s*'?([^\s']+)'?)?\s+ORDER BY\s+`?(\w+)`?"
                     r"\s+LIMIT\s+(\d+)\s*$", s, re.IGNORECASE | re.DOTALL)
        if m:
            col_list = [c.strip().strip("`") for c in m.group(1).split(",")]
            after = m.group(4)
            limit = int(m.group(6))
            pks = sorted(self.rows)
            if after is not None:
                pks = [p for p in pks if p > int(after)]
            out = []
            for p in pks[:limit]:
                row = self.rows[p]
                vals = []
                for c in col_list:
                    v = p if c == self.pk_col else row.get(c)
                    vals.append(None if v is None else str(v))
                out.append(vals)
            self._send_resultset(stream, col_list, out)
            return
        if up.startswith("SELECT"):
            # unknown SELECT: empty result keeps validators moving
            self._send_resultset(stream, ["value"], [])
            return
        stream.write_packet(_ok_packet())

    def _stream_binlog(self, stream: PacketStream) -> None:
        """0x00-prefixed event packets until _STREAM_END, then EOF."""
        while not self._stop.is_set():
            try:
                item = self.binlog_queue.get(timeout=0.2)
            except queue.Empty:
                continue
            if item is _STREAM_END:
                stream.write_packet(_EOF)
                return
            stream.write_packet(b"\x00" + item)
