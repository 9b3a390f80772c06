"""Synthesize raw binlog event byte streams for tests.

Test-side counterpart of the reference's binlog_event_builder.h /
binlog_test_fixtures.h: builds wire-accurate v4 events (FDE with CRC32
checksum algorithm, GTID, TABLE_MAP, WRITE/UPDATE/DELETE_ROWS v2, XID,
QUERY) so the parser and reader pipeline are tested without a MySQL server.
"""

from __future__ import annotations

import struct
import uuid as uuid_mod
import zlib
from typing import Any, List, Optional, Sequence, Tuple

from mygramdb_tpu.replication import binlog_events as ev
from mygramdb_tpu.replication import rows as rowmod


def _lenc(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n <= 0xFFFF:
        return b"\xfc" + struct.pack("<H", n)
    if n <= 0xFFFFFF:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


class EventBuilder:
    def __init__(self, server_id: int = 1, checksum: bool = True):
        self.server_id = server_id
        self.checksum = checksum
        self.log_pos = 4

    def _frame(self, type_code: int, body: bytes,
               corrupt_crc: bool = False) -> bytes:
        extra = 4 if self.checksum else 0
        size = ev.HEADER_LEN + len(body) + extra
        self.log_pos += size
        header = struct.pack("<IBIIIH", 1700000000, type_code,
                             self.server_id, size, self.log_pos, 0)
        data = header + body
        if self.checksum:
            crc = zlib.crc32(data) & 0xFFFFFFFF
            if corrupt_crc:
                crc ^= 0xDEADBEEF
            data += struct.pack("<I", crc)
        return data

    # ------------------------------------------------------------------
    def fde(self) -> bytes:
        body = struct.pack("<H", 4)
        body += b"8.4.0-mygram-test".ljust(50, b"\x00")
        body += struct.pack("<I", 1700000000)
        body += bytes([ev.HEADER_LEN])
        body += bytes(40)  # post-header length table (content unused)
        body += bytes([1 if self.checksum else 0])  # checksum algorithm
        return self._frame(ev.FORMAT_DESCRIPTION_EVENT, body)

    def gtid(self, sid: str, gno: int) -> bytes:
        body = bytes([1]) + uuid_mod.UUID(sid).bytes + struct.pack("<Q", gno)
        return self._frame(ev.GTID_EVENT, body)

    def mariadb_gtid(self, domain: int, seq: int) -> bytes:
        body = struct.pack("<QIB", seq, domain, 0)
        return self._frame(ev.MARIADB_GTID_EVENT, body)

    def begin(self, schema: str = "db") -> bytes:
        return self.query("BEGIN", schema)

    def query(self, sql: str, schema: str = "db") -> bytes:
        sb = schema.encode()
        body = struct.pack("<IIBHH", 7, 0, len(sb), 0, 0)
        body += sb + b"\x00" + sql.encode()
        return self._frame(ev.QUERY_EVENT, body)

    def xid(self) -> bytes:
        return self._frame(ev.XID_EVENT, struct.pack("<Q", 12345))

    def rotate(self, name: str = "binlog.000002", pos: int = 4) -> bytes:
        return self._frame(ev.ROTATE_EVENT,
                           struct.pack("<Q", pos) + name.encode())

    # ------------------------------------------------------------------
    def table_map(self, table_id: int, schema: str, table: str,
                  col_types: Sequence[int],
                  col_metas: Optional[Sequence[int]] = None,
                  col_names: Optional[Sequence[str]] = None,
                  unsigned: Optional[Sequence[bool]] = None) -> bytes:
        metas = list(col_metas or [0] * len(col_types))
        body = struct.pack("<I", table_id & 0xFFFFFFFF)
        body += struct.pack("<H", (table_id >> 32) & 0xFFFF)
        body += struct.pack("<H", 0)  # flags
        sb, tb = schema.encode(), table.encode()
        body += bytes([len(sb)]) + sb + b"\x00"
        body += bytes([len(tb)]) + tb + b"\x00"
        body += _lenc(len(col_types)) + bytes(col_types)
        meta_blob = b""
        for t, m in zip(col_types, metas):
            n = rowmod.metadata_length(t)
            if n == 1:
                meta_blob += bytes([m])
            elif n == 2:
                if t in (rowmod.T_STRING, rowmod.T_ENUM, rowmod.T_SET,
                         rowmod.T_NEWDECIMAL):
                    meta_blob += bytes([(m >> 8) & 0xFF, m & 0xFF])
                elif t == rowmod.T_BIT:
                    meta_blob += bytes([m & 0xFF, (m >> 8) & 0xFF])
                else:
                    meta_blob += struct.pack("<H", m)
        body += _lenc(len(meta_blob)) + meta_blob
        body += bytes((len(col_types) + 7) // 8)  # nullability (all 0)
        if unsigned is not None:
            numeric = [i for i, ct in enumerate(col_types)
                       if ct in (1, 2, 3, 8, 9, 4, 5, 246)]
            bits = bytearray((len(numeric) + 7) // 8)
            for j, i in enumerate(numeric):
                if unsigned[i]:
                    bits[j // 8] |= 0x80 >> (j % 8)
            body += bytes([1]) + _lenc(len(bits)) + bytes(bits)
        if col_names is not None:
            payload = b"".join(_lenc(len(n.encode())) + n.encode()
                               for n in col_names)
            body += bytes([4]) + _lenc(len(payload)) + payload
        return self._frame(ev.TABLE_MAP_EVENT, body)

    # ------------------------------------------------------------------
    def _encode_value(self, col_type: int, meta: int, value: Any) -> bytes:
        t = col_type
        if t == rowmod.T_TINY:
            return struct.pack("<b" if value < 0 else "<B", value)
        if t == rowmod.T_SHORT:
            return struct.pack("<h" if value < 0 else "<H", value)
        if t == rowmod.T_LONG:
            return struct.pack("<i" if value < 0 else "<I", value)
        if t == rowmod.T_LONGLONG:
            return struct.pack("<q" if value < 0 else "<Q", value)
        if t == rowmod.T_FLOAT:
            return struct.pack("<f", value)
        if t == rowmod.T_DOUBLE:
            return struct.pack("<d", value)
        if t == rowmod.T_VARCHAR:
            raw = value.encode() if isinstance(value, str) else value
            if meta > 255:
                return struct.pack("<H", len(raw)) + raw
            return bytes([len(raw)]) + raw
        if t in (rowmod.T_BLOB, rowmod.T_VECTOR):
            raw = value.encode() if isinstance(value, str) else value
            n = meta or 2
            return len(raw).to_bytes(n, "little") + raw
        if t == rowmod.T_DATETIME2:
            # value = (Y, M, D, h, m, s)
            y, mo, d, h, mi, s = value
            ym = y * 13 + mo
            packed = (1 << 39) | (ym << 22) | (d << 17) | (h << 12) \
                | (mi << 6) | s
            return packed.to_bytes(5, "big")
        if t == rowmod.T_TIMESTAMP2:
            return int(value).to_bytes(4, "big")
        raise ValueError(f"builder: unsupported type {t}")

    def _encode_row(self, col_types, metas, values) -> bytes:
        nulls = bytearray((len(values) + 7) // 8)
        data = b""
        for i, v in enumerate(values):
            if v is None:
                nulls[i // 8] |= 1 << (i % 8)
            else:
                data += self._encode_value(col_types[i], metas[i], v)
        return bytes(nulls) + data

    def rows(self, table_id: int, kind: str, col_types: Sequence[int],
             col_metas: Sequence[int], rows: List[Any],
             corrupt_crc: bool = False,
             present_mask: bytes = b"") -> bytes:
        code = {"insert": ev.WRITE_ROWS_V2, "delete": ev.DELETE_ROWS_V2,
                "update": ev.UPDATE_ROWS_V2}[kind]
        n = len(col_types)
        body = struct.pack("<I", table_id & 0xFFFFFFFF)
        body += struct.pack("<H", (table_id >> 32) & 0xFFFF)
        body += struct.pack("<H", 0)       # flags
        body += struct.pack("<H", 2)       # v2 extra length (none)
        body += _lenc(n)
        present = present_mask or bytes([0xFF] * ((n + 7) // 8))
        body += present
        if kind == "update":
            body += present
        for row in rows:
            if kind == "update":
                before, after = row
                body += self._encode_row(col_types, col_metas, before)
                body += self._encode_row(col_types, col_metas, after)
            else:
                body += self._encode_row(col_types, col_metas, row)
        return self._frame(code, body, corrupt_crc=corrupt_crc)
