"""Protocol fuzzing: no input may crash the command plane."""

import random
import string

import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.core import ConnState, ServerCore


@pytest.fixture(scope="module")
def core():
    cfg = load_config_from_dict({
        "tables": [{"name": "t", "text_source": {"column": "c"},
                    "filters": [{"name": "s", "type": "int"}]}],
        "memory": {"verify_text": "all"},
    })
    cat = TableCatalog(cfg)
    ctx = cat.resolve("t")
    for i in range(1, 20):
        ctx.add_row(str(i), f"document number {i}", {"s": i % 3})
    return ServerCore(cfg, cat)


KEYWORDS = ["SEARCH", "COUNT", "GET", "FACET", "INFO", "DUMP", "SAVE",
            "LOAD", "SYNC", "CONFIG", "OPTIMIZE", "CACHE", "SET", "SHOW",
            "DEBUG", "REPLICATION", "AND", "NOT", "OR", "FILTER", "SORT",
            "LIMIT", "OFFSET", "FUZZY", "HIGHLIGHT", "t", '"', "(", ")",
            "=", "<", ">=", "-1", "0", "999999999999", "日本語", "\\", "'"]


def test_random_keyword_soup(core):
    rng = random.Random(1234)
    for _ in range(600):
        n = rng.randint(1, 10)
        line = " ".join(rng.choice(KEYWORDS) for _ in range(n))
        resp = core.handle_line(line)
        assert isinstance(resp, str) and resp  # never raises, never empty


def test_random_bytes(core):
    rng = random.Random(99)
    for _ in range(200):
        n = rng.randint(1, 80)
        line = "".join(chr(rng.randint(1, 0x2FF)) for _ in range(n))
        resp = core.handle_line(line)
        assert isinstance(resp, str) and resp


def test_pathological_structures(core):
    cases = [
        "SEARCH t " + "(" * 40 + "a" + ")" * 40,
        "SEARCH t " + " OR ".join(f"t{i}" for i in range(100)),
        "SEARCH t a LIMIT 99999999999999999999",
        "SEARCH t " + "x" * 100000,
        "SET " + "a" * 1000 + " = " + "b" * 1000,
        "GET t " + "\x00" * 50,
        "SEARCH t \"" + "never closed",
        "FACET t",
        "SEARCH t a FILTER s = ",
        "SHOW VARIABLES LIKE",
    ]
    for line in cases:
        resp = core.handle_line(line)
        assert isinstance(resp, str) and resp, line
