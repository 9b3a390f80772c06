"""Randomized HTTP<->TCP consistency fuzz: both planes must answer the
same logical query identically across the expression/filter/sort/limit
grammar (generalizes test_http_tcp_consistency; reference
http_tcp_consistency_test.cpp breadth)."""

import asyncio

import numpy as np

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.core import ServerCore
from mygramdb_tpu.server.http_server import HttpServer

WORDS = ["alpha", "beta", "gamma", "delta", "omega", "quick", "brown",
         "fox", "search", "engine"]
JA = ["日本", "東京", "検索", "高速"]

CFG = {
    "tables": [{"name": "t", "text_source": {"column": "content"},
                "filters": [
                    {"name": "status", "type": "int",
                     "bitmap_index": True},
                    {"name": "category", "type": "string"}]}],
    "memory": {"verify_text": "all"},
    "api": {"http": {"enable": True, "bind": "127.0.0.1", "port": 0}},
    "network": {"allow_cidrs": ["127.0.0.0/8"]},
    "cache": {"enabled": False},
}

_OPS = [("=", "EQ"), ("!=", "NE"), (">", "GT"), ("<=", "LTE")]


def make_core(n_docs=400, seed=11):
    rng = np.random.default_rng(seed)
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("t")
    for i in range(1, n_docs + 1):
        words = list(rng.choice(WORDS, size=int(rng.integers(3, 9))))
        if i % 3 == 0:
            words.extend(rng.choice(JA, size=2))
        ctx.add_row(str(i), " ".join(words),
                    {"status": int(rng.integers(0, 4)),
                     "category": str(rng.choice(["news", "blog"]))})
    ctx.optimize()
    return ServerCore(cfg, cat)


def gen_case(rng):
    """-> (tcp_expr, http_q, filters, sort, limit)"""
    kind = rng.integers(0, 5)
    if kind == 0:
        expr = str(rng.choice(WORDS))
    elif kind == 1:
        a, b = rng.choice(WORDS, size=2, replace=False)
        expr = f"{a} AND {b}"
    elif kind == 2:
        a, b = rng.choice(WORDS, size=2, replace=False)
        expr = f'"{a} {b}"'
    elif kind == 3:
        a, b, c = rng.choice(WORDS, size=3, replace=False)
        expr = f"(({a} OR {b}) AND NOT {c})"
    else:
        expr = str(rng.choice(JA))
    filt = None
    if rng.random() < 0.5:
        sym, name = _OPS[int(rng.integers(0, len(_OPS)))]
        filt = ("status", sym, name, int(rng.integers(0, 4)))
    sort = [("id", "ASC"), ("id", "DESC"), ("_score", "DESC"),
            ("status", "ASC")][int(rng.integers(0, 4))]
    limit = int(rng.choice([5, 17, 100]))
    return expr, filt, sort, limit


async def http_search(port, body):
    import aiohttp
    async with aiohttp.ClientSession() as s:
        async with s.post(f"http://127.0.0.1:{port}/tables/t/search",
                          json=body) as resp:
            return resp.status, await resp.json(content_type=None)


def test_plane_consistency_fuzz():
    core = make_core()
    rng = np.random.default_rng(42)

    async def main():
        srv = HttpServer(core, core.config)
        await srv.start()
        mismatches = []
        try:
            for case in range(80):
                expr, filt, (scol, sord), limit = gen_case(rng)
                line = f"SEARCH t {expr}"
                body = {"q": expr, "limit": limit,
                        "sort": {"column": scol, "order": sord}}
                if filt is not None:
                    col, sym, name, val = filt
                    line += f" FILTER {col} {sym} {val}"
                    body["filters"] = {col: {"op": name, "value": val}}
                line += f" SORT {scol} {sord} LIMIT {limit}"
                t_resp = core.handle_line(line)
                st, h_body = await http_search(srv.port, body)
                if t_resp.startswith("ERROR"):
                    if st == 200:
                        mismatches.append((line, t_resp, h_body))
                    continue
                parts = t_resp.split()
                t_total, t_pks = int(parts[2]), parts[3:]
                if st != 200 or h_body.get("total") != t_total or \
                        h_body.get("results") != t_pks:
                    mismatches.append((line, t_resp, h_body))
        finally:
            await srv.stop()
        assert not mismatches, mismatches[:3]

    asyncio.run(main())
