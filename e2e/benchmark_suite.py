"""End-to-end benchmark suite against a live server over TCP.

Counterpart of the reference's e2e/benchmark_suite.py (SURVEY.md §4.6):
scenario-driven latency/QPS measurement through the real protocol with
regression thresholds (e2e/scenarios.json). Spawns an in-process server
(seeded synthetic corpus incl. CJK), runs each scenario at several
concurrency levels, reports p50/p99/QPS, and exits non-zero on threshold
violations.

    python e2e/benchmark_suite.py [--mode quick|standard] [--json out.json]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import socket
import statistics
import sys
import threading
import time
from typing import Dict, List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta",
         "lambda", "sigma", "omega", "quick", "brown", "search", "engine"]
JA = ["日本", "東京", "検索", "高速", "言語", "工学"]


def make_docs(n: int) -> List[dict]:
    rng = np.random.default_rng(99)
    docs = []
    for i in range(1, n + 1):
        words = list(rng.choice(WORDS, size=int(rng.integers(5, 15))))
        if i % 3 == 0:
            words.extend(rng.choice(JA, size=2))
        docs.append({"id": i, "content": " ".join(words),
                     "status": int(rng.integers(0, 3)),
                     "category": str(rng.choice(["news", "blog", "doc"]))})
    return docs


def start_server(docs: List[dict]) -> Dict:
    from mygramdb_tpu.catalog import TableCatalog
    from mygramdb_tpu.config import load_config_from_dict
    from mygramdb_tpu.server.core import ServerCore
    from mygramdb_tpu.server.tcp_server import TcpServer

    cfg = load_config_from_dict({
        "tables": [{"name": "bench", "text_source": {"column": "content"},
                    "filters": [
                        {"name": "status", "type": "int",
                         "bitmap_index": True},
                        {"name": "category", "type": "string"}]}],
        "memory": {"verify_text": "all"},
        "api": {"tcp": {"bind": "127.0.0.1", "port": 0}},
        "network": {"allow_cidrs": ["127.0.0.0/8"]},
        "cache": {"enabled": False},
    })
    cat = TableCatalog(cfg)
    ctx = cat.resolve("bench")
    for d in docs:
        ctx.add_row(str(d["id"]), d["content"],
                    {"status": d["status"], "category": d["category"]})
    ctx.optimize()
    try:
        ctx.index.device.warmup()
    except Exception:
        pass
    core = ServerCore(cfg, cat)
    holder: Dict = {}
    started = threading.Event()

    async def main():
        srv = TcpServer(core, cfg)
        await srv.start()
        holder["port"] = srv.port
        holder["stop"] = asyncio.get_running_loop().create_future()
        started.set()
        await holder["stop"]
        await srv.stop()

    t = threading.Thread(target=lambda: asyncio.run(main()), daemon=True)
    t.start()
    started.wait(60)
    holder["thread"] = t
    return holder


def run_scenario(port: int, query: str, duration_sec: float,
                 concurrency: int) -> Dict:
    latencies: List[float] = []
    lock = threading.Lock()
    stop_at = time.perf_counter() + duration_sec
    errors = [0]

    def worker():
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=30)
            f = s.makefile("rwb")
        except OSError:
            errors[0] += 1
            return
        local = []
        while time.perf_counter() < stop_at:
            t0 = time.perf_counter()
            f.write(query.encode() + b"\r\n")
            f.flush()
            resp = f.readline()
            dt = time.perf_counter() - t0
            if not resp or resp.startswith(b"ERROR"):
                errors[0] += 1
                break
            local.append(dt)
        with lock:
            latencies.extend(local)
        s.close()

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if not latencies:
        return {"error": "no successful queries", "errors": errors[0]}
    latencies.sort()
    return {
        "n": len(latencies),
        "qps": round(len(latencies) / wall, 1),
        "p50_ms": round(latencies[len(latencies) // 2] * 1000, 3),
        "p99_ms": round(latencies[int(len(latencies) * 0.99)] * 1000, 3),
        "errors": errors[0],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["quick", "standard"],
                    default="quick")
    ap.add_argument("--json", default="")
    ap.add_argument("--concurrency", type=int, default=8)
    args = ap.parse_args()
    duration = 2.0 if args.mode == "quick" else 8.0

    here = os.path.dirname(os.path.abspath(__file__))
    scenarios = json.load(open(os.path.join(here, "scenarios.json")))[
        "scenarios"]

    results = {}
    failures = []
    by_docs: Dict[int, List[dict]] = {}
    for sc in scenarios:
        by_docs.setdefault(sc["docs"], []).append(sc)

    for n_docs, group in sorted(by_docs.items()):
        docs = make_docs(n_docs)
        holder = start_server(docs)
        port = holder["port"]
        try:
            for sc in group:
                query = sc["query"].format(t="bench")
                # warm the path once
                run_scenario(port, query, 0.3, 1)
                out = run_scenario(port, query, duration, args.concurrency)
                results[sc["name"]] = out
                th = sc.get("thresholds", {})
                status = "ok"
                if "error" in out:
                    status = "error"
                    failures.append(sc["name"])
                else:
                    if out["p50_ms"] > th.get("p50_ms", 1e9) or \
                            out["p99_ms"] > th.get("p99_ms", 1e9) or \
                            out["qps"] < th.get("min_qps", 0):
                        status = "THRESHOLD_VIOLATION"
                        failures.append(sc["name"])
                out["status"] = status
                print(f"{sc['name']:>20}: {json.dumps(out)}", flush=True)
        finally:
            try:
                holder["stop"].get_loop().call_soon_threadsafe(
                    holder["stop"].set_result, None)
                holder["thread"].join(timeout=10)
            except Exception:
                pass

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    if failures:
        print(f"FAILURES: {failures}", file=sys.stderr)
        return 1
    print("all scenarios within thresholds")
    return 0


if __name__ == "__main__":
    sys.exit(main())
