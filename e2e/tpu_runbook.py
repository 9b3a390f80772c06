"""One-command TPU measurement runbook (round 5).

Runs the outstanding measurement queue in order, single-tenant, with
bounded step budgets and transport stamps in every artifact:

  probe     bounded jax.devices() — abort everything if the tunnel is
            dead (an unbounded first dispatch blocks forever)
  ab        verified-path A/B at 1.1M docs (r4 verdict next #1b):
            scan        = r5 default (XLA gather + EXACT scanned global
                          compaction + u16 delta wire; full-shape
                          verified incl. the dense-only majority)
            r3_control  = the r3 winner config re-run in the SAME
                          session (XLA gather, no global stage, raw
                          int32 postings transport) — the trend control
            fixed_global= the r4 fixed-M global stage for comparison
            The scan-vs-r3_control pair in one session also IS the u16
            wire upload A/B (upload_detail.postings_wire_mb /
            postings_put_s) — r4 verdict next #5.
  bench1m   promote the winning A/B run's JSON to BENCH_1M.json
  bench4m   scale_bench --docs 4000000 --verify (winner env)
  bench10m  scale_bench --docs 10000000 --verify, flat text layout
            (padded exceeds the HBM budget at 10M)
  headline  bench.py (100k-doc batched dense headline, stamped —
            r4 verdict next #8)
  gates     e2e/benchmark_suite.py quick gate suite (20k corpora)
  gates_1m  e2e/benchmark_suite.py --scale: adds the 1.1M fuzzy +
            synonym scenarios (r4 verdict next #7)

State is written to RUNBOOK_r5.json after every step so a mid-run
tunnel death loses nothing. Steps are selectable:

    python e2e/tpu_runbook.py                 # everything
    python e2e/tpu_runbook.py --steps ab,bench4m
    python e2e/tpu_runbook.py --probe-timeout 120   # quick liveness test

Single-tenant rules (CLAUDE.md): steps run strictly sequentially; a
step that exceeds its budget is SIGTERM'd by exact child PID and the
runbook ABORTS (never stack a second TPU process behind a hung one).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_PATH = os.path.join(REPO, os.environ.get("MYGRAM_RUNBOOK_STATE",
                                               "RUNBOOK_r5.json"))
LOG_DIR = os.path.join(REPO, "e2e", "runbook_logs")
CACHE_DIR = os.path.join(REPO, "e2e", "build_cache")

AB_VARIANTS = [
    # (name, env overrides). scan = the r5 production default (padded
    # layout auto-routes to the XLA gather + exact scanned global
    # compaction; u16 wire on). r3_control re-runs the r3 winner config
    # in the SAME session so tunnel weather can never again confound the
    # trend (r4 verdict weak #1). fixed_global = the r4 fixed-M stage.
    ("scan", {}),
    # flat text layout at 1.1M: the owner-indexed live-skip Pallas
    # kernel (global_pack) only serves flat packs — measured marginal
    # ~0.1 us/row vs the XLA scan's ~0.3-1 (compare passes don't fuse
    # inside the while_loop), so this may dethrone the r3 padded-XLA
    # winner
    ("flat_global", {"MYGRAM_TEXT_LAYOUT": "flat"}),
    ("r3_control", {"MYGRAM_DISABLE_PALLAS_VERIFY": "1",
                    "MYGRAM_DISABLE_GLOBAL_VERIFY": "1",
                    "MYGRAM_DISABLE_U16_WIRE": "1"}),
    ("fixed_global", {"MYGRAM_GLOBAL_FIXED": "1"}),
]


def load_state() -> dict:
    if os.path.exists(STATE_PATH):
        with open(STATE_PATH) as fh:
            return json.load(fh)
    return {"steps": {}}


def save_state(state: dict) -> None:
    tmp = STATE_PATH + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh, indent=1)
    os.replace(tmp, STATE_PATH)


def probe_devices(timeout_s: float) -> str | None:
    """Same bounded-probe shape as bench.py: a dead relay blocks the
    first jax.devices() forever, so probe in a daemon thread."""
    import threading
    result: dict = {}

    def probe() -> None:
        try:
            import jax
            result["ok"] = [str(d) for d in jax.devices()]
        except Exception as exc:
            result["error"] = f"{type(exc).__name__}: {exc}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return f"device backend init timed out after {timeout_s:.0f}s"
    return result.get("error")


def run_step(name: str, cmd: list[str], env_extra: dict,
             budget_s: float) -> dict:
    """Run one TPU subprocess with a wall budget. On timeout: SIGTERM the
    exact child PID (allowed — not pattern-matching), give it 60 s, then
    report failure. The caller aborts the runbook on any failure so a
    possibly-wedged device never gets a second process stacked on it."""
    os.makedirs(LOG_DIR, exist_ok=True)
    log_path = os.path.join(LOG_DIR, f"{name}.log")
    env = dict(os.environ)
    env.update(env_extra)
    t0 = time.time()
    with open(log_path, "w") as log:
        log.write(f"# cmd: {' '.join(cmd)}\n# env_extra: {env_extra}\n")
        log.flush()
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                cwd=REPO, env=env)
        try:
            rc = proc.wait(timeout=budget_s)
        except subprocess.TimeoutExpired:
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                pass  # leave it; operator decides — do NOT SIGKILL a
                # process that may be mid-device-transfer (relay safety)
            return {"status": "timeout", "budget_s": budget_s,
                    "log": log_path, "wall_s": round(time.time() - t0, 1)}
    res: dict = {"status": "ok" if rc == 0 else f"exit {rc}",
                 "log": log_path, "wall_s": round(time.time() - t0, 1)}
    # scale_bench / bench print ONE JSON line on stdout (now in the log)
    with open(log_path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    res["result"] = json.loads(line)
                except ValueError:
                    pass
    return res


def ab_out(name: str) -> str:
    return os.path.join(REPO, "e2e", f"ab_1m_{name}.json")


def pick_ab_winner(state: dict) -> tuple[str, dict] | None:
    best = None
    for name, env in AB_VARIANTS:
        rec = state["steps"].get(f"ab_{name}", {}).get("result")
        if not rec:
            continue
        det = rec.get("detail", {})
        ver = det.get("ja_cjk_verified") or {}
        if det.get("verify_parity_failures", 1) != 0:
            continue
        qps = ver.get("qps", 0.0)
        if best is None or qps > best[2]:
            best = (name, env, qps)
    if best is None:
        return None
    return best[0], dict(best[1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=str, default="",
                    help="comma list: probe,ab,bench1m,bench4m,bench10m,"
                         "headline,gates,gates_1m (default: all)")
    ap.add_argument("--probe-timeout", type=float, default=600.0)
    ap.add_argument("--budget-1m", type=float, default=45 * 60)
    ap.add_argument("--budget-4m", type=float, default=100 * 60)
    ap.add_argument("--budget-10m", type=float, default=180 * 60)
    args = ap.parse_args()
    wanted = set(args.steps.split(",")) if args.steps else {
        "probe", "ab", "bench1m", "bench4m", "bench10m", "headline",
        "gates", "gates_1m"}

    state = load_state()
    py = sys.executable

    def record(key: str, rec: dict) -> bool:
        state["steps"][key] = rec
        state["updated"] = time.strftime("%Y-%m-%d %H:%M:%S")
        save_state(state)
        print(f"[{key}] {rec['status']} ({rec.get('wall_s', '?')}s)",
              flush=True)
        if rec["status"] != "ok":
            print(f"ABORT: step {key} did not complete cleanly; see "
                  f"{rec.get('log', '(no log)')}", flush=True)
            return False
        return True

    if "probe" in wanted:
        t0 = time.time()
        err = probe_devices(args.probe_timeout)
        rec = {"status": "ok" if err is None else "tunnel_down",
               "error": err, "wall_s": round(time.time() - t0, 1)}
        if not record("probe", rec):
            return 2

    if "ab" in wanted:
        os.makedirs(CACHE_DIR, exist_ok=True)
        for name, env in AB_VARIANTS:
            cmd = [py, "-u", "e2e/scale_bench.py", "--docs", "1100000",
                   "--verify", "--out", ab_out(name),
                   "--build-cache", os.path.join(CACHE_DIR, "b1m_verify")]
            if not record(f"ab_{name}",
                          run_step(f"ab_{name}", cmd, env, args.budget_1m)):
                return 2

    winner = pick_ab_winner(state)
    if winner is not None:
        state["ab_winner"] = {"name": winner[0], "env": winner[1]}
        save_state(state)
        print(f"[ab] winner: {winner[0]} env={winner[1]}", flush=True)
    win_env = winner[1] if winner else {}

    if "bench1m" in wanted:
        src = ab_out(winner[0]) if winner else None
        if src and os.path.exists(src):
            with open(src) as fh, open(
                    os.path.join(REPO, "BENCH_1M.json"), "w") as out:
                out.write(fh.read())
            record("bench1m", {"status": "ok", "promoted_from": src,
                               "wall_s": 0.0})
        else:
            cmd = [py, "-u", "e2e/scale_bench.py", "--docs", "1100000",
                   "--verify", "--out", "BENCH_1M.json"]
            if not record("bench1m", run_step("bench1m", cmd, win_env,
                                              args.budget_1m)):
                return 2

    if "bench4m" in wanted:
        cmd = [py, "-u", "e2e/scale_bench.py", "--docs", "4000000",
               "--verify", "--out", "BENCH_4M.json"]
        if not record("bench4m", run_step("bench4m", cmd, win_env,
                                          args.budget_4m)):
            return 2

    if "bench10m" in wanted:
        env = dict(win_env)
        env["MYGRAM_TEXT_LAYOUT"] = "flat"  # padded busts HBM at 10M
        # the 1.1M A/B winner (xla row gather) does NOT transfer to 10M:
        # the XLA flat gather materializes (B, Kv, win) int32 windows in
        # HBM — measured 781M past the 15.75G budget on top of the
        # resident index+pack — while the pallas flat kernel streams
        # 1024-cell groups through VMEM scratch
        env.pop("MYGRAM_DISABLE_PALLAS_VERIFY", None)
        # host build checkpoint: a failed attempt re-pays seconds of
        # cache load instead of ~5 min of corpus build (r3 weak #1)
        os.makedirs(CACHE_DIR, exist_ok=True)
        cmd = [py, "-u", "e2e/scale_bench.py", "--docs", "10000000",
               "--verify", "--out", "BENCH_10M.json",
               "--build-cache", os.path.join(CACHE_DIR, "c10m")]
        if not record("bench10m", run_step("bench10m", cmd, env,
                                           args.budget_10m)):
            return 2

    if "headline" in wanted:
        if not record("headline", run_step(
                "headline", [py, "-u", "bench.py"], {}, 30 * 60)):
            return 2

    if "gates" in wanted:
        cmd = [py, "-u", "e2e/benchmark_suite.py", "--mode", "quick",
               "--json", os.path.join(REPO, "e2e",
                                      "RESULTS_r5_gates.json")]
        if not record("gates", run_step("gates", cmd, {}, 45 * 60)):
            return 2

    if "gates_1m" in wanted:
        cmd = [py, "-u", "e2e/benchmark_suite.py", "--mode", "quick",
               "--scale", "--json",
               os.path.join(REPO, "e2e", "RESULTS_r5_scale_gates.json")]
        if not record("gates_1m", run_step("gates_1m", cmd, {},
                                           90 * 60)):
            return 2

    print("runbook complete; state file written (see MYGRAM_RUNBOOK_STATE)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
