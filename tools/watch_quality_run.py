"""Self-healing supervisor for tools/run_quality_proxy.py.

The TPU relay in this environment can wedge mid-run: the stage process
sleeps forever on an RPC (observed twice — CLAUDE.md "the relay can
WEDGE"; round-3 run 2 lost 75 min to one at stage-12 epoch 42).  A
wedged process burns no CPU and writes no output; fresh processes work
fine.  Recovery is mechanical — kill the stage process, relaunch the
driver, per-cell crash-resume (`cell_done` / `evalnet_done`) skips
completed work — so this supervisor automates it and survives the
operator's session dying (it runs detached via nohup).

Wedge detection combines two signals so legit quiet phases (PNG dump
bursts, multi-minute remote compiles, host-side cv2 augmentation) are
not false positives:
  * the run log's mtime (training prints every epoch), AND
  * total CPU time of the driver's process tree (a working quiet phase
    encodes PNGs / feeds batches; a wedged one is frozen).
When BOTH are idle past IM_WATCH_PROBE_MIN (default 18 — ~3x the
longest legit quiet gap, the ~6 min remote compile) a RELAY PROBE (a
fresh subprocess running one tiny jitted op, CLAUDE.md's recovery
recipe) decides the case:
  * probe answers -> the relay is healthy but the driver is frozen on a
    dead RPC: kill the tree (by explicit pid walk — never by name
    pattern) and relaunch with the SAME stage list; completed
    stages/cells resume as no-ops.
  * probe hangs too (wedge #3's mode: the relay itself is down for ALL
    clients) -> do NOT restart — a relaunched driver would hang at its
    first op and burn a restart-budget slot; keep probing every 5 min
    and restart the moment the relay answers.  Wedge #3 self-recovered
    after ~14 min (stage resumed mid-epoch, no kill needed), and its
    probes kept timing out even AFTER training resumed (client startup
    queues behind active training) — so probe failure is never treated
    as proof of relay death, only as "unsafe to restart now".
IM_WATCH_IDLE_MIN (default 40) remains the probe-less fallback: past it
the tree is killed even if the probe subprocess itself misbehaves.

Usage:
    nohup python tools/watch_quality_run.py [stage ...] &
stages default to the round-3 remainder: 12 10 14 13 08 06 07 05 collect.
Exits 0 when the driver completes cleanly; gives up after
IM_WATCH_MAX_RESTARTS (default 12) abnormal exits.

The supervised driver defaults to tools/run_quality_proxy.py; set
IM_WATCH_DRIVER (repo-relative or absolute path) to supervise another
stage driver with the same resume contract (e.g.
tools/run_quality_multiclass.py) and IM_WATCH_LOG to give it its own
log file.
"""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, os.environ.get(
    "IM_WATCH_DRIVER", os.path.join("tools", "run_quality_proxy.py")))
LOG = os.path.join(REPO, os.environ.get("IM_WATCH_LOG",
                                        ".quality_r3_run.log"))
IDLE_LIMIT = float(os.environ.get("IM_WATCH_IDLE_MIN", "40")) * 60
PROBE_MIN = float(os.environ.get("IM_WATCH_PROBE_MIN", "18")) * 60
PROBE_EVERY_S = 300
PROBE_TIMEOUT_S = 150
MAX_RESTARTS = int(os.environ.get("IM_WATCH_MAX_RESTARTS", "12"))
POLL_S = 60
# CPU-time growth below this over an idle window still counts as frozen
# (the observed wedge grew ~1 s / 19 min on scheduler noise).
CPU_EPS_S = 5.0


def child_pids(pid: int) -> list:
    out = subprocess.run(["ps", "-o", "pid=", "--ppid", str(pid)],
                         capture_output=True, text=True).stdout
    return [int(x) for x in out.split()]


def tree_pids(pid: int) -> list:
    pids, stack = [], [pid]
    while stack:
        p = stack.pop()
        pids.append(p)
        stack.extend(child_pids(p))
    return pids


def tree_cpu_seconds(pid: int) -> float:
    total = 0.0
    tick = os.sysconf("SC_CLK_TCK")
    for p in tree_pids(pid):
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / tick  # utime+stime
        except (FileNotFoundError, ProcessLookupError, IndexError):
            pass
    return total


def kill_tree(pid: int) -> None:
    pids = tree_pids(pid)
    for p in reversed(pids):  # children first
        try:
            os.kill(p, signal.SIGTERM)
        except ProcessLookupError:
            pass
    time.sleep(10)
    for p in reversed(pids):
        try:
            os.kill(p, signal.SIGKILL)
        except ProcessLookupError:
            pass


def relay_ok() -> bool:
    """One tiny jitted op in a FRESH process — the CLAUDE.md wedge probe.

    A healthy relay answers in seconds (plus ~15 s client startup); a
    wedged one leaves the probe sleeping until the timeout kills it.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jax.jit(lambda a: (a @ a).sum())"
             "(jnp.ones((128, 128)))))"],
            timeout=PROBE_TIMEOUT_S, capture_output=True, cwd=REPO)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def launch(stages: list) -> subprocess.Popen:
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    env.setdefault("IM_GENS", "0,1,2")
    logf = open(LOG, "ab", buffering=0)
    return subprocess.Popen(
        [sys.executable, "-u", DRIVER, *stages],
        stdout=logf, stderr=subprocess.STDOUT, cwd=REPO, env=env)


def note(msg: str) -> None:
    line = f"[watchdog {time.strftime('%H:%M:%S')}] {msg}\n"
    sys.stderr.write(line)
    with open(LOG, "a") as f:
        f.write(line)


def main() -> int:
    stages = sys.argv[1:] or ["12", "10", "14", "13", "08", "06", "07",
                              "05", "collect"]
    restarts = 0
    proc = launch(stages)
    note(f"supervising driver pid {proc.pid} stages {' '.join(stages)}")
    last_active = time.time()
    last_cpu = 0.0
    last_probe = 0.0
    last_log_m = os.path.getmtime(LOG) if os.path.exists(LOG) else 0.0
    while True:
        time.sleep(POLL_S)
        rc = proc.poll()
        if rc is not None:
            if rc == 0:
                note("driver completed cleanly")
                return 0
            restarts += 1
            if restarts > MAX_RESTARTS:
                note(f"driver exit {rc}; restart budget exhausted")
                return 1
            while not relay_ok():
                note(f"driver exit {rc}; relay probe hangs — waiting for "
                     "the relay before relaunching")
                time.sleep(PROBE_EVERY_S)
            note(f"driver exit {rc}; relaunch {restarts}/{MAX_RESTARTS}")
            proc = launch(stages)
            last_active, last_cpu = time.time(), 0.0
            continue
        cpu = tree_cpu_seconds(proc.pid)
        log_m = os.path.getmtime(LOG) if os.path.exists(LOG) else 0.0
        if log_m != last_log_m or cpu - last_cpu > CPU_EPS_S:
            last_active = time.time()
            last_log_m = log_m
            last_cpu = max(last_cpu, cpu)
            continue
        idle = time.time() - last_active
        if idle <= PROBE_MIN:
            continue
        if idle <= IDLE_LIMIT:
            # Probe-gated fast path: restart only once the relay answers.
            if time.time() - last_probe < PROBE_EVERY_S:
                continue
            last_probe = time.time()
            if not relay_ok():
                note(f"idle {idle / 60:.0f} min and relay probe hangs too "
                     "— relay itself is down, holding off restart")
                # note() wrote to LOG: refresh last_log_m so our own write
                # doesn't reset the idle clock (else the next probe slips
                # from PROBE_EVERY_S to a full PROBE_MIN away).
                last_log_m = (os.path.getmtime(LOG)
                              if os.path.exists(LOG) else 0.0)
                continue
            reason = (f"wedge: log+CPU idle {idle / 60:.0f} min, relay "
                      "probe answers — driver frozen on a dead RPC")
        else:
            reason = f"wedge: log+CPU idle {idle / 60:.0f} min (hard limit)"
        restarts += 1
        if restarts > MAX_RESTARTS:
            note("wedge detected but restart budget exhausted")
            return 1
        note(f"{reason} — killing tree, "
             f"relaunch {restarts}/{MAX_RESTARTS}")
        kill_tree(proc.pid)
        proc.wait()
        proc = launch(stages)
        last_active, last_cpu = time.time(), 0.0


if __name__ == "__main__":
    sys.exit(main())
