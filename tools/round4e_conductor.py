"""Round-4e follow-on: HeLa-arm quality run after the r4d chain.

Waits for tools/round4d_conductor.py to finish (its "chain complete"
log line, or its process dying — either way the chip is free), then
runs the HeLa-arm quality run (tools/run_quality_hela.py: structured
brightfield proxy, LDT/ALDT/IM/IM+/IM++/segnet-miou order, gens 0-1,
per-cell resume) under the self-healing watchdog.  This gives the
third of the reference's four result panels (ISIC binary + SUIM
multiclass + HeLa cell-culture) its first at-scale quality numbers.

Logs: .r4e_<step>.log.  Launch (detached):
    setsid nohup python -u tools/round4e_conductor.py \
        > .r4e_conductor.log 2>&1 & echo $! > /tmp/conductor4e.pid
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R4D_LOG = os.path.join(REPO, ".r4d_conductor.log")
POLL_S = 120


def note(msg):
    print(f"[conductor4e {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def r4d_pid():
    out = subprocess.run(["ps", "-eo", "pid,args"], capture_output=True,
                         text=True).stdout
    for line in out.splitlines():
        if "round4d_conductor.py" in line and "round4e" not in line:
            return int(line.split()[0])
    return None


def r4d_done():
    try:
        with open(R4D_LOG) as f:
            # end-of-line match only: the startup echo "...(chain
            # complete) — starting..." must NOT trip this (ADVICE r4 high)
            if any(line.rstrip().endswith("chain complete")
                   for line in f):
                return "chain complete"
    except FileNotFoundError:
        pass
    if r4d_pid() is None:
        return "r4d conductor gone"
    return None


def main():
    while True:
        why = r4d_done()
        if why:
            note(f"r4d finished ({why}) — starting round-4e steps")
            break
        time.sleep(POLL_S)

    # 0. grouped-conv re-test (ROADMAP #2: round-1 measured XLA's grouped
    # lowering 2.4x slower than unroll — re-test on current XLA), trimmed
    # out of the r4d sweep; two variants, ~10 min.
    sweep_log = os.path.join(REPO, ".r4e_sweep.log")
    cmd = [sys.executable, "tools/bench_layout_variants.py",
           "groupconv", "groupconv+remat"]
    note(f"step sweep: {' '.join(cmd)} -> {sweep_log}")
    with open(sweep_log, "ab", buffering=0) as f:
        f.write(f"== {time.strftime('%F %T')} {' '.join(cmd)}\n".encode())
        try:
            rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                                cwd=REPO, timeout=3600).returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
    note(f"step sweep: exit {rc}")

    env = dict(os.environ, PYTHONUNBUFFERED="1",
               IM_WATCH_DRIVER=os.path.join("tools", "run_quality_hela.py"),
               IM_WATCH_LOG=".r4e_hela_stages.log",
               IM_GENS="0,1")
    log = os.path.join(REPO, ".r4e_hela.log")
    cmd = [sys.executable, "tools/watch_quality_run.py",
           "build", "03", "04", "09", "11", "12", "10", "collect"]
    note(f"step hela: {' '.join(cmd)} -> {log}")
    t0 = time.time()
    with open(log, "ab", buffering=0) as f:
        f.write(f"== {time.strftime('%F %T')} {' '.join(cmd)}\n".encode())
        rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                            cwd=REPO, env=env).returncode
    note(f"step hela: exit {rc} in {(time.time() - t0) / 60:.1f} min")
    note("chain complete")


if __name__ == "__main__":
    main()
