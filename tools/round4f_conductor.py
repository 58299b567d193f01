"""Round-4f follow-on: Cityscapes-arm quality run after the r4e chain.

Waits for tools/round4e_conductor.py to finish (its "chain complete"
log line, or its process dying — either way the chip is free), then
runs the Cityscapes-arm quality run (tools/run_quality_cityscapes.py:
structured street-scene proxy at 208x416, LDT/ALDT/IM/IM+/IM++/
segnet-miou order, gens 0-1, per-cell resume) under the self-healing
watchdog.  This gives the LAST of the reference's four result panels
(ISIC binary + SUIM multiclass + HeLa cell-culture + Cityscapes street
scenes) its first at-scale quality numbers; whatever the clock cuts
resumes per cell next round.

Logs: .r4f_<step>.log.  Launch (detached):
    setsid nohup python -u tools/round4f_conductor.py \
        > .r4f_conductor.log 2>&1 & echo $! > /tmp/conductor4f.pid
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R4E_LOG = os.path.join(REPO, ".r4e_conductor.log")
POLL_S = 120


def note(msg):
    print(f"[conductor4f {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def r4e_pid():
    out = subprocess.run(["ps", "-eo", "pid,args"], capture_output=True,
                         text=True).stdout
    for line in out.splitlines():
        if "round4e_conductor.py" in line and "round4f" not in line:
            return int(line.split()[0])
    return None


def r4e_done():
    try:
        with open(R4E_LOG) as f:
            # end-of-line match only: the startup echo "...(chain
            # complete) — starting..." must NOT trip this (ADVICE r4 high)
            if any(line.rstrip().endswith("chain complete")
                   for line in f):
                return "chain complete"
    except FileNotFoundError:
        pass
    if r4e_pid() is None:
        return "r4e conductor gone"
    return None


def main():
    while True:
        why = r4e_done()
        if why:
            note(f"r4e finished ({why}) — starting round-4f steps")
            break
        time.sleep(POLL_S)

    env = dict(os.environ, PYTHONUNBUFFERED="1",
               IM_WATCH_DRIVER=os.path.join("tools",
                                            "run_quality_cityscapes.py"),
               IM_WATCH_LOG=".r4f_cs_stages.log",
               IM_GENS="0,1")
    log = os.path.join(REPO, ".r4f_cs.log")
    cmd = [sys.executable, "tools/watch_quality_run.py",
           "build", "03", "04", "09", "11", "12", "10", "collect"]
    note(f"step cs: {' '.join(cmd)} -> {log}")
    t0 = time.time()
    with open(log, "ab", buffering=0) as f:
        f.write(f"== {time.strftime('%F %T')} {' '.join(cmd)}\n".encode())
        rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                            cwd=REPO, env=env).returncode
    note(f"step cs: exit {rc} in {(time.time() - t0) / 60:.1f} min")
    note("chain complete")


if __name__ == "__main__":
    main()
