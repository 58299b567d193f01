"""Round-4g follow-on: Noisy-Student gens 3-4 extension after the r4f chain.

The reference's NS headline lives at generations 3-4: "Noisy Student ...
manages to match or surpass IM after four Generations in ISIC 2018"
(/root/reference/README.md:36; grid ISIC_2018/08:50-52 runs gens 0-4).
Run 7 measures NS gens 0-2; its artifact tree supports `cell_done`
per-cell resume, so re-running stage 08 with IM_GENS=0..4 trains ONLY
gens 3-4 (the growing-alpha students, reference 08:42-43 noise/alpha
schedules).  This waits for tools/round4f_conductor.py to finish, then
extends NS and re-collects — closing the one headline ordering check
(NS vs IM at gen 4) the gens-0-2 table cannot answer.

Logs: .r4g_<step>.log.  Launch (detached):
    setsid nohup python -u tools/round4g_conductor.py \
        > .r4g_conductor.log 2>&1 & echo $! > /tmp/conductor4g.pid
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R4F_LOG = os.path.join(REPO, ".r4f_conductor.log")
POLL_S = 120


def note(msg):
    print(f"[conductor4g {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def r4f_pid():
    out = subprocess.run(["ps", "-eo", "pid,args"], capture_output=True,
                         text=True).stdout
    for line in out.splitlines():
        if "round4f_conductor.py" in line and "round4g" not in line:
            return int(line.split()[0])
    return None


def r4f_done():
    try:
        with open(R4F_LOG) as f:
            # end-of-line match only: the startup echo "...(chain
            # complete) — starting..." must NOT trip this (ADVICE r4 high)
            if any(line.rstrip().endswith("chain complete")
                   for line in f):
                return "chain complete"
    except FileNotFoundError:
        pass
    if r4f_pid() is None:
        return "r4f conductor gone"
    return None


def main():
    while True:
        why = r4f_done()
        if why:
            note(f"r4f finished ({why}) — starting round-4g steps")
            break
        time.sleep(POLL_S)

    env = dict(os.environ, PYTHONUNBUFFERED="1",
               IM_WATCH_DRIVER=os.path.join("tools", "run_quality_proxy.py"),
               IM_WATCH_LOG=".r4g_ns_stages.log",
               IM_GENS="0,1,2,3,4")
    log = os.path.join(REPO, ".r4g_ns.log")
    cmd = [sys.executable, "tools/watch_quality_run.py",
           "build", "03", "08", "collect"]
    note(f"step ns-ext: {' '.join(cmd)} -> {log}")
    t0 = time.time()
    with open(log, "ab", buffering=0) as f:
        f.write(f"== {time.strftime('%F %T')} {' '.join(cmd)}\n".encode())
        rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                            cwd=REPO, env=env).returncode
    note(f"step ns-ext: exit {rc} in {(time.time() - t0) / 60:.1f} min")
    note("chain complete")


if __name__ == "__main__":
    main()
