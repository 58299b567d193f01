"""Round-4d unattended chain — post-wipe-#5 replan of round4c_conductor.

A FIFTH VM wipe cut run 6 at consistency (05) epoch ~73/100; the ME (06)
and IE (07) rows had landed and are committed (QUALITY_r4.md), so run 7
reseeds only what the missing rows need:

  1. binary table completion: build + 03 reseed (LDT has reproduced
     candidate-for-candidate on four provisionings), then 05 CS
     (single-shot, the cheapest missing row) and 08 NS (generational,
     per-cell resume) — the LAST TWO of the 9 reference strategies.
  2. layout/perf sweep of the parked knobs (VERDICT r3 next-#4) —
     cut by wipes three times now; trimmed to the 6 highest-value
     variants so it fits a session tail.
  3. BN-fold bound measurement (VERDICT r3 weak-#6).
  4. fresh bench.py line with current defaults.
  5. multiclass (mIoU-arm) quality run, gens 0-1 (VERDICT r3 next-#2) —
     per-cell resumable; whatever the clock cuts resumes next round.

Logs: .r4d_<step>.log.  Launch (detached):
    setsid nohup python -u tools/round4d_conductor.py \
        > .r4d_conductor.log 2>&1 & echo $! > /tmp/conductor.pid
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP_VARIANTS = [
    "dot1x1",                 # current default, re-anchor the baseline
    "packedhead",
    "dot1x1+packedhead",
    "dot1x1+denseinput",
    "dot1x1+packedhead+denseinput",
    "dot1x1+remat",
]


def note(msg):
    print(f"[conductor {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run(step, cmd, env=None, timeout=None):
    log = os.path.join(REPO, f".r4d_{step}.log")
    note(f"step {step}: {' '.join(cmd)} -> {log}")
    t0 = time.time()
    with open(log, "ab", buffering=0) as f:
        f.write(f"== {time.strftime('%F %T')} {' '.join(cmd)}\n".encode())
        try:
            r = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                               cwd=REPO, env=env, timeout=timeout)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
    note(f"step {step}: exit {rc} in {(time.time() - t0) / 60:.1f} min")
    return rc


def watched(step, driver, stages, extra_env):
    env = dict(os.environ, PYTHONUNBUFFERED="1",
               IM_WATCH_DRIVER=driver,
               IM_WATCH_LOG=f".r4d_{step}_stages.log",
               **extra_env)
    return run(step, [sys.executable, "tools/watch_quality_run.py",
                      *stages], env=env)


def main():
    # 1. binary 9-strategy completion: the two missing rows (CS, NS)
    watched("bin", os.path.join("tools", "run_quality_proxy.py"),
            ["build", "03", "05", "08", "collect"],
            {"IM_GENS": "0,1,2"})

    # 2. layout sweep on the real chip (one remote compile per variant)
    run("sweep", [sys.executable, "tools/bench_layout_variants.py",
                  *SWEEP_VARIANTS], timeout=int(2.5 * 3600))

    # 3. BN-fold bound: is BN ~free at generation time? (ROADMAP item 3)
    run("bnfold", [sys.executable, "tools/bench_bnfold.py"],
        timeout=3600)

    # 4. headline bench line with current defaults
    run("bench", [sys.executable, "bench.py"], timeout=2 * 3600)

    # 5. multiclass quality run (SUIM-like proxy, gens 0-1)
    watched("mc", os.path.join("tools", "run_quality_multiclass.py"),
            ["build", "04", "05", "10", "12", "13", "11", "collect"],
            {"IM_GENS": "0,1"})

    note("chain complete")


if __name__ == "__main__":
    main()
