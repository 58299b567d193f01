"""Round-5 unattended chain — one sequential process, loud by design.

VERDICT r4 ordered: capture the cheap perf numbers FIRST on the idle host
(round 4's bench.py timed out because it ran concurrently with a quality
driver — CLAUDE.md's 1-core contention), then spend the rest on the
never-executed non-ISIC quality arms.  ADVICE r4 (high) killed the r4
conductor-chaining pattern (log-grep sentinels that matched their own
startup echo, firing every stage concurrently); this conductor replaces
chaining entirely: ONE process runs every step strictly in order, so
nothing can overlap on the single chip / single core.

Loudness contract (VERDICT r4 weak-#5 "silent conductor failures"):
  * a spawn header prints before any work;
  * every step prints a start line and an exit line unconditionally;
  * any exception prints a traceback line before the process dies;
  * each completed step drops .r5/<step>.done, so a relaunched conductor
    resumes where it stopped (quality steps additionally resume per cell
    via cell_done/evalnet_done inside the drivers).

Steps, in order:
  bench     — bench.py on the idle host (replaces round 4's rc=124)
  sweep     — 6-variant layout sweep (ROADMAP #1 knobs, 3x wipe-cut)
  bnfold    — BN-fold inference bound (ROADMAP #3, idle for 3 rounds)
  layoutpin — XLA AUTO-layout entry pin experiment (VERDICT next-#10)
  mc        — SUIM-like multiclass quality run, gens 0-2 (next-#1)
  hela      — HeLa-arm quality run, gens 0-1 (next-#4)
  custody   — ISIC IM n2 gens 0-2 reseed: chain-of-custody reproduction
              of the committed run-1/2 IM rows (next-#7)
  cs        — Cityscapes-arm quality run, gens 0-1 (next-#9)
  aimext    — ISIC AIM++ gens 0-4 (next-#5; only if the clock allows)

Launch (detached):
    mkdir -p .r5 && echo "[launch $(date +%T)] spawning" >> .r5_conductor.log
    setsid nohup python -u tools/round5_conductor.py \
        >> .r5_conductor.log 2>&1 & echo $! > /tmp/conductor5.pid
"""

import os
import subprocess
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DONE_DIR = os.path.join(REPO, ".r5")
SWEEP_VARIANTS = [
    "dot1x1",                 # current default, re-anchor the baseline
    "packedhead",
    "dot1x1+packedhead",
    "dot1x1+denseinput",
    "dot1x1+packedhead+denseinput",
    "dot1x1+remat",
]


def note(msg):
    print(f"[conductor5 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def done_path(step):
    return os.path.join(DONE_DIR, f"{step}.done")


def run(step, cmd, env=None, timeout=None):
    if os.path.exists(done_path(step)):
        note(f"step {step}: already done, skipping")
        return 0
    log = os.path.join(REPO, f".r5_{step}.log")
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
        except Exception as e:                      # loud, never silent
            rc = f"exception: {e!r}"
        f.write(f"== step {step} exit {rc}\n".encode())
    note(f"step {step}: exit {rc} in {(time.time() - t0) / 60:.1f} min")
    if rc == 0:
        with open(done_path(step), "w") as f:
            f.write(time.strftime("%F %T") + "\n")
    return rc


def watched(step, driver, stages, extra_env, timeout=None):
    env = dict(os.environ, PYTHONUNBUFFERED="1",
               IM_WATCH_DRIVER=driver,
               IM_WATCH_LOG=f".r5_{step}_stages.log",
               **extra_env)
    return run(step, [sys.executable, "tools/watch_quality_run.py",
                      *stages], env=env, timeout=timeout)


def main():
    note(f"spawn pid={os.getpid()} repo={REPO}")
    os.makedirs(DONE_DIR, exist_ok=True)

    # ---- perf block first: cheap, needs the idle host ------------------
    run("bench", [sys.executable, "bench.py"], timeout=45 * 60)
    run("sweep", [sys.executable, "tools/bench_layout_variants.py",
                  *SWEEP_VARIANTS], timeout=110 * 60)
    run("bnfold", [sys.executable, "tools/bench_bnfold.py"],
        timeout=40 * 60)
    run("layoutpin", [sys.executable, "tools/bench_layout_pin.py"],
        timeout=40 * 60)

    # ---- quality arms, longest-overdue first ----------------------------
    watched("mc", os.path.join("tools", "run_quality_multiclass.py"),
            ["build", "04", "05", "10", "12", "13", "11", "collect"],
            {"IM_GENS": "0,1,2"})
    watched("hela", os.path.join("tools", "run_quality_hela.py"),
            ["build", "03", "04", "09", "11", "12", "10", "collect"],
            {"IM_GENS": "0,1"})
    watched("custody", os.path.join("tools", "run_quality_proxy.py"),
            ["build", "03", "09", "collect"],
            {"IM_GENS": "0,1,2", "IM_N_VALUES": "2"})
    watched("cs", os.path.join("tools", "run_quality_cityscapes.py"),
            ["build", "03", "04", "09", "11", "12", "10", "collect"],
            {"IM_GENS": "0,1"})
    watched("aimext", os.path.join("tools", "run_quality_proxy.py"),
            ["04", "14", "collect"],
            {"IM_GENS": "0,1,2,3,4"})

    note("r5 conductor finished every step")


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        note("FATAL:\n" + traceback.format_exc())
        raise
