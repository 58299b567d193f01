"""Round-5c replan: retry the segnet arm after the EvalNet HBM fix.

The mcseg step of round5b crash-looped on the SUIM two-head EvalNet's
21.73 GB train program (see evalnet_pipeline/trainer.py chunking fix) and
the conductor moved on to helacore.  This conductor WAITS for the orphaned
helacore watchdog (pid via --wait-pid; pid-liveness poll, not log
grepping) and then resumes the remaining plan with mcseg — now compiling
in HBM-bounded chunks — restored to the front:

  mcseg -> mcim -> helaseg -> mcrest -> custody -> cs -> aimext

Same loudness contract and .r5/<step>.done resume markers as round5/5b.

Launch (detached):
    echo "[launch $(date +%T)] spawning round5c" >> .r5_conductor.log
    setsid nohup python -u tools/round5c_conductor.py --wait-pid <PID> \
        >> .r5_conductor.log 2>&1 & echo $! > /tmp/conductor5c.pid
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from round5_conductor import note, watched  # noqa: E402


def pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def main():
    note(f"spawn round5c pid={os.getpid()} argv={sys.argv[1:]}")
    os.makedirs(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".r5"), exist_ok=True)
    wait_pid = None
    if "--wait-pid" in sys.argv:
        wait_pid = int(sys.argv[sys.argv.index("--wait-pid") + 1])
    if wait_pid:
        note(f"waiting for pid {wait_pid} (helacore watchdog) to exit")
        while pid_alive(wait_pid):
            time.sleep(60)
        note(f"pid {wait_pid} gone — starting steps")

    mc = os.path.join("tools", "run_quality_multiclass.py")
    hela = os.path.join("tools", "run_quality_hela.py")
    proxy = os.path.join("tools", "run_quality_proxy.py")
    cs = os.path.join("tools", "run_quality_cityscapes.py")

    watched("mcseg", mc, ["11", "collect"], {"IM_GENS": "0,1,2"})
    watched("mcim", mc, ["10", "collect"],
            {"IM_GENS": "0,1,2", "IM_PRED_SPLITS": "none"})
    watched("helaseg", hela, ["10", "11", "12", "collect"],
            {"IM_GENS": "0,1"})
    watched("mcrest", mc, ["12", "13", "collect"],
            {"IM_GENS": "0,1", "IM_PRED_SPLITS": "none"})
    watched("custody", proxy, ["build", "03", "09", "collect"],
            {"IM_GENS": "0,1,2", "IM_N_VALUES": "2",
             "IM_PRED_SPLITS": "none"})
    watched("cs", cs, ["build", "03", "04", "09", "11", "12", "10",
                       "collect"], {"IM_GENS": "0,1"})
    watched("aimext", proxy, ["04", "14", "collect"],
            {"IM_GENS": "0,1,2,3,4", "IM_PRED_SPLITS": "none"})

    note("r5c conductor finished every step")


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        note("FATAL:\n" + traceback.format_exc())
        raise
