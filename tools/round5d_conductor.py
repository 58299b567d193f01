"""Round-5d replan: HeLa proxy recalibrated to 'medium' difficulty.

The 'hard' HeLa proxy measured UNLEARNABLE at LDT scale (all 10
candidates collapse to the all-zeros MSE floor, mIoU_ad 0.00-0.07 vs the
BASELINE panel-2 LDT ~0.512 — see data/synthetic.py level comment), so
the helacore rows carry no ordering signal and stage 09 would train IM
students from teachers that predict nothing.  This conductor (launched
after killing the helacore watchdog and round5c) re-runs the HeLa arm on
a FRESH base (.quality_hela2) at difficulty 'medium', with the rest of
the 5c plan unchanged:

  mcseg -> helacore2(medium) -> mcim -> helaseg2 -> mcrest
        -> custody -> cs -> aimext

Same loudness contract and .r5/<step>.done resume markers as round5/5b/5c.

Launch (detached):
    echo "[launch $(date +%T)] spawning round5d" >> .r5_conductor.log
    setsid nohup python -u tools/round5d_conductor.py \
        >> .r5_conductor.log 2>&1 & echo $! > /tmp/conductor5d.pid
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from round5_conductor import note, watched  # noqa: E402

HELA2 = {"IM_QUALITY_HELA_BASE": ".quality_hela2",
         "IM_PROXY_DIFFICULTY": "medium"}


def main():
    note(f"spawn round5d pid={os.getpid()}")
    os.makedirs(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".r5"), exist_ok=True)

    mc = os.path.join("tools", "run_quality_multiclass.py")
    hela = os.path.join("tools", "run_quality_hela.py")
    proxy = os.path.join("tools", "run_quality_proxy.py")
    cs = os.path.join("tools", "run_quality_cityscapes.py")

    watched("mcseg", mc, ["11", "collect"], {"IM_GENS": "0,1,2"})
    watched("helacore2", hela, ["build", "03", "04", "09", "collect"],
            {"IM_GENS": "0,1", **HELA2})
    watched("mcim", mc, ["10", "collect"],
            {"IM_GENS": "0,1,2", "IM_PRED_SPLITS": "none"})
    watched("helaseg2", hela, ["10", "11", "12", "collect"],
            {"IM_GENS": "0,1", **HELA2})
    watched("mcrest", mc, ["12", "13", "collect"],
            {"IM_GENS": "0,1", "IM_PRED_SPLITS": "none"})
    watched("custody", proxy, ["build", "03", "09", "collect"],
            {"IM_GENS": "0,1,2", "IM_N_VALUES": "2",
             "IM_PRED_SPLITS": "none"})
    watched("cs", cs, ["build", "03", "04", "09", "11", "12", "10",
                       "collect"], {"IM_GENS": "0,1"})
    watched("aimext", proxy, ["04", "14", "collect"],
            {"IM_GENS": "0,1,2,3,4", "IM_PRED_SPLITS": "none"})

    note("r5d conductor finished every step")


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        note("FATAL:\n" + traceback.format_exc())
        raise
