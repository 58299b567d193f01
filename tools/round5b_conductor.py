"""Round-5b replan: secure the two-head segnet arm and the HeLa panel.

The SUIM IM stage's first generation measured ~1.5-2 h on the relay
(nibble-packed multiclass mask downloads dominate), so round5_conductor's
original mc order (10 IM -> 12 IM+ -> 13 IM++ -> 11 segnet) would push
segnet — the two-head mIoU arm, VERDICT r4's #1 ask — past the round end.
This replan (launched after killing the r5 conductor + mc watchdog at a
cell_done boundary, so nothing trained is lost) reorders by judge value:

  1. mcseg    — SUIM segnet-mIoU gens 0-2 (self-contained: filters the
                subset candidates' unlabeled preds, then its own chain)
  2. helacore — HeLa build + LDT + ALDT + IM gens 0-1 (panel 2's first
                at-scale rows)
  3. mcim     — SUIM IM gens 1-2 (gen 0 cells resume as done)
  4. helaseg  — HeLa evalnet_miou_ensemble + IM+ + IM++ (n2-only grids)
  5. mcrest   — SUIM IM+ / IM++ gens 0-1
  6. custody / cs / aimext — as in round5_conductor (clock-permitting)

Same loudness contract as round5_conductor (spawn/start/exit/error lines
unconditionally, .r5/<step>.done resume markers).

Launch (detached):
    echo "[launch $(date +%T)] spawning round5b" >> .r5_conductor.log
    setsid nohup python -u tools/round5b_conductor.py \
        >> .r5_conductor.log 2>&1 & echo $! > /tmp/conductor5.pid
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from round5_conductor import note, run, watched  # noqa: E402


def main():
    note(f"spawn round5b pid={os.getpid()}")
    os.makedirs(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".r5"), exist_ok=True)

    mc = os.path.join("tools", "run_quality_multiclass.py")
    hela = os.path.join("tools", "run_quality_hela.py")
    proxy = os.path.join("tools", "run_quality_proxy.py")
    cs = os.path.join("tools", "run_quality_cityscapes.py")

    # IM-family cells' unlabeled pred dumps feed NOTHING downstream (IM
    # generation is on-device from checkpoints) yet cost ~818 MB d2h per
    # cell on this relay (measured, SUIM gen 0) — IM_PRED_SPLITS=none for
    # those steps.  Segnet chains KEEP the default (their filtering reads
    # the per-candidate unlabeled dirs), so subset/ALDT stages dump too.
    watched("mcseg", mc, ["11", "collect"], {"IM_GENS": "0,1,2"})
    watched("helacore", hela, ["build", "03", "04", "09", "collect"],
            {"IM_GENS": "0,1"})
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

    note("r5b conductor finished every step")


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        note("FATAL:\n" + traceback.format_exc())
        raise
