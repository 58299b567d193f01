"""Round-5e: post-wipe-#6 remainder, shortest-to-row first.

Provisioning #7 (wipe #6) killed round5d mid-chain.  What survived on
disk: the HeLa 'medium' base (.quality_hela2, stage 03 complete with
cell_done markers) — the multiclass (.quality_mc) and ISIC (.quality_r3)
bases are gone.  What the logs show (committed): helacore2's ALDT stage
was LEARNING (val_loss 0.0274 < the 0.03 all-zeros floor that every LDT
candidate collapsed to), i.e. a cheap resume turns HeLa panel 2 from a
pure measured negative into a measured LDT<ALDT ordering.

Chain (wall-clock-bounded — this is the final session of the round):
  1. helaaldt2 — resume HeLa 'medium' stage 04 (ALDT) + collect
  2. cs        — Cityscapes arm build + 03 LDT + 04 ALDT + 09 IM +
                 collect (panel 4's first at-scale rows; whatever lands
                 before the session-end kill stands, per-cell CSVs are
                 written as each cell finishes)

Same loudness contract and .r5/<step>.done markers as round5..5d.

Launch (detached):
    echo "[launch $(date +%T)] spawning round5e" >> .r5_conductor.log
    setsid nohup python -u tools/round5e_conductor.py \
        >> .r5_conductor.log 2>&1 & echo $! > /tmp/conductor5e.pid
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from round5_conductor import note, watched  # noqa: E402

HELA2 = {"IM_QUALITY_HELA_BASE": ".quality_hela2",
         "IM_PROXY_DIFFICULTY": "medium"}


def main():
    note(f"spawn round5e pid={os.getpid()}")
    os.makedirs(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".r5"), exist_ok=True)

    hela = os.path.join("tools", "run_quality_hela.py")
    cs = os.path.join("tools", "run_quality_cityscapes.py")

    watched("helaaldt2", hela, ["04", "collect"],
            {"IM_GENS": "0,1", **HELA2}, timeout=35 * 60)
    watched("cs", cs, ["build", "03", "04", "09", "collect"],
            {"IM_GENS": "0,1", "IM_PRED_SPLITS": "none"})

    note("r5e conductor finished every step")


if __name__ == "__main__":
    try:
        main()
    except BaseException:
        note("FATAL:\n" + traceback.format_exc())
        raise
