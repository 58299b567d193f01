"""Repair the multiclass ref_exec golden fixture (round 4).

Round 3's ``make_reference_goldens.py`` run produced
``tests/golden/ref_exec/multiclass/out/{images,masks,im}``, but only
``out/im`` was committed; the VM wipe deleted the generated-but-untracked
``out/images`` and ``out/masks``, so
``test_multiclass_matches_reference_executed`` fails on the fresh
checkout with FileNotFoundError.

The fixture inputs (``multiclass/images``) and the exact trained Keras
checkpoints (``model_{0,1}.h5``) ARE committed, and the reference writer
(``/root/reference/functions.py`` ``create_pseudo_labels_im_multiclass``)
is deterministic given both — so this re-executes it into a temp dir,
asserts the regenerated ``out/im`` tree is byte-identical to the
committed one and the mean IM size matches ``meta.json`` (proving the
regeneration reproduces the round-3 run), then copies the missing
``out/images`` and ``out/masks`` into the fixture.
"""

import filecmp
import json
import os
import shutil
import sys
import tempfile
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
GOLD = os.path.join(REPO, "tests", "golden", "ref_exec")
D = os.path.join(GOLD, "multiclass")
H = W = 32


def main():
    meta = json.load(open(os.path.join(GOLD, "meta.json")))
    tfa = types.ModuleType("tensorflow_addons")
    tfa.optimizers = types.SimpleNamespace(AdamW=None)
    sys.modules.setdefault("tensorflow_addons", tfa)
    work = tempfile.mkdtemp()
    shutil.copy(os.path.join(REPO, "config.ini"),
                os.path.join(work, "config.ini"))
    os.chdir(work)
    sys.path.insert(0, REF)
    import functions as rf
    import unet as ru

    # rebuild with the genuine get_unet and load weights only (full-model
    # deserialization trips keras' Lambda safe-mode; weights are enough)
    models = []
    for i in range(2):
        km = ru.get_unet(H, W, 3, 4, 0.25, "relu", "softmax")
        km.load_weights(os.path.join(D, f"model_{i}.h5"))
        models.append(km)
    out = os.path.join(work, "out")
    mean = rf.create_pseudo_labels_im_multiclass(
        models, H, W, 3, os.path.join(D, "images"), out,
        rgb=True, erode_kernel=3, dilate_kernel=3, block_input=True,
        block_output=True, filter_unequal_class_pred=True)
    assert float(mean) == float(meta["multiclass_mean_im_size"]), \
        (mean, meta["multiclass_mean_im_size"])

    ref_im = os.path.join(D, "out", "im")
    new_im = os.path.join(out, "im")
    names = sorted(os.listdir(ref_im))
    assert names == sorted(os.listdir(new_im)), "im name sets differ"
    for n in names:
        assert filecmp.cmp(os.path.join(ref_im, n),
                           os.path.join(new_im, n), shallow=False), \
            f"im/{n} differs from the committed golden"
    print(f"regeneration reproduces committed out/im ({len(names)} files, "
          f"mean_im_size {mean})")

    for sub in ("images", "masks"):
        dst = os.path.join(D, "out", sub)
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(os.path.join(out, sub), dst)
        print(f"restored out/{sub}: {len(os.listdir(dst))} files")


if __name__ == "__main__":
    main()
