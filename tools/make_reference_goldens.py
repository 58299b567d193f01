"""Produce reference-EXECUTED golden IM artifacts (VERDICT r2 item 4).

Runs the ORIGINAL reference code from /root/reference — ``functions.py``'s
IM drivers (create_pseudo_labels_im_ISIC_2018 / _multiclass / _hela,
functions.py:2832-3070) with real tf.keras models built by the genuine
``unet.py:get_unet`` — on tiny synthetic inputs, and checks the produced
PNG trees + the exact Keras ``.h5`` checkpoints + the inputs into
``tests/golden/ref_exec/``.  tests/test_golden_reference_executed.py then
asserts our fused TPU drivers reproduce the trees pixel-for-pixel through
the keras-import bridge.

``tensorflow_addons`` (unavailable here) is stubbed in sys.modules — the
IM code path never touches it (only the training optimizers do).

Threshold-stability: cross-framework conv math differs at ~1e-6, so each
model is briefly trained until every probability is at least MARGIN away
from the decision boundary (0.5 for sigmoid; top1-top2 gap for softmax).
The margin is re-asserted on OUR side in the test, making the
pixel-for-pixel comparison deterministic rather than luck.
"""

import json
import os
import shutil
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(REPO, "tests", "golden", "ref_exec")
H = W = 32
ALPHA = 0.25
# Cross-framework forward difference measured at atol 2e-5 on the full
# 32^2 U-Net (tests/test_keras_real_h5.py); 1e-4 decision margin makes
# the thresholded masks provably identical between TF and JAX.
MARGIN = 1e-4
N_IMAGES = 6
N_MODELS = 2


def _setup_reference():
    # tfa stub: functions.py imports it at module level but the IM path
    # never calls into it
    tfa = types.ModuleType("tensorflow_addons")
    tfa.optimizers = types.SimpleNamespace(AdamW=None)
    sys.modules.setdefault("tensorflow_addons", tfa)
    # functions.py reads config.ini from CWD
    work = tempfile.mkdtemp()
    shutil.copy(os.path.join(REPO, "config.ini"),
                os.path.join(work, "config.ini"))
    os.chdir(work)
    sys.path.insert(0, REF)
    import functions as rf          # noqa: F401  (the reference module)
    import unet as ru
    return rf, ru


def _binary_margin(models, images):
    m = 1.0
    for km in models:
        p = km.predict(images.astype(np.float32), verbose=0)
        m = min(m, float(np.abs(p - 0.5).min()))
    return m


def _softmax_margin(models, images):
    m = 1.0
    for km in models:
        p = km.predict(images.astype(np.float32), verbose=0)
        s = np.sort(p, axis=-1)
        m = min(m, float((s[..., -1] - s[..., -2]).min()))
    return m


def _train_until_margin(models, images, targets, margin_fn, loss,
                        max_rounds=12):
    """Cross-entropy losses saturate the logits on this separable toy
    data, pushing every pixel's probability away from the decision
    boundary — unlike MSE, whose gradients vanish near the target and
    stall the margin around 1e-5."""
    for km in models:
        km.compile(optimizer="adam", loss=loss)
    best = 0.0
    for rnd in range(max_rounds):
        m = margin_fn(models, images)
        print(f"  margin round {rnd}: {m:.2e}", flush=True)
        best = max(best, m)
        if m > MARGIN:
            return m
        for km in models:
            km.fit(images.astype(np.float32), targets, epochs=10,
                   batch_size=4, verbose=0)
    raise RuntimeError(f"margin never exceeded {MARGIN} (best {best:.2e})")


def _blob_images(rng, n, channels):
    """Linearly separable blob-vs-background images: background intensity
    0-120, blob 200-255 — so a few training epochs saturate the logits
    and every pixel clears the decision-margin requirement."""
    import cv2
    imgs, masks = [], []
    for _ in range(n):
        img = rng.randint(0, 120, (H, W, channels)).astype(np.uint8)
        mask = np.zeros((H, W), np.uint8)
        cv2.circle(mask, (rng.randint(8, 24), rng.randint(8, 24)),
                   rng.randint(4, 10), 255, -1)
        col = tuple(int(v) for v in rng.randint(200, 255, channels))
        img[mask > 0] = col
        imgs.append(img)
        masks.append(mask)
    return np.stack(imgs), np.stack(masks)


def _write_inputs(dirpath, imgs, grayscale=False):
    import cv2
    os.makedirs(dirpath, exist_ok=True)
    names = []
    for i, img in enumerate(imgs):
        n = f"img_{i:03d}.png"
        cv2.imwrite(os.path.join(dirpath, n),
                    img[..., 0] if grayscale else img)
        names.append(n)
    return names


def main():
    rf, ru = _setup_reference()
    shutil.rmtree(OUT, ignore_errors=True)
    meta = {"h": H, "w": W, "alpha": ALPHA, "margin": MARGIN}

    rng = np.random.RandomState(7)

    # ----------------------------------------------------------- binary
    print("[binary]")
    d = os.path.join(OUT, "binary")
    imgs, masks = _blob_images(rng, N_IMAGES, 3)
    names = _write_inputs(os.path.join(d, "images"), imgs)
    models = [ru.get_unet(H, W, 3, 1, ALPHA, "relu", "sigmoid")
              for _ in range(N_MODELS)]
    # RGB input order parity: the driver feeds cv2.cvtColor(BGR2RGB)
    rgb = imgs[..., ::-1]
    meta["binary_margin"] = _train_until_margin(
        models, rgb, (masks[..., None] / 255.0).astype(np.float32),
        _binary_margin, "binary_crossentropy")
    for i, km in enumerate(models):
        km.save(os.path.join(d, f"model_{i}.h5"))
    meta["binary_mean_im_size"] = rf.create_pseudo_labels_im_ISIC_2018(
        models, H, W, 3, os.path.join(d, "images"), os.path.join(d, "out"),
        rgb=True, erode_kernel=3, dilate_kernel=3, block_input=True,
        block_output=True, filter_bad_predictions=True)

    # ------------------------------------------------------- multiclass
    print("[multiclass]")
    d = os.path.join(OUT, "multiclass")
    n_classes = 4
    imgs, masks = _blob_images(rng, N_IMAGES, 3)
    cls = (masks > 0).astype(np.uint8) * (1 + (np.arange(N_IMAGES)[:, None,
                                               None] % (n_classes - 1)))
    names = _write_inputs(os.path.join(d, "images"), imgs)
    models = [ru.get_unet(H, W, 3, n_classes, ALPHA, "relu", "softmax")
              for _ in range(N_MODELS)]
    onehot = np.eye(n_classes, dtype=np.float32)[cls]
    rgb = imgs[..., ::-1]
    meta["multiclass_margin"] = _train_until_margin(
        models, rgb, onehot, _softmax_margin, "categorical_crossentropy")
    for i, km in enumerate(models):
        km.save(os.path.join(d, f"model_{i}.h5"))
    meta["multiclass_mean_im_size"] = rf.create_pseudo_labels_im_multiclass(
        models, H, W, 3, os.path.join(d, "images"), os.path.join(d, "out"),
        rgb=True, erode_kernel=3, dilate_kernel=3, block_input=True,
        block_output=True, filter_unequal_class_pred=True)

    # ------------------------------------------------------------- hela
    print("[hela]")
    d = os.path.join(OUT, "hela")
    imgs, masks = _blob_images(rng, N_IMAGES, 1)
    names = _write_inputs(os.path.join(d, "images"), imgs, grayscale=True)
    models = [ru.get_unet(H, W, 1, 3, ALPHA, "relu", "sigmoid")
              for _ in range(N_MODELS)]
    chan = np.stack([(masks > 0)] * 3, axis=-1).astype(np.float32)
    meta["hela_margin"] = _train_until_margin(
        models, imgs, chan, _binary_margin, "binary_crossentropy")
    for i, km in enumerate(models):
        km.save(os.path.join(d, f"model_{i}.h5"))
    meta["hela_mean_im_size"] = rf.create_pseudo_labels_im_hela(
        models, H, W, 1, os.path.join(d, "images"), os.path.join(d, "out"),
        erode_kernel=3, dilate_kernel=3, block_input=True,
        block_output=True)

    meta = {k: (float(v) if isinstance(v, (int, float, np.floating))
                else v) for k, v in meta.items()}
    with open(os.path.join(OUT, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("golden meta:", meta)
    print("names:", names)


if __name__ == "__main__":
    main()
