"""Synthetic tiny datasets in the reference's on-disk layout — used by the
test suite and by `bench.py` smoke paths when no real data is mounted."""

from __future__ import annotations

import os

import cv2
import numpy as np


def _write(path: str, arr: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, arr)


def make_binary_dataset(base_dir: str, *, n_labeled: int = 8, n_val: int = 4,
                        n_test: int = 4, n_unlabeled: int = 8,
                        h: int = 64, w: int = 64, seed: int = 0) -> None:
    """ISIC-style layout: {split}/{images,masks} with blob masks."""
    rng = np.random.RandomState(seed)

    def blob_pair():
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        mask = np.zeros((h, w), np.uint8)
        cy, cx = rng.randint(h // 4, 3 * h // 4), rng.randint(w // 4, 3 * w // 4)
        r = rng.randint(min(h, w) // 8, min(h, w) // 4)
        cv2.circle(mask, (cx, cy), r, 255, -1)
        img[mask > 0] = (img[mask > 0] * 0.5 + 100).astype(np.uint8)
        return img, mask

    for split, n in (("train_labeled", n_labeled), ("val", n_val),
                     ("test", n_test), ("train_unlabeled", n_unlabeled)):
        for i in range(n):
            img, mask = blob_pair()
            _write(os.path.join(base_dir, split, "images",
                                f"{split}_{i:03d}.png"), img)
            _write(os.path.join(base_dir, split, "masks",
                                f"{split}_{i:03d}.png"), mask)


def make_multiclass_dataset(base_dir: str, *, num_classes: int = 9,
                            n_labeled: int = 8, n_val: int = 4,
                            n_test: int = 4, n_unlabeled: int = 8,
                            h: int = 64, w: int = 64, seed: int = 0) -> None:
    """SUIM/Cityscapes-style layout with integer class-id masks (class 0
    reserved for IM, so synthetic gt uses 1..num_classes-1)."""
    rng = np.random.RandomState(seed)
    for split, n in (("train_labeled", n_labeled), ("val", n_val),
                     ("test", n_test), ("train_unlabeled", n_unlabeled)):
        for i in range(n):
            img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
            mask = rng.randint(1, num_classes, (h // 8, w // 8)).astype(np.uint8)
            mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
            _write(os.path.join(base_dir, split, "images",
                                f"{split}_{i:03d}.png"), img)
            _write(os.path.join(base_dir, split, "masks",
                                f"{split}_{i:03d}.png"), mask)


def make_hela_dataset(base_dir: str, *, n_labeled: int = 6, n_val: int = 4,
                      n_test: int = 4, n_unlabeled: int = 6,
                      h: int = 64, w: int = 64, seed: int = 0) -> None:
    """HeLa layout: per-channel dirs brightfield/alive/dead/pos/mod_position."""
    rng = np.random.RandomState(seed)
    for split, n in (("train_labeled", n_labeled), ("val", n_val),
                     ("test", n_test), ("train_unlabeled", n_unlabeled)):
        for i in range(n):
            name = f"{split}_{i:03d}.png"
            bf = rng.randint(0, 255, (h, w)).astype(np.uint8)
            alive = np.zeros((h, w), np.uint8)
            dead = np.zeros((h, w), np.uint8)
            pos = np.zeros((h, w), np.uint8)
            for _ in range(rng.randint(1, 4)):
                cy, cx = rng.randint(8, h - 8), rng.randint(8, w - 8)
                target = alive if rng.rand() < 0.7 else dead
                cv2.circle(target, (cx, cy), rng.randint(3, 7), 255, -1)
                cv2.circle(pos, (cx, cy), 3, 255, -1)
            _write(os.path.join(base_dir, split, "brightfield", name), bf)
            _write(os.path.join(base_dir, split, "alive", name), alive)
            _write(os.path.join(base_dir, split, "dead", name), dead)
            _write(os.path.join(base_dir, split, "pos", name), pos)
            _write(os.path.join(base_dir, split, "mod_position", name), pos)


def _lesion_mask(rng, h, w):
    """Irregular star-convex lesion region (random radial harmonics)."""
    cy = rng.uniform(0.3, 0.7) * h
    cx = rng.uniform(0.3, 0.7) * w
    base_r = rng.uniform(0.12, 0.33) * min(h, w)
    n_harm = rng.randint(2, 6)
    amps = rng.uniform(0.03, 0.22, n_harm) * base_r
    phases = rng.uniform(0, 2 * np.pi, n_harm)
    ks = rng.randint(2, 9, n_harm)
    thetas = np.linspace(0, 2 * np.pi, 72, endpoint=False)
    r = base_r + sum(a * np.sin(k * thetas + p)
                     for a, k, p in zip(amps, ks, phases))
    r = np.clip(r, 4, min(h, w) * 0.45)
    pts = np.stack([cx + r * np.cos(thetas), cy + r * np.sin(thetas)],
                   axis=-1).astype(np.int32)
    mask = np.zeros((h, w), np.uint8)
    cv2.fillPoly(mask, [pts], 255)
    return mask


def make_isic_like_dataset(base_dir: str, *, n_train: int = 2594,
                           n_val: int = 100, n_test: int = 1000,
                           labeled_frac: float = 0.1, h: int = 256,
                           w: int = 256, seed: int = 42,
                           difficulty: str = "hard") -> None:
    """Structured skin-lesion proxy at the real ISIC 2018 task scale
    (2,594 train images split 10 %/90 % labeled/unlabeled per reference
    ISIC_2018/01_ISIC_2018_split_original_train.py:21-57, 100 val, 1,000
    test at 256^2 per 00_preprocess).

    Used for quality-trajectory runs when the real archive is unavailable
    (no network egress): textured skin background with illumination
    gradient, an irregular star-convex lesion with darker pigment, fuzzy
    border, pigment speckle, hair-like occluding arcs and specular spots.
    Learnable but non-trivial; NOT a substitute for real-data absolute
    numbers (see QUALITY_r2.md).

    ``difficulty``:
      * ``"r2"``  — the round-2 generator (LDT saturates at ~0.94 IoU,
        compressing strategy separations into ~0.005 — VERDICT r2 weak #5).
      * ``"hard"`` — data-limited difficulty, designed so a 259-image
        labeled split underfits while more (pseudo-)data still helps —
        the regime where the reference's semi-supervised orderings live:
        one of 6 lesion "types" per image (each type ~43 labeled
        examples), lesion-colored distractor patches distinguishable from
        the true lesion only by their weaker border gradient and blur
        (a subtle, learnable cue), a wider/lower contrast range, heavier
        speckle/noise, and wider lesion-scale variety.  Deliberately NOT
        label noise: irreducible noise caps every strategy equally and
        would compress the separations we want to resolve.
    """
    rng = np.random.RandomState(seed)
    hard = difficulty == "hard"
    if difficulty not in ("hard", "r2"):
        raise ValueError(difficulty)

    # 6 lesion types (pigment family, speckle scale, border sharpness):
    # rare-in-259 / common-in-2594 appearance modes (hard mode only)
    types = [
        # (B, G, R drift), speckle amp, border blur sigma range
        (np.array([25, 35, 55]), 10.0, (1.5, 4.0)),   # dark brown, crisp
        (np.array([60, 70, 95]), 22.0, (2.0, 6.0)),   # light brown, mottled
        (np.array([45, 40, 120]), 8.0, (1.0, 3.0)),   # reddish
        (np.array([85, 75, 90]), 30.0, (4.0, 9.0)),   # gray, diffuse
        (np.array([20, 55, 70]), 14.0, (2.0, 5.0)),   # olive
        (np.array([95, 100, 120]), 18.0, (6.0, 12.0)),  # faint, very fuzzy
    ]

    def pigment_patch(skin, tmix=None):
        """A lesion-looking pigment field for a given type mix."""
        ti = rng.randint(len(types))
        drift, spk, blur_rng = types[ti]
        jitter = rng.uniform(-12, 12, 3)
        dark = np.clip(drift + jitter + rng.uniform(0, 35), 0, 255)
        mix = tmix if tmix is not None else rng.uniform(0.15, 0.8)
        pig = dark * mix + skin * (1 - mix)
        return pig, spk, blur_rng

    def sample(idx, split):
        skin = np.array([rng.uniform(140, 220), rng.uniform(120, 185),
                         rng.uniform(160, 235)])      # BGR-ish skin tone
        img = np.ones((h, w, 3), np.float32) * skin
        # low-frequency texture + illumination gradient
        tex = cv2.resize(rng.randn(8, 8, 3).astype(np.float32) * 14,
                         (w, h), interpolation=cv2.INTER_CUBIC)
        gy = np.linspace(-1, 1, h)[:, None, None]
        gx = np.linspace(-1, 1, w)[None, :, None]
        img += tex + gy * rng.uniform(-18, 18) + gx * rng.uniform(-18, 18)

        # distractor patches (NOT lesions, NOT in the mask): what makes
        # 10 %-labeled training genuinely harder than full-data.  In hard
        # mode they use the SAME pigment families as true lesions; the
        # learnable tell is the heavier blur (no crisp border) + weaker
        # opacity — in r2 mode they are faint skin-toned smudges.
        n_distract = rng.randint(1, 4) if hard else rng.randint(0, 3)
        for _ in range(n_distract):
            dmask = _lesion_mask(rng, h, w)
            if hard:
                dcol, dspk, _ = pigment_patch(skin)
                op = rng.uniform(0.35, 0.75)
                dsoft = cv2.GaussianBlur(dmask.astype(np.float32) / 255.0,
                                         (0, 0),
                                         rng.uniform(9, 18))[..., None]
                dspeck = cv2.resize(
                    rng.randn(32, 32, 3).astype(np.float32) * dspk * 0.6,
                    (w, h), interpolation=cv2.INTER_CUBIC)
                img = img * (1 - op * dsoft) + (dcol + dspeck) * op * dsoft
            else:
                dsoft = cv2.GaussianBlur(dmask.astype(np.float32) / 255.0,
                                         (0, 0),
                                         rng.uniform(4, 10))[..., None]
                dcol = skin + rng.uniform(-55, 10, 3)
                img = img * (1 - 0.45 * dsoft) + dcol * 0.45 * dsoft

        mask = _lesion_mask(rng, h, w)
        if hard:
            # wider scale variety: shrink/grow the lesion mask sometimes
            scale = rng.choice([0.45, 0.7, 1.0, 1.0, 1.35])
            if scale != 1.0:
                m2 = cv2.resize(mask, (0, 0), fx=scale, fy=scale,
                                interpolation=cv2.INTER_NEAREST)
                mask = np.zeros((h, w), np.uint8)
                ys, xs = m2.shape
                y0 = max(0, min(h - ys, rng.randint(0, max(h - ys, 1))))
                x0 = max(0, min(w - xs, rng.randint(0, max(w - xs, 1))))
                mask[y0:y0 + min(ys, h - y0),
                     x0:x0 + min(xs, w - x0)] = m2[:min(ys, h - y0),
                                                   :min(xs, w - x0)]
                if mask.sum() == 0:
                    cv2.circle(mask, (w // 2, h // 2), 8, 255, -1)
            pig, spk_amp, blur_rng = pigment_patch(skin)
            soft = cv2.GaussianBlur(mask.astype(np.float32) / 255.0,
                                    (0, 0),
                                    rng.uniform(*blur_rng))[..., None]
            speck = cv2.resize(
                rng.randn(32, 32, 3).astype(np.float32)
                * spk_amp * rng.uniform(0.6, 1.4),
                (w, h), interpolation=cv2.INTER_CUBIC)
        else:
            # pigment distance to skin varies: some lesions low-contrast
            mix = rng.uniform(0.35, 1.0)
            dark = np.array([rng.uniform(30, 95), rng.uniform(40, 110),
                             rng.uniform(60, 130)])
            pig = dark * mix + skin * (1 - mix)
            soft = cv2.GaussianBlur(mask.astype(np.float32) / 255.0,
                                    (0, 0), rng.uniform(2, 7))[..., None]
            speck = cv2.resize(
                rng.randn(32, 32, 3).astype(np.float32)
                * rng.uniform(5, 18),
                (w, h), interpolation=cv2.INTER_CUBIC)
        img = img * (1 - soft) + (pig + speck) * soft
        # hairs: dark thin arcs crossing the frame
        for _ in range(rng.randint(0, 10 if hard else 7)):
            p0 = (rng.randint(0, w), rng.randint(0, h))
            p1 = (rng.randint(0, w), rng.randint(0, h))
            p2 = (rng.randint(0, w), rng.randint(0, h))
            pts = np.array([p0, p1, p2], np.int32)
            cv2.polylines(img, [pts], False,
                          tuple(float(v) for v in rng.uniform(10, 60, 3)),
                          rng.randint(1, 3) if hard else 1, cv2.LINE_AA)
        # specular spots
        for _ in range(rng.randint(0, 4)):
            cv2.circle(img, (rng.randint(0, w), rng.randint(0, h)),
                       rng.randint(2, 6), (255, 255, 255), -1, cv2.LINE_AA)
        img += rng.randn(h, w, 3) * (rng.uniform(4, 14) if hard
                                     else rng.uniform(2, 8))
        return np.clip(img, 0, 255).astype(np.uint8), mask

    n_labeled = int(n_train * labeled_frac)
    order = rng.permutation(n_train)
    labeled_ids = set(order[:n_labeled].tolist())
    for i in range(n_train):
        img, mask = sample(i, "train")
        split = "train_labeled" if i in labeled_ids else "train_unlabeled"
        name = f"ISIC_{i:07d}.png"
        _write(os.path.join(base_dir, split, "images", name), img)
        _write(os.path.join(base_dir, split, "masks", name), mask)
    for split, n, off in (("val", n_val, 10 ** 6),
                          ("test", n_test, 2 * 10 ** 6)):
        for i in range(n):
            img, mask = sample(i, split)
            name = f"ISIC_{off + i:07d}.png"
            _write(os.path.join(base_dir, split, "images", name), img)
            _write(os.path.join(base_dir, split, "masks", name), mask)
