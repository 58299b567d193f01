"""Synthetic tiny datasets in the reference's on-disk layout — used by the
test suite and by `bench.py` smoke paths when no real data is mounted."""

from __future__ import annotations

import math
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


# --------------------------------------------------------------------------
# SUIM-like structured multiclass proxy (mIoU-arm quality runs)
# --------------------------------------------------------------------------

def _texture(rng, h, w, cells, amp):
    """Low-frequency 3-channel noise field."""
    return cv2.resize(rng.randn(cells, cells, 3).astype(np.float32) * amp,
                      (w, h), interpolation=cv2.INTER_CUBIC)


def _poly_mask(rng, h, w, cy, cx, r, n_pts=10, jitter=0.45):
    """Irregular blob polygon around (cy, cx)."""
    thetas = np.linspace(0, 2 * np.pi, n_pts, endpoint=False)
    rr = r * (1 + rng.uniform(-jitter, jitter, n_pts))
    pts = np.stack([cx + rr * np.cos(thetas), cy + rr * np.sin(thetas)],
                   axis=-1).astype(np.int32)
    m = np.zeros((h, w), np.uint8)
    cv2.fillPoly(m, [pts], 255)
    return m


def make_suim_like_dataset(base_dir: str, *, n_labeled: int = 274,
                           n_unlabeled: int = 2470, n_val: int = 306,
                           n_test: int = 220, h: int = 256, w: int = 256,
                           seed: int = 42,
                           difficulty: str = "hard") -> None:
    """Structured underwater-scene proxy at the real SUIM task's scale and
    class inventory (9 classes, class 0 reserved for IM — reference
    SUIM_class_mapping.py:3-13; split/crop protocol SUIM/01:54-66 + 02:13-95
    gives ~274 labeled / ~2470 unlabeled / ~306 val / ~220 test 256^2 crops
    from the 10 %/90 % split of the 10 %-held-out train set).

    Class signatures (learnable, with per-class appearance VARIANTS so a
    274-crop labeled split underfits while pseudo-data still helps — the
    same data-limited design as make_isic_like_dataset(difficulty='hard')):

      1 waterbody      — hue/turbidity gradient + caustic ripples
      2 human divers   — dark capsule + head + fins, wetsuit hue variants
      3 plants/grass   — clusters of wavy vertical strands, green variants
      4 wrecks/ruins   — large angular polygons, rusty texture, straight
                         edges (the tell vs rocks)
      5 robots         — rounded box + appendages, bright hull variants
      6 reefs/inverts  — speckled blob clusters, magenta/orange variants
      7 fish           — aligned ellipse swarms, silvery/striped variants
      8 sea-floor/rock — bottom band + boulder blobs, sandy/gray variants

    Ambiguity (what keeps LDT near the real ~0.333 mIoU, BASELINE.md):
    water-column attenuation tints every object toward the water colour
    with a random strength, wrecks/rocks/reefs share brown-gray pigment
    families (texture is the cue), fish swarms are small, and heavy
    sensor noise/caustics sit on top.  ``difficulty``: 'easy' | 'hard' |
    'extreme' scales attenuation, noise and variant spread.
    """
    rng = np.random.RandomState(seed)
    level = {"easy": 0.5, "hard": 1.0, "extreme": 1.4}[difficulty]

    water_variants = [
        np.array([130, 90, 20]), np.array([120, 110, 30]),
        np.array([90, 70, 10]), np.array([140, 120, 60]),
        np.array([110, 95, 45]),
    ]  # BGR deep-water hues
    wetsuits = [np.array([35, 30, 25]), np.array([60, 35, 20]),
                np.array([30, 30, 60]), np.array([25, 50, 35])]
    hulls = [np.array([30, 180, 230]), np.array([30, 140, 250]),
             np.array([60, 200, 200]), np.array([200, 180, 40])]
    greens = [np.array([40, 120, 30]), np.array([50, 150, 60]),
              np.array([30, 90, 40]), np.array([70, 160, 90])]
    reefs = [np.array([150, 60, 170]), np.array([60, 80, 200]),
             np.array([130, 100, 220]), np.array([90, 60, 140])]
    browns = [np.array([40, 70, 110]), np.array([50, 90, 130]),
              np.array([60, 80, 100]), np.array([35, 55, 85])]
    sands = [np.array([110, 140, 170]), np.array([90, 110, 130]),
             np.array([70, 90, 110]), np.array([120, 130, 140])]

    def attenuate(color, water, depth):
        """Water-column tint: objects fade toward the water colour."""
        a = np.clip(depth * level, 0, 0.85)
        return color * (1 - a) + water * a

    def draw_diver(img, mask, water):
        cy, cx = rng.randint(h // 5, 4 * h // 5), rng.randint(w // 5,
                                                              4 * w // 5)
        L = rng.randint(h // 8, h // 3)
        ang = rng.uniform(0, 180)
        col = attenuate(wetsuits[rng.randint(len(wetsuits))]
                        + rng.uniform(-10, 10, 3), water,
                        rng.uniform(0.1, 0.55))
        m = np.zeros((h, w), np.uint8)
        cv2.ellipse(m, (cx, cy), (L, L // 3), ang, 0, 360, 255, -1)
        rad = ang * np.pi / 180
        hx = int(cx + 1.15 * L * np.cos(rad))
        hy = int(cy + 1.15 * L * np.sin(rad))
        cv2.circle(m, (hx, hy), L // 4, 255, -1)
        fx = int(cx - 1.3 * L * np.cos(rad))
        fy = int(cy - 1.3 * L * np.sin(rad))
        pts = np.array([[fx, fy],
                        [int(fx - L * 0.5 * np.cos(rad + 0.5)),
                         int(fy - L * 0.5 * np.sin(rad + 0.5))],
                        [int(fx - L * 0.5 * np.cos(rad - 0.5)),
                         int(fy - L * 0.5 * np.sin(rad - 0.5))]], np.int32)
        cv2.fillPoly(m, [pts], 255)
        img[m > 0] = col + rng.randn(int((m > 0).sum()), 3) * 8
        mask[m > 0] = 2

    def draw_plants(img, mask, water):
        x0 = rng.randint(0, w - 20)
        base = rng.randint(2 * h // 3, h - 1)
        col0 = greens[rng.randint(len(greens))]
        m = np.zeros((h, w), np.uint8)
        for _ in range(rng.randint(6, 18)):
            x = x0 + rng.randint(-18, 18)
            top = base - rng.randint(h // 6, h // 2)
            amp = rng.uniform(2, 9)
            ph = rng.uniform(0, 6.28)
            ys = np.arange(max(top, 0), min(base, h - 1))
            xs = (x + amp * np.sin(ys / rng.uniform(8, 22) + ph)).astype(
                np.int32)
            pts = np.stack([np.clip(xs, 0, w - 1), ys], -1)
            cv2.polylines(m, [pts], False, 255, rng.randint(1, 3))
        col = attenuate(col0 + rng.uniform(-15, 15, 3), water,
                        rng.uniform(0.05, 0.5))
        img[m > 0] = col + rng.randn(int((m > 0).sum()), 3) * 10
        mask[m > 0] = 3

    def draw_wreck(img, mask, water):
        cy, cx = rng.randint(h // 3, h - 20), rng.randint(20, w - 20)
        n = rng.randint(4, 7)
        r = rng.randint(h // 5, h // 2)
        thetas = np.sort(rng.uniform(0, 2 * np.pi, n))
        pts = np.stack([cx + r * rng.uniform(0.5, 1.0, n) * np.cos(thetas),
                        cy + r * rng.uniform(0.3, 0.7, n) * np.sin(thetas)],
                       -1).astype(np.int32)
        m = np.zeros((h, w), np.uint8)
        cv2.fillPoly(m, [pts], 255)
        col = attenuate(browns[rng.randint(len(browns))]
                        + rng.uniform(-12, 12, 3), water,
                        rng.uniform(0.1, 0.6))
        sel = m > 0
        img[sel] = col + rng.randn(int(sel.sum()), 3) * 6
        # straight plank/rib lines — the texture tell vs rocks
        for _ in range(rng.randint(3, 8)):
            i = rng.randint(n)
            j = (i + 1) % n
            t0, t1 = rng.uniform(0, 1, 2)
            p0 = (pts[i] * (1 - t0) + pts[j] * t0).astype(int)
            p1 = (pts[(i + 2) % n] * (1 - t1) + pts[(j + 2) % n]
                  * t1).astype(int)
            line = np.zeros((h, w), np.uint8)
            cv2.line(line, tuple(p0), tuple(p1), 255, rng.randint(1, 3))
            dark = np.logical_and(line > 0, sel)
            img[dark] = img[dark] * 0.55
        mask[sel] = 4

    def draw_robot(img, mask, water):
        cy, cx = rng.randint(h // 6, 5 * h // 6), rng.randint(w // 6,
                                                              5 * w // 6)
        bw, bh = rng.randint(w // 10, w // 4), rng.randint(h // 14, h // 6)
        col = attenuate(hulls[rng.randint(len(hulls))]
                        + rng.uniform(-20, 20, 3), water,
                        rng.uniform(0.05, 0.5))
        m = np.zeros((h, w), np.uint8)
        cv2.rectangle(m, (cx - bw // 2, cy - bh // 2),
                      (cx + bw // 2, cy + bh // 2), 255, -1)
        for _ in range(rng.randint(1, 4)):  # thruster/arm appendages
            ax = cx + rng.randint(-bw // 2, bw // 2)
            ay = cy + rng.choice([-bh // 2, bh // 2])
            cv2.circle(m, (ax, ay + rng.randint(-4, 4)),
                       rng.randint(3, max(bh // 3, 4)), 255, -1)
        sel = m > 0
        img[sel] = col + rng.randn(int(sel.sum()), 3) * 5
        # dark sensor ports
        for _ in range(rng.randint(1, 4)):
            px = cx + rng.randint(-bw // 3, bw // 3)
            py = cy + rng.randint(-bh // 3, bh // 3)
            cv2.circle(img, (px, py), rng.randint(2, 5), (20, 20, 20), -1)
        mask[sel] = 5

    def draw_reef(img, mask, water):
        cy, cx = rng.randint(h // 3, h - 10), rng.randint(10, w - 10)
        col0 = reefs[rng.randint(len(reefs))]
        m = np.zeros((h, w), np.uint8)
        for _ in range(rng.randint(3, 9)):
            m |= _poly_mask(rng, h, w, cy + rng.randint(-25, 25),
                            cx + rng.randint(-35, 35),
                            rng.randint(8, h // 6))
        col = attenuate(col0 + rng.uniform(-20, 20, 3), water,
                        rng.uniform(0.1, 0.6))
        sel = m > 0
        img[sel] = col + rng.randn(int(sel.sum()), 3) * 22  # heavy speckle
        mask[sel] = 6

    def draw_fish(img, mask, water):
        n = rng.randint(2, 12)
        cy, cx = rng.randint(h // 6, 5 * h // 6), rng.randint(w // 6,
                                                              5 * w // 6)
        ang = rng.uniform(0, 180)
        silver = np.array([170, 170, 160]) + rng.uniform(-30, 30, 3)
        if rng.rand() < 0.4:
            silver = np.array([60, 180, 220]) + rng.uniform(-25, 25, 3)
        col = attenuate(silver, water, rng.uniform(0.1, 0.6))
        m = np.zeros((h, w), np.uint8)
        for _ in range(n):
            fy = cy + rng.randint(-h // 5, h // 5)
            fx = cx + rng.randint(-w // 5, w // 5)
            a = rng.randint(4, 14)
            cv2.ellipse(m, (fx, fy), (a, max(a // 3, 2)),
                        ang + rng.uniform(-15, 15), 0, 360, 255, -1)
        sel = m > 0
        img[sel] = col + rng.randn(int(sel.sum()), 3) * 9
        mask[sel] = 7

    def sample():
        water = water_variants[rng.randint(len(water_variants))] \
            + rng.uniform(-12, 12, 3)
        img = np.ones((h, w, 3), np.float32) * water
        gy = np.linspace(-1, 1, h)[:, None, None]
        img += gy * rng.uniform(5, 35)      # darker with depth
        img += _texture(rng, h, w, 8, 10 * level)
        # caustic ripples
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        ca = (np.sin(xx / rng.uniform(6, 18) + rng.uniform(0, 6))
              * np.sin(yy / rng.uniform(8, 24) + rng.uniform(0, 6)))
        img += (ca * rng.uniform(2, 9 * level))[..., None]
        mask = np.ones((h, w), np.uint8)    # waterbody

        # sea-floor band (most but not all crops)
        if rng.rand() < 0.75:
            base = rng.randint(2 * h // 3, h - 5)
            xs = np.arange(w)
            ridge = (base + 12 * np.sin(xs / rng.uniform(15, 50)
                                        + rng.uniform(0, 6))
                     + rng.randn(w) * 2).astype(np.int32)
            m = np.zeros((h, w), np.uint8)
            for x in range(w):
                m[max(ridge[x], 0):, x] = 255
            for _ in range(rng.randint(0, 6)):  # boulders
                bx = rng.randint(0, w)
                by = ridge[bx % w] + rng.randint(-8, 8)
                m |= _poly_mask(rng, h, w, by, bx, rng.randint(6, 25))
            col = attenuate(sands[rng.randint(len(sands))]
                            + rng.uniform(-10, 10, 3), water,
                            rng.uniform(0.1, 0.5))
            sel = m > 0
            img[sel] = col + rng.randn(int(sel.sum()), 3) * 12
            mask[sel] = 8

        draws = [draw_diver, draw_plants, draw_wreck, draw_robot,
                 draw_reef, draw_fish]
        k = rng.randint(1, 5)
        for f in rng.choice(draws, size=k, replace=True):
            f(img, mask, water)

        img += rng.randn(h, w, 3) * rng.uniform(3, 10) * level
        return np.clip(img, 0, 255).astype(np.uint8), mask

    for split, n in (("train_labeled", n_labeled),
                     ("train_unlabeled", n_unlabeled),
                     ("val", n_val), ("test", n_test)):
        for i in range(n):
            img, mask = sample()
            name = f"SUIM_{split}_{i:05d}.png"
            _write(os.path.join(base_dir, split, "images", name), img)
            _write(os.path.join(base_dir, split, "masks", name), mask)


# --------------------------------------------------------------------------
# HeLa-like structured proxy (cell-culture arm quality runs)
# --------------------------------------------------------------------------

def make_hela_like_dataset(base_dir: str, *, n_train: int = 1700,
                           n_val: int = 150, n_test: int = 250,
                           labeled_frac: float = 0.10, h: int = 256,
                           w: int = 256, seed: int = 42,
                           difficulty: str = "hard") -> None:
    """Structured brightfield cell-culture proxy in the reference HeLa
    layout: per-split channel dirs brightfield / alive / dead / pos /
    mod_position (reference paths.py:46-50; crops HeLa/00:20-224; 10/90
    labeled split HeLa/01:30-57 is applied here directly so the numbered
    scripts start from train_labeled+train_unlabeled like the production
    tree).  The real micrograph archive is not redistributable (and this
    environment has no network), so this drives the HeLa-arm CLIs — the
    alive/dead/mod_pos 3-channel protocol, position-weighted loader,
    mIoU_ad benchmark and cell-count eval — at the real task's crop size
    and data-limited scale (BASELINE.md targets: LDT mIoU_ad ~0.512,
    FDT ~0.693).

    Appearance model (learnable, with variants so a ~170-crop labeled
    split underfits while pseudo-data still helps — same design as
    make_isic_like_dataset(difficulty='hard')):

      * alive cells — larger irregular blobs (radial-harmonic outline),
        dark textured interior with the brightfield halo ring, sometimes
        touching in clusters (boundary ambiguity);
      * dead cells  — small round high-contrast bodies (bright core,
        dark rim), confusable with...
      * debris      — faint specks/blobs in NEITHER mask, plus
        illumination gradients, defocus blur and sensor noise whose
        strength scales with ``difficulty`` ('easy'|'hard'|'extreme').

    pos = radius-3 centre discs for every cell (both kinds); mod_position
    redraws them with radius clamp(min_dist//4, 3, 8) — the reference's
    mod_pos_size rule (HeLa/00:149-196, postproc/hela.py:57-69) computed
    from the exact generator centres.
    """
    rng = np.random.RandomState(seed)
    # 'hard' (level 1.0) measured UNLEARNABLE at the LDT scale on the real
    # chip (round 5): all 10 candidates collapse to the all-zeros MSE
    # floor (val_loss 0.031 ~= mean positive fraction /3ch) because the
    # illumination gradients swamp the ~18-gray cell contrast at 10 %
    # labeled.  'medium' (0.8) keeps the data-limited design with a
    # learnable contrast/noise ratio.
    level = {"easy": 0.6, "medium": 0.8, "hard": 1.0,
             "extreme": 1.4}[difficulty]

    def cell_outline(cy, cx, r, elong, ang, n_harm_max=5):
        thetas = np.linspace(0, 2 * np.pi, 48, endpoint=False)
        rr = np.full_like(thetas, float(r))
        for k, a, p in zip(rng.randint(2, 7, n_harm_max),
                           rng.uniform(0.04, 0.18, n_harm_max) * r,
                           rng.uniform(0, 2 * np.pi, n_harm_max)):
            rr = rr + a * np.sin(k * thetas + p)
        ex = rr * (1 + elong * np.cos(thetas - ang))
        ey = rr * (1 - elong * np.cos(thetas - ang))
        pts = np.stack([cx + ex * np.cos(thetas), cy + ey * np.sin(thetas)],
                       axis=-1).astype(np.int32)
        return pts

    def sample():
        # illumination: base gray + directional gradient + low-freq field
        base = rng.uniform(105, 150)
        gy, gx = rng.uniform(-1, 1, 2) * rng.uniform(5, 18) * level
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = (base + gy * (yy / h - 0.5) + gx * (xx / w - 0.5)
               + cv2.resize(rng.randn(6, 6).astype(np.float32)
                            * 6 * level, (w, h),
                            interpolation=cv2.INTER_CUBIC))
        alive = np.zeros((h, w), np.uint8)
        dead = np.zeros((h, w), np.uint8)
        centers = []                      # (x, y, kind)
        contrast = rng.uniform(0.55, 1.0) if level >= 1 else 1.0

        # clustered alive cells: a few cluster anchors, cells around them
        n_alive = rng.randint(3, 11)
        anchors = [(rng.randint(20, h - 20), rng.randint(20, w - 20))
                   for _ in range(max(1, n_alive // 3))]
        for _ in range(n_alive):
            ay, ax = anchors[rng.randint(len(anchors))]
            cy = int(np.clip(ay + rng.randn() * 26, 14, h - 14))
            cx = int(np.clip(ax + rng.randn() * 26, 14, w - 14))
            r = rng.uniform(11, 26)
            pts = cell_outline(cy, cx, r, rng.uniform(0.05, 0.35),
                               rng.uniform(0, np.pi))
            m = np.zeros((h, w), np.uint8)
            cv2.fillPoly(m, [pts], 255)
            # brightfield look: dark cytoplasm, darker nucleus, bright halo
            halo = cv2.dilate(m, np.ones((5, 5), np.uint8)) & ~m
            interior = m > 0
            img[interior] -= rng.uniform(14, 30) * contrast
            img[halo > 0] += rng.uniform(18, 38) * contrast
            nx = int(np.clip(cx + rng.randn() * r * 0.25, 0, w - 1))
            ny = int(np.clip(cy + rng.randn() * r * 0.25, 0, h - 1))
            cv2.circle(img, (nx, ny), max(2, int(r * 0.35)),
                       float(img[interior].mean()
                             - rng.uniform(10, 22) * contrast), -1)
            img[interior] += rng.randn(int(interior.sum())) * 5 * level
            alive |= m
            centers.append((cx, cy))
        n_centers_alive = len(centers)

        # dead cells: small, round, bright core + dark rim
        for _ in range(rng.randint(1, 6)):
            cy, cx = rng.randint(10, h - 10), rng.randint(10, w - 10)
            r = rng.randint(4, 11)
            m = np.zeros((h, w), np.uint8)
            cv2.circle(m, (cx, cy), r, 255, -1)
            rim = cv2.dilate(m, np.ones((3, 3), np.uint8)) & ~m
            img[m > 0] = (img[m > 0]
                          + rng.uniform(28, 55) * contrast)
            img[rim > 0] -= rng.uniform(20, 40) * contrast
            img[m > 0] += rng.randn(int((m > 0).sum())) * 6 * level
            dead |= m
            centers.append((cx, cy))

        # debris: faint confusers in neither mask
        for _ in range(rng.randint(2, int(5 + 6 * level))):
            cy, cx = rng.randint(0, h), rng.randint(0, w)
            r = rng.randint(2, 7)
            sgn = 1 if rng.rand() < 0.5 else -1
            cv2.circle(img, (cx, cy), r,
                       float(base + sgn * rng.uniform(10, 26) * level), -1)

        # defocus + sensor noise
        k = rng.choice([1, 1, 3, 3, 5]) if level >= 1 else 1
        if k > 1:
            img = cv2.GaussianBlur(img, (k, k), 0)
        img += rng.randn(h, w) * rng.uniform(3, 9) * level
        img = np.clip(img, 0, 255).astype(np.uint8)

        # pos (radius 3) and mod_position (min-dist clamped radius)
        pos = np.zeros((h, w), np.uint8)
        mod = np.zeros((h, w), np.uint8)
        for cx, cy in centers:
            cv2.circle(pos, (cx, cy), 3, 255, -1)
            dists = [np.hypot(cx - ox, cy - oy) for ox, oy in centers
                     if (ox, oy) != (cx, cy)]
            md = min(dists) if dists else 10 ** 9
            cv2.circle(mod, (cx, cy),
                       max(min(int(md // 4), 8), 3), 255, -1)
        # overlap convention: a pixel in both channels counts as alive
        # (alive drawn first, dead may overdraw the image but masks stay
        # independent unions as in the reference annotations)
        return img, alive, dead, pos, mod, n_centers_alive

    n_labeled = int(n_train * labeled_frac)
    order = rng.permutation(n_train)
    labeled_ids = set(order[:n_labeled].tolist())
    splits = [("train", n_train, 0), ("val", n_val, 10 ** 6),
              ("test", n_test, 2 * 10 ** 6)]
    for split, n, off in splits:
        for i in range(n):
            img, alive, dead, pos, mod, _ = sample()
            if split == "train":
                sp = "train_labeled" if i in labeled_ids \
                    else "train_unlabeled"
            else:
                sp = split
            name = f"HELA_{off + i:07d}.png"
            _write(os.path.join(base_dir, sp, "brightfield", name), img)
            _write(os.path.join(base_dir, sp, "alive", name), alive)
            _write(os.path.join(base_dir, sp, "dead", name), dead)
            _write(os.path.join(base_dir, sp, "pos", name), pos)
            _write(os.path.join(base_dir, sp, "mod_position", name), mod)


# --------------------------------------------------------------------------
# Cityscapes-like structured proxy (street-scene mIoU-arm quality runs)
# --------------------------------------------------------------------------

def make_cityscapes_like_dataset(base_dir: str, *, n_train: int = 2975,
                                 n_val: int = 250, n_test: int = 250,
                                 labeled_frac: float = 0.10, h: int = 208,
                                 w: int = 416, seed: int = 42,
                                 difficulty: str = "hard") -> None:
    """Structured street-scene proxy at the real Cityscapes task's scale
    and class convention: 208x416 crops (reference config.ini [CITYSCAPES]
    via Cityscapes/00_Cityscapes_resize_images_and_masks.py:20-35's 0.2x
    resize), 2975-image train set split 10/90 labeled/unlabeled and the
    500-image val set split 50/50 into val/test
    (Cityscapes/01_Cityscapes_split_original_train_val.py:49-62), masks as
    single-channel class-id PNGs in the SHIFTED 35-class convention where
    class 0 is reserved for IM and every gtFine id moves up one
    (Cityscapes_class_mapping.py:42-120: 1 unlabeled, 2 ego vehicle,
    8 road, 9 sidewalk, 10 parking, 12 building, 13 wall, 14 fence,
    18 pole, 20 traffic light, 21 traffic sign, 22 vegetation, 23 terrain,
    24 sky, 25 person, 26 rider, 27 car, 28 truck, 29 bus, 33 motorcycle,
    34 bicycle).  The real archive needs a license + network access this
    environment lacks; this proxy drives the Cityscapes-arm CLIs (blocked
    IO, softmax head, mIoU benchmark) at the real task's data-limited
    scale (BASELINE.md panel-4 targets: LDT ~0.310, ALDT ~0.372,
    FDT ~0.453, IM++ gen 5 ~0.425).

    Scene model (learnable, variant-rich so a ~297-crop labeled split
    underfits while pseudo-data still helps — same design as
    make_suim_like_dataset):

      * perspective geometry: horizon + vanishing point, road trapezoid
        (8) with lane paint, flanking sidewalks (9), occasional parking
        strips (10) in the road pigment family — slab/lane texture is
        the cue;
      * side bands drawn per-side from {building facade with window
        grids (12), plain wall (13), slatted fence (14), vegetation
        (22), terrain (23)} — facades/walls/fences share a gray-brown
        pigment family, texture is the tell;
      * sky (24) with clouds; tree canopies (22) overhang the skyline;
      * traffic: cars (27) with cabin/wheels, trucks (28), buses (29),
        scaled by perspective depth; persons (25) on sidewalks, riders
        (26) over bicycles (34) / motorcycles (33); poles (18) carrying
        traffic lights (20) / signs (21);
      * the ego-vehicle hood (2) arcs across the bottom of most frames,
        exactly as in the real gtFine masks.

    Ambiguity (what keeps LDT near the real ~0.310 mIoU): depth haze
    fades every object toward the sky colour, time-of-day tint/exposure
    shift whole frames, small far objects (persons, poles, signs) sit at
    the 208x416 resolution limit, and the shared pigment families above
    force texture cues.  ``difficulty``: 'easy' | 'hard' | 'extreme'
    scales haze, noise and variant spread.
    """
    rng = np.random.RandomState(seed)
    level = {"easy": 0.5, "hard": 1.0, "extreme": 1.4}[difficulty]

    skies = [np.array([235, 205, 170]), np.array([215, 200, 190]),
             np.array([185, 170, 160]), np.array([205, 215, 235]),
             np.array([240, 230, 225])]              # BGR
    asphalts = [np.array([95, 92, 90]), np.array([115, 112, 110]),
                np.array([80, 78, 76]), np.array([105, 100, 95])]
    pavings = [np.array([150, 145, 140]), np.array([165, 160, 158]),
               np.array([135, 128, 122]), np.array([170, 172, 175])]
    facades = [np.array([145, 145, 150]), np.array([70, 80, 150]),
               np.array([150, 170, 185]), np.array([110, 112, 115]),
               np.array([95, 130, 160]), np.array([160, 150, 135])]
    greens = [np.array([45, 105, 55]), np.array([55, 130, 70]),
              np.array([35, 85, 45]), np.array([70, 140, 95])]
    grasses = [np.array([70, 140, 110]), np.array([60, 120, 90]),
               np.array([80, 150, 120])]
    car_cols = [np.array([230, 230, 230]), np.array([40, 40, 40]),
                np.array([175, 175, 170]), np.array([50, 50, 180]),
                np.array([150, 80, 40]), np.array([90, 60, 50])]

    def sample():
        sky = skies[rng.randint(len(skies))] + rng.uniform(-15, 15, 3)
        tint = 1 + rng.uniform(-0.12, 0.12, 3) * level   # time-of-day
        expo = rng.uniform(0.8, 1.15)
        haze = rng.uniform(0.25, 0.75) * level
        y_h = int(rng.uniform(0.38, 0.52) * h)
        vx = int(w / 2 + rng.uniform(-w / 6, w / 6))
        rw_b = rng.uniform(0.30, 0.48) * w               # road half-width

        img = np.empty((h, w, 3), np.float32)
        mask = np.ones((h, w), np.uint8)                 # 1 = unlabeled
        yy = np.arange(h, dtype=np.float32)[:, None, None]

        def s_of(y):                                     # perspective depth
            return float(np.clip((y - y_h) / (h - y_h), 0.06, 1.0))

        def fade(col, y):
            """Depth haze: fade toward the sky colour near the horizon."""
            a = np.clip((1 - s_of(y)) * haze, 0, 0.85)
            return np.asarray(col, np.float32) * (1 - a) + sky * a

        # --- sky ---------------------------------------------------------
        img[:] = sky * (0.85 + 0.3 * (1 - yy / h))
        for _ in range(rng.randint(0, 5)):               # clouds
            cx_, cy_ = rng.randint(0, w), rng.randint(0, max(y_h - 8, 1))
            ax = rng.randint(20, 90)
            cv2.ellipse(img, (cx_, cy_), (ax, max(ax // 3, 6)),
                        rng.uniform(-8, 8), 0, 360,
                        tuple(float(c) for c in
                              np.clip(sky + rng.uniform(8, 30), 0, 255)), -1)
        mask[:y_h] = 24

        # --- road trapezoid ----------------------------------------------
        asphalt = asphalts[rng.randint(len(asphalts))] + rng.uniform(-8, 8, 3)
        road = np.array([[vx - rw_b, h], [vx + rw_b, h], [vx + 2, y_h],
                         [vx - 2, y_h]], np.int32)
        m = np.zeros((h, w), np.uint8)
        cv2.fillPoly(m, [road], 255)
        for y in range(y_h, h):                          # hazed asphalt rows
            row = (m[y] > 0)
            if row.any():
                img[y, row] = fade(asphalt, y) + rng.randn(int(row.sum()),
                                                           3) * 6
        mask[m > 0] = 8
        # lane paint (stays class 8 — painted road)
        lane = np.clip(asphalt + rng.uniform(90, 130), 0, 255)
        for fr in ([0.0] if rng.rand() < 0.7 else [-0.45, 0.45]):
            for t in np.arange(0.04, 1.0, 0.12):
                y0 = int(y_h + t * (h - y_h))
                y1 = min(int(y0 + 0.05 * (h - y_h)), h - 1)
                x0 = int(vx + fr * rw_b * s_of(y0))
                x1 = int(vx + fr * rw_b * s_of(y1))
                cv2.line(img, (x0, y0), (x1, y1),
                         tuple(float(c) for c in fade(lane, y0)),
                         max(1, int(2 * s_of(y0))))

        # --- sidewalks + side bands ---------------------------------------
        paving = pavings[rng.randint(len(pavings))] + rng.uniform(-8, 8, 3)
        sw = rng.uniform(0.10, 0.22) * w
        for side in (-1, 1):
            edge_b = vx + side * rw_b
            walk = np.array([[edge_b, h], [edge_b + side * sw, h],
                             [vx + side * 6, y_h], [vx + side * 2, y_h]],
                            np.int32)
            m = np.zeros((h, w), np.uint8)
            cv2.fillPoly(m, [walk], 255)
            for y in range(y_h, h):
                row = (m[y] > 0) & (mask[y] != 8)
                if row.any():
                    img[y, row] = fade(paving, y) + rng.randn(
                        int(row.sum()), 3) * 5
            sel = (m > 0) & (mask != 8)
            mask[sel] = 9
            # slab joints — the sidewalk-vs-parking texture cue
            for t in np.arange(0.05, 1.0, 0.09):
                y0 = int(y_h + t * (h - y_h))
                x0 = int(vx + side * (rw_b * s_of(y0)))
                x1 = int(vx + side * (rw_b + sw) * s_of(y0))
                cv2.line(img, (x0, y0), (x1, y0),
                         tuple(float(c) for c in fade(paving * 0.8, y0)), 1)

        # parking strip: road pigment ON the walk side (texture-free)
        if rng.rand() < 0.25:
            side = -1 if rng.rand() < 0.5 else 1
            y0 = rng.randint(y_h + (h - y_h) // 3, h - 8)
            pk = np.array(
                [[vx + side * rw_b * s_of(y0), y0],
                 [vx + side * (rw_b + 0.7 * sw) * s_of(y0), y0],
                 [vx + side * (rw_b + 0.7 * sw), h], [vx + side * rw_b, h]],
                np.int32)
            m = np.zeros((h, w), np.uint8)
            cv2.fillPoly(m, [pk], 255)
            sel = m > 0
            img[sel] = fade(asphalt + rng.uniform(-5, 5), (y0 + h) // 2) \
                + rng.randn(int(sel.sum()), 3) * 6
            mask[sel] = 10

        # --- per-side band beyond the sidewalk -----------------------------
        def band(side):
            kind = rng.choice(["building", "wall", "fence", "veg",
                               "terrain"],
                              p=[0.42, 0.12, 0.12, 0.2, 0.14])
            x_out = 0 if side < 0 else w
            base = np.array([[vx + side * (rw_b + sw), h],
                             [x_out, h], [x_out, y_h],
                             [vx + side * 6, y_h]], np.int32)
            m = np.zeros((h, w), np.uint8)
            cv2.fillPoly(m, [base], 255)
            m[(mask != 1) & (mask != 24)] = 0            # keep road/walk
            sel = m > 0
            if not sel.any():
                return
            ys = np.where(sel.any(axis=1))[0]
            ymid = int(ys.mean())
            if kind in ("building", "wall", "fence"):
                col = facades[rng.randint(len(facades))] \
                    + rng.uniform(-12, 12, 3)
                img[sel] = fade(col, ymid) + rng.randn(int(sel.sum()),
                                                       3) * 6
                cls = {"building": 12, "wall": 13, "fence": 14}[kind]
                mask[sel] = cls
                if kind == "building":
                    # skyline block + window grid
                    top = max(y_h - rng.randint(h // 8, h // 3), 2)
                    xb0 = 0 if side < 0 else vx + 10
                    xb1 = vx - 10 if side < 0 else w
                    if xb1 > xb0:
                        blk = np.zeros((h, w), np.uint8)
                        cv2.rectangle(blk, (xb0, top), (xb1, y_h), 255, -1)
                        bsel = (blk > 0) & (mask == 24)
                        img[bsel] = fade(col, y_h) + rng.randn(
                            int(bsel.sum()), 3) * 5
                        mask[bsel] = 12
                        sel = sel | bsel
                    dark = tuple(float(c) for c in
                                 np.clip(col * 0.45, 0, 255))
                    step = rng.randint(8, 16)
                    ys2, xs2 = np.where(sel)
                    if len(ys2):
                        for wy in range(ys2.min() + 3, ys2.max() - 2, step):
                            for wx in range(xs2.min() + 3, xs2.max() - 2,
                                            step):
                                if sel[wy, wx]:
                                    cv2.rectangle(
                                        img, (wx, wy),
                                        (wx + step // 3, wy + step // 2),
                                        dark, -1)
                elif kind == "fence":
                    # vertical slats — the fence-vs-wall cue
                    dark = tuple(float(c) for c in
                                 np.clip(col * 0.55, 0, 255))
                    ys2, xs2 = np.where(sel)
                    for fx in range(xs2.min(), xs2.max(),
                                    rng.randint(4, 8)):
                        cv2.line(img, (fx, ys2.min()), (fx, ys2.max()),
                                 dark, 1)
            else:
                col0 = (greens if kind == "veg"
                        else grasses)[rng.randint(len(greens if kind ==
                                                      "veg" else grasses))]
                img[sel] = fade(col0 + rng.uniform(-12, 12, 3), ymid) \
                    + rng.randn(int(sel.sum()), 3) * (14 if kind == "veg"
                                                      else 8)
                mask[sel] = 22 if kind == "veg" else 23

        band(-1)
        band(1)

        # --- tree canopies over the skyline --------------------------------
        for _ in range(rng.randint(0, 4)):
            side = -1 if rng.rand() < 0.5 else 1
            cx_ = int(np.clip(vx + side * rng.uniform(0.25, 0.55) * w,
                              5, w - 5))
            cy_ = y_h - rng.randint(0, h // 6)
            r = rng.randint(h // 10, h // 4)
            m = np.zeros((h, w), np.uint8)
            for _ in range(rng.randint(3, 7)):
                m |= _poly_mask(rng, h, w, cy_ + rng.randint(-r, r) // 2,
                                cx_ + rng.randint(-r, r), max(r // 2, 4))
            col = fade(greens[rng.randint(len(greens))]
                       + rng.uniform(-12, 12, 3), y_h)
            sel = m > 0
            img[sel] = col + rng.randn(int(sel.sum()), 3) * 16
            mask[sel] = 22

        # --- traffic (far to near so near occludes far) ---------------------
        def draw_vehicle(y):
            s = s_of(y)
            kind = rng.choice(["car", "car", "car", "truck", "bus"])
            x = int(vx + rng.uniform(-0.75, 0.75) * rw_b * s)
            col = car_cols[rng.randint(len(car_cols))] \
                + rng.uniform(-10, 10, 3)
            if kind == "car":
                bw, bh = int(s * rng.uniform(45, 80)), int(s * rng.uniform(
                    22, 34))
                cls = 27
            elif kind == "truck":
                bw, bh = int(s * rng.uniform(60, 100)), int(s * rng.uniform(
                    38, 55))
                cls = 28
            else:
                bw, bh = int(s * rng.uniform(90, 150)), int(s * rng.uniform(
                    40, 60))
                cls = 29
            if bw < 4 or bh < 3:
                return
            x0, x1 = x - bw // 2, x + bw // 2
            y0, y1 = y - bh, y
            m = np.zeros((h, w), np.uint8)
            cv2.rectangle(m, (x0, y0), (x1, y1), 255, -1)
            # cabin / roof
            cv2.rectangle(m, (x0 + bw // 6, y0 - bh // 2),
                          (x1 - bw // 6, y0), 255, -1)
            sel = m > 0
            img[sel] = fade(col, y) + rng.randn(int(sel.sum()), 3) * 4
            mask[sel] = cls
            # windows + wheels (appearance only)
            winc = tuple(float(c) for c in fade(col * 0.35, y))
            cv2.rectangle(img, (x0 + bw // 5, y0 - bh // 2 + 1),
                          (x1 - bw // 5, y0 - 1), winc, -1)
            for wxp in (x0 + bw // 5, x1 - bw // 5):
                cv2.circle(img, (wxp, y1), max(bh // 6, 1), (25, 25, 25),
                           -1)

        def draw_person(y, on_bike=False):
            s = s_of(y)
            side = -1 if rng.rand() < 0.5 else 1
            x = int(np.clip(vx + side * (rw_b + rng.uniform(0.2, 0.8) * sw)
                            * s, 3, w - 4))
            ph = int(s * rng.uniform(26, 42))
            if ph < 5:
                return
            col = fade(np.array([rng.uniform(20, 120) for _ in range(3)]),
                       y)
            m = np.zeros((h, w), np.uint8)
            pw = max(ph // 4, 1)
            if on_bike:
                bcls = 34 if rng.rand() < 0.7 else 33
                bl = int(ph * 0.9)
                bm = np.zeros((h, w), np.uint8)
                for wxp in (x - bl // 3, x + bl // 3):
                    cv2.circle(bm, (wxp, y), max(ph // 5, 2), 255,
                               max(ph // 10, 1))
                cv2.line(bm, (x - bl // 3, y), (x + bl // 3, y), 255,
                         max(ph // 12, 1))
                bsel = bm > 0
                img[bsel] = fade(np.array([40, 40, 40]), y) \
                    + rng.randn(int(bsel.sum()), 3) * 3
                mask[bsel] = bcls
                y = y - ph // 4                       # rider sits higher
            cv2.rectangle(m, (x - pw, y - ph + ph // 4), (x + pw, y), 255,
                          -1)
            cv2.circle(m, (x, y - ph + ph // 8), max(ph // 7, 1), 255, -1)
            sel = m > 0
            img[sel] = col + rng.randn(int(sel.sum()), 3) * 5
            mask[sel] = 26 if on_bike else 25

        def draw_pole(y):
            s = s_of(y)
            side = -1 if rng.rand() < 0.5 else 1
            x = int(np.clip(vx + side * rw_b * s + side * 2, 2, w - 3))
            ph = int(s * rng.uniform(45, 85))
            if ph < 6:
                return
            top = y - ph
            pc = tuple(float(c) for c in fade(np.array([90, 90, 90]), y))
            m = np.zeros((h, w), np.uint8)
            cv2.line(m, (x, y), (x, top), 255, max(int(2 * s), 1))
            sel = m > 0
            img[sel] = np.asarray(pc, np.float32) + rng.randn(
                int(sel.sum()), 3) * 3
            mask[sel] = 18
            r = rng.rand()
            if r < 0.3:                               # traffic light box
                bw_, bh_ = max(int(3 * s), 2), max(int(8 * s), 3)
                mm = np.zeros((h, w), np.uint8)
                cv2.rectangle(mm, (x - bw_, top - bh_), (x + bw_, top),
                              255, -1)
                ssel = mm > 0
                img[ssel] = fade(np.array([30, 30, 30]), y)
                mask[ssel] = 20
                lit = [(60, 60, 230), (60, 200, 240), (80, 200, 60)][
                    rng.randint(3)]
                cv2.circle(img, (x, top - bh_ // 2), max(int(1.5 * s), 1),
                           lit, -1)
            elif r < 0.65:                            # sign plate
                rad = max(int(5 * s), 2)
                mm = np.zeros((h, w), np.uint8)
                if rng.rand() < 0.5:
                    cv2.circle(mm, (x, top), rad, 255, -1)
                else:
                    pts = np.array([[x - rad, top + rad], [x + rad,
                                                           top + rad],
                                    [x, top - rad]], np.int32)
                    cv2.fillPoly(mm, [pts], 255)
                ssel = mm > 0
                sc = [(60, 60, 220), (230, 200, 60), (200, 220, 230)][
                    rng.randint(3)]
                img[ssel] = fade(np.array(sc, np.float32), y) \
                    + rng.randn(int(ssel.sum()), 3) * 4
                mask[ssel] = 21

        ys_obj = sorted(rng.randint(y_h + 4, h - 2,
                                    rng.randint(2, 9)).tolist())
        for y in ys_obj:                              # far -> near
            r = rng.rand()
            if r < 0.45:
                draw_vehicle(y)
            elif r < 0.7:
                draw_person(y, on_bike=rng.rand() < 0.25)
            else:
                draw_pole(y)

        # --- ego-vehicle hood ----------------------------------------------
        if rng.rand() < 0.85:
            hh = rng.randint(h // 14, h // 7)
            m = np.zeros((h, w), np.uint8)
            cv2.ellipse(m, (w // 2, h + hh), (int(w * 0.75), 2 * hh), 0,
                        180, 360, 255, -1)
            sel = m > 0
            hood = np.array([35, 35, 38]) + rng.uniform(-8, 8, 3)
            img[sel] = hood + rng.randn(int(sel.sum()), 3) * 3
            mask[sel] = 2

        img = img * tint * expo
        img += rng.randn(h, w, 3) * rng.uniform(2, 7) * level
        return np.clip(img, 0, 255).astype(np.uint8), mask

    # reference split protocol: train 10/90 labeled/unlabeled
    # (Cityscapes/01:49-56, test_size=0.9), val 50/50 into val/test.
    # sklearn train_test_split CEILS the test (=unlabeled) share, so the
    # labeled count is the remainder (2975 -> 297, not round()'s 298).
    n_labeled = n_train - int(math.ceil(n_train * (1.0 - labeled_frac)))
    for split, n in (("train_labeled", n_labeled),
                     ("train_unlabeled", n_train - n_labeled),
                     ("val", n_val), ("test", n_test)):
        for i in range(n):
            img, mask = sample()
            name = f"Cityscapes_{split}_{i:05d}.png"
            _write(os.path.join(base_dir, split, "images", name), img)
            _write(os.path.join(base_dir, split, "masks", name), mask)
