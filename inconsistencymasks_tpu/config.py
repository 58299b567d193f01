"""Typed configuration loaded from the reference-compatible ``config.ini``.

The reference re-parses ``config.ini`` with ``configparser`` at the top of every
script (e.g. reference functions.py:23-33, ISIC_2018/03_ISIC_2018_subset.py:20-33).
Here the same INI format is parsed once into frozen dataclasses; every key of
the reference file (reference config.ini:1-100) is represented.

Booleans use the reference's convention ``str.lower() == 'true'``
(reference ISIC_2018/11_ISIC_2018_IM+.py:38-39).  Note the reference's
``09_ISIC_2018_IM.py:38-39`` has a latent bug (``bool(non-empty-str)`` is always
True); we implement the *intended* semantics.
"""

from __future__ import annotations

import configparser
import dataclasses
import os
from dataclasses import dataclass
from typing import Optional


def _as_bool(s: str) -> bool:
    return s.strip().lower() == "true"


@dataclass(frozen=True)
class DefaultConfig:
    """Keys of the [DEFAULT] section (reference config.ini:1-14)."""

    seed: int = 42
    num_epochs: int = 50
    num_epochs_evalnet: int = 50
    num_epochs_cs: int = 100
    batch_size: int = 32
    batch_size_evalnet: int = 32
    num_loops_train: int = 10
    num_loops_val: int = 3
    lr: float = 0.003
    wd: float = 1e-4
    validation_frequency: int = 1
    threshold: float = 0.5
    top_ks: int = 4


@dataclass(frozen=True)
class DatasetConfig:
    """Per-dataset section ([ISIC_2018] / [HELA] / [SUIM] / [CITYSCAPES])."""

    name: str
    image_height: int
    image_width: int
    image_channels: int
    num_classes: int
    base_dir: str
    alpha: float
    alpha_evalnet: float
    actifu: str
    actifu_output: str
    erode_kernel: int
    dilate_kernel: int
    block_input: bool
    block_output: bool
    min_threshold: float
    max_threshold: float
    free_rotation: bool
    num_images_im_plus: int
    # dataset-specific extras
    use_mod_pos_size: bool = False          # HELA
    filter_inconsistent_class_pred: bool = False
    use_n_rnd_transformations: bool = False  # ISIC_2018
    resize_factor: Optional[float] = None    # CITYSCAPES
    # merged defaults (so one object carries everything a script needs)
    defaults: DefaultConfig = dataclasses.field(default_factory=DefaultConfig)

    @property
    def hw(self):
        return (self.image_height, self.image_width)

    @property
    def is_multiclass(self) -> bool:
        return self.actifu_output == "softmax"


@dataclass(frozen=True)
class FrameworkConfig:
    defaults: DefaultConfig
    isic_2018: DatasetConfig
    hela: DatasetConfig
    suim: DatasetConfig
    cityscapes: DatasetConfig

    def dataset(self, name: str) -> DatasetConfig:
        key = name.strip().lower().replace("-", "_")
        aliases = {
            "isic_2018": "isic_2018",
            "isic2018": "isic_2018",
            "isic": "isic_2018",
            "hela": "hela",
            "suim": "suim",
            "cityscapes": "cityscapes",
        }
        return getattr(self, aliases[key])


_SECTION_NAMES = {
    "isic_2018": "ISIC_2018",
    "hela": "HELA",
    "suim": "SUIM",
    "cityscapes": "CITYSCAPES",
}


def _parse_dataset(cp: configparser.ConfigParser, section: str,
                   defaults: DefaultConfig) -> DatasetConfig:
    s = cp[section]
    return DatasetConfig(
        name=section,
        image_height=s.getint("IMAGE_HEIGHT"),
        image_width=s.getint("IMAGE_WIDTH"),
        image_channels=s.getint("IMAGE_CHANNELS"),
        num_classes=s.getint("NUM_CLASSES"),
        base_dir=s.get("BASE_DIR"),
        alpha=s.getfloat("ALPHA"),
        alpha_evalnet=s.getfloat("ALPHA_EVALNET"),
        actifu=s.get("ACTIFU").strip(),
        actifu_output=s.get("ACTIFU_OUTPUT").strip(),
        erode_kernel=s.getint("ERODE_KERNEL"),
        dilate_kernel=s.getint("DILATE_KERNEL"),
        block_input=_as_bool(s.get("BLOCK_INPUT", "True")),
        block_output=_as_bool(s.get("BLOCK_OUTPUT", "True")),
        min_threshold=s.getfloat("MIN_THRESHOLD"),
        max_threshold=s.getfloat("MAX_THRESHOLD"),
        free_rotation=_as_bool(s.get("FREE_ROTATION", "False")),
        num_images_im_plus=s.getint("NUM_IMAGES_IM_PLUS", fallback=1),
        use_mod_pos_size=_as_bool(s.get("USE_MOD_POS_SIZE", "False")),
        filter_inconsistent_class_pred=_as_bool(
            s.get("FILTER_INCONSISTENT_CLASS_PRED", "False")),
        use_n_rnd_transformations=_as_bool(
            s.get("USE_N_RND_TRANSFORMATIONS", "False")),
        resize_factor=(s.getfloat("RESIZE_FACTOR")
                       if "RESIZE_FACTOR" in s else None),
        defaults=defaults,
    )


def find_config_ini(start: Optional[str] = None) -> str:
    """Locate config.ini: $IM_CONFIG, then cwd, then the repo root."""
    env = os.environ.get("IM_CONFIG")
    if env and os.path.isfile(env):
        return env
    candidates = []
    if start:
        candidates.append(os.path.join(start, "config.ini"))
    candidates.append(os.path.join(os.getcwd(), "config.ini"))
    here = os.path.dirname(os.path.abspath(__file__))
    candidates.append(os.path.join(os.path.dirname(here), "config.ini"))
    for c in candidates:
        if os.path.isfile(c):
            return c
    raise FileNotFoundError(
        f"config.ini not found (searched {candidates}); set $IM_CONFIG")


def load_config(path: Optional[str] = None) -> FrameworkConfig:
    cp = configparser.ConfigParser()
    path = path or find_config_ini()
    read = cp.read(path)
    if not read:
        raise FileNotFoundError(f"could not read config file {path}")

    d = cp["DEFAULT"]
    defaults = DefaultConfig(
        seed=d.getint("SEED", 42),
        num_epochs=d.getint("NUM_EPOCHS", 50),
        num_epochs_evalnet=d.getint("NUM_EPOCHS_EVALNET", 50),
        num_epochs_cs=d.getint("NUM_EPOCHS_CS", 100),
        batch_size=d.getint("BATCH_SIZE", 32),
        batch_size_evalnet=d.getint("BATCH_SIZE_EVALNET", 32),
        num_loops_train=d.getint("NUM_LOOPS_TRAIN", 10),
        num_loops_val=d.getint("NUM_LOOPS_VAL", 3),
        lr=d.getfloat("LR", 0.003),
        wd=d.getfloat("WD", 1e-4),
        validation_frequency=d.getint("VALIDATION_FREQUENCY", 1),
        threshold=d.getfloat("THRESHOLD", 0.5),
        top_ks=d.getint("TOP_Ks", 4),
    )
    return FrameworkConfig(
        defaults=defaults,
        **{attr: _parse_dataset(cp, section, defaults)
           for attr, section in _SECTION_NAMES.items()},
    )
