"""EvalNet quality-scoring CNNs (TPU-native).

Functional parity with the reference factories:

- ``EvalNet`` (reference evalnet.py:24-47): two towers (image A, mask B),
  each = input block (optional /255 normalise -> 1x1 conv -> BN) + one conv
  block; concat; five conv blocks with widths int({16,32,64,128,256}*alpha);
  GlobalAveragePool; Dense(1, sigmoid) -> predicted IoU of the (image, mask)
  pair.
- ``EvalNetMIoU`` (reference evalnet.py:49-73): same trunk, two heads:
  per-class IoU vector Dense(Bc, sigmoid, name='iou') and per-class detection
  head Dense(Bc, sigmoid, name='detection').
- ``EvalNetMIoUV2`` (reference evalnet.py:76-106): deeper 4-block towers
  joined by **add**, then three conv blocks; defined for completeness (the
  reference never calls it from any script).

conv block = kxk conv -> 1x1 conv -> BN [-> 2x2 maxpool]
(reference evalnet.py:14-21); activation inside the conv, BN after, Keras
defaults (momentum .99, eps 1e-3), he_normal — same conventions as
models/unet.py.  Compute in bfloat16, heads in float32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import _bn, _conv, resolve_activation


class _Tower(nn.Module):
    """Input block + N conv blocks."""
    widths: tuple
    ks: int
    activation: str
    normalize: bool
    compute_dtype: Any

    @nn.compact
    def __call__(self, x, *, train: bool):
        act = resolve_activation(self.activation)
        dt = self.compute_dtype
        x = x.astype(jnp.float32)
        if self.normalize:
            x = x / 255.0
        x = x.astype(dt)
        # input block: 1x1 conv -> BN (reference evalnet.py:4-11)
        x = act(_conv(self.widths[0], 1, dt)(x))
        x = _bn(dt)(x, use_running_average=not train)
        # conv blocks with maxpool (reference evalnet.py:14-21)
        for w in self.widths[1:]:
            x = act(_conv(w, self.ks, dt)(x))
            x = act(_conv(w, 1, dt)(x))
            x = _bn(dt)(x, use_running_average=not train)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class _Trunk(nn.Module):
    widths: tuple
    ks: int
    activation: str
    compute_dtype: Any

    @nn.compact
    def __call__(self, x, *, train: bool):
        act = resolve_activation(self.activation)
        dt = self.compute_dtype
        for w in self.widths:
            x = act(_conv(w, self.ks, dt)(x))
            x = act(_conv(w, 1, dt)(x))
            x = _bn(dt)(x, use_running_average=not train)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # GlobalAveragePool (reference evalnet.py:44)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def _dense_sigmoid(features: int, name: str):
    return nn.Dense(features, dtype=jnp.float32, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.glorot_uniform(), name=name)


class EvalNet(nn.Module):
    """Single-IoU scorer: (image, mask) -> predicted IoU in [0, 1]."""
    alpha: float = 2.0
    activation: str = "relu"
    ks: int = 3
    normalize_a: bool = True
    normalize_b: bool = True
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image, mask, *, train: bool = False):
        w = [int(f * self.alpha) for f in (16, 16, 32, 64, 128, 256)]
        a = _Tower((w[0], w[0]), self.ks, self.activation,
                   self.normalize_a, self.compute_dtype)(image, train=train)
        b = _Tower((w[0], w[0]), self.ks, self.activation,
                   self.normalize_b, self.compute_dtype)(mask, train=train)
        x = jnp.concatenate([a, b], axis=-1)
        x = _Trunk((w[1], w[2], w[3], w[4], w[5]), self.ks,
                   self.activation, self.compute_dtype)(x, train=train)
        return nn.sigmoid(_dense_sigmoid(1, "iou")(x))


class EvalNetMIoU(nn.Module):
    """Two-head scorer: per-class IoU + per-class detection confidence."""
    num_mask_channels: int = 3
    alpha: float = 2.0
    activation: str = "relu"
    ks: int = 3
    normalize_a: bool = True
    normalize_b: bool = False
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image, mask, *, train: bool = False):
        w = [int(f * self.alpha) for f in (16, 16, 32, 64, 128, 256)]
        a = _Tower((w[0], w[0]), self.ks, self.activation,
                   self.normalize_a, self.compute_dtype)(image, train=train)
        b = _Tower((w[0], w[0]), self.ks, self.activation,
                   self.normalize_b, self.compute_dtype)(mask, train=train)
        x = jnp.concatenate([a, b], axis=-1)
        x = _Trunk((w[1], w[2], w[3], w[4], w[5]), self.ks,
                   self.activation, self.compute_dtype)(x, train=train)
        iou = nn.sigmoid(_dense_sigmoid(self.num_mask_channels, "iou")(x))
        det = nn.sigmoid(_dense_sigmoid(self.num_mask_channels, "detection")(x))
        return iou, det


class EvalNetMIoUV2(nn.Module):
    """Deeper per-tower variant joined by add (reference evalnet.py:76-106;
    vestigial in the reference — provided for completeness)."""
    num_mask_channels: int = 3
    alpha: float = 2.0
    activation: str = "relu"
    ks: int = 3
    normalize_a: bool = True
    normalize_b: bool = False
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image, mask, *, train: bool = False):
        w = [int(f * self.alpha) for f in (16, 32, 64, 128, 256)]
        tower = lambda norm: _Tower((w[0], w[0], w[1], w[2], w[3]), self.ks,
                                    self.activation, norm, self.compute_dtype)
        a = tower(self.normalize_a)(image, train=train)
        b = tower(self.normalize_b)(mask, train=train)
        x = a + b  # reference evalnet.py:96 joins by add
        x = _Trunk((w[2], w[3], w[4]), self.ks, self.activation,
                   self.compute_dtype)(x, train=train)
        iou = nn.sigmoid(_dense_sigmoid(self.num_mask_channels, "iou")(x))
        det = nn.sigmoid(_dense_sigmoid(self.num_mask_channels, "detection")(x))
        return iou, det


def create_evalnet(height: int, width: int, channels_a: int, channels_b: int,
                   alpha: float = 2.0, variant: str = "single",
                   actifu: str = "relu", ks: int = 3,
                   normalize_a: bool = True, normalize_b: bool | None = None,
                   seed: int = 0):
    """Factory mirroring the reference ``get_evalnet*`` signatures.

    variant: 'single' | 'miou' | 'miou_v2'.  Returns (module, variables).
    """
    if normalize_b is None:
        normalize_b = variant == "single"
    if variant == "single":
        module = EvalNet(alpha=alpha, activation=actifu, ks=ks,
                         normalize_a=normalize_a, normalize_b=normalize_b)
    elif variant == "miou":
        module = EvalNetMIoU(num_mask_channels=channels_b, alpha=alpha,
                             activation=actifu, ks=ks,
                             normalize_a=normalize_a, normalize_b=normalize_b)
    elif variant == "miou_v2":
        module = EvalNetMIoUV2(num_mask_channels=channels_b, alpha=alpha,
                               activation=actifu, ks=ks,
                               normalize_a=normalize_a, normalize_b=normalize_b)
    else:
        raise ValueError(f"unknown EvalNet variant {variant!r}")

    rng = jax.random.PRNGKey(seed)
    img = jnp.zeros((1, height, width, channels_a), jnp.uint8)
    msk = jnp.zeros((1, height, width, channels_b), jnp.uint8)
    variables = jax.jit(lambda r: module.init(r, img, msk, train=False))(rng)
    return module, variables
