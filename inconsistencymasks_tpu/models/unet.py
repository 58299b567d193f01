"""TPU-native U-Net ("SegNet") family.

Functional parity with the reference Keras factory (reference unet.py:46-67):
4-level encoder-decoder, width schedule ``int({16,32,64,128,256} * alpha)``,
**add** (not concat) skip connections, nearest-neighbour 2x upsampling, and a
float32 1x1 output head.  Semantics preserved exactly:

- input block  = x/255 -> 1x1 conv -> BN                  (reference unet.py:4-9)
- encoder block = kxk conv -> 1x1 conv -> [dropout] -> BN -> 2x2 maxpool
                                                           (reference unet.py:11-19)
- bottleneck   = kxk conv -> 1x1 conv -> [dropout] -> BN   (reference unet.py:22-29)
- decoder block = 2x upsample -> add skip -> 1x1 conv -> BN
                  -> kxk conv -> 1x1 conv -> [dropout] -> BN
                                                           (reference unet.py:31-43)

Keras detail parity: activation is applied INSIDE the conv (i.e. conv ->
activation -> BN ordering), BatchNorm uses momentum 0.99 / eps 1e-3 (Keras
defaults), kernels use he_normal (truncated-normal variance scaling), biases
are used everywhere, and under mixed precision the output conv is pinned to
float32 (reference unet.py:63 ``dtype='float32'``).

TPU-first design: parameters live in float32; convolutions compute in
bfloat16 (MXU native); BatchNorm statistics accumulate in float32.  The whole
module is shape-static so XLA tiles every conv onto the MXU, and the module
vmaps cleanly over a leading "population" axis for simultaneous candidate
training (see train/population.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Keras BatchNormalization defaults (keep for checkpoint/selection parity).
BN_MOMENTUM = 0.99
BN_EPSILON = 1e-3

_ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "relu6": nn.relu6,
    "elu": nn.elu,
    "gelu": nn.gelu,
    "selu": nn.selu,
    "swish": nn.swish,
    "sigmoid": nn.sigmoid,
    "softmax": lambda x: nn.softmax(x, axis=-1),
    "linear": lambda x: x,
    "none": lambda x: x,
}


def resolve_activation(name: Optional[str]) -> Callable:
    if name is None:
        return lambda x: x
    try:
        return _ACTIVATIONS[name.lower()]
    except KeyError as e:
        raise ValueError(f"unsupported activation {name!r}") from e


def _conv(features: int, kernel: int, dtype) -> nn.Conv:
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        padding="SAME",
        use_bias=True,
        kernel_init=nn.initializers.he_normal(),
        dtype=dtype,             # bf16 compute
        param_dtype=jnp.float32,  # fp32 master weights
    )


def _bn(dtype, axis_name: Optional[str] = None) -> nn.BatchNorm:
    # Statistics and scale/bias in fp32; output cast back to compute dtype.
    # axis_name: cross-device statistic sync when training under shard_map
    # with a sharded batch (keeps global-batch BN semantics identical to the
    # reference's single-device batch 32).
    return nn.BatchNorm(
        momentum=BN_MOMENTUM,
        epsilon=BN_EPSILON,
        dtype=dtype,
        param_dtype=jnp.float32,
        axis_name=axis_name,
    )


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsampling (Keras UpSampling2D default)."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


class UNet(nn.Module):
    """Encoder-decoder segmentation net with add-skips.

    Args mirror the reference factory signature ``get_unet(h, w, c,
    num_outputmasks, alpha, actifu, actifuout, ks, kernel_ini,
    dropout_rate_encoder, dropout_rate_decoder, dropout_rate_bottleneck)``.
    Height/width/channels are implicit in the input array (shape-static under
    jit).
    """

    num_classes: int = 1
    alpha: float = 1.0
    activation: str = "relu"
    out_activation: str = "sigmoid"
    ks: int = 3
    dropout_rate_encoder: float = 0.0
    dropout_rate_decoder: float = 0.0
    dropout_rate_bottleneck: float = 0.0
    compute_dtype: Any = jnp.bfloat16
    # set to a mesh axis name (e.g. 'data') when training under shard_map
    # with the batch sharded over that axis: BN statistics sync across it
    bn_sync_axis: Any = None
    # measurement-only knob (ROADMAP item "BN folding at inference"):
    # 'skip' removes every BN site so eval-forward timing bounds the win
    # any BN-fold could deliver; trained variables still apply (extra
    # collections/params are ignored by flax).  Never used in production.
    bn_mode: str = "bn"

    def _widths(self) -> Sequence[int]:
        return [int(f * self.alpha) for f in (16, 32, 64, 128, 256)]

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 return_logits: bool = False) -> jnp.ndarray:
        act = resolve_activation(self.activation)
        dt = self.compute_dtype
        w16, w32, w64, w128, w256 = self._widths()

        def drop(x, rate):
            if rate > 0:
                x = nn.Dropout(rate=rate, deterministic=not train)(x)
            return x

        if self.bn_mode == "skip":
            class _NoBN:
                def __call__(self, x, use_running_average=True):
                    return x
            bn = _NoBN
        else:
            bn = lambda: _bn(dt, self.bn_sync_axis)

        def enc_block(x, f1, f2, rate):
            x = act(_conv(f1, self.ks, dt)(x))
            x = act(_conv(f2, 1, dt)(x))
            x = drop(x, rate)
            x = bn()(x, use_running_average=not train)
            p = nn.max_pool(x, (2, 2), strides=(2, 2))
            return x, p

        def dec_block(x, skip, f1, f2, rate):
            u = upsample2x(x) + skip
            c = act(_conv(f1, 1, dt)(u))
            c = bn()(c, use_running_average=not train)
            c = act(_conv(f1, self.ks, dt)(c))
            c = act(_conv(f2, 1, dt)(c))
            c = drop(c, rate)
            c = bn()(c, use_running_average=not train)
            return c

        # Input block: normalise uint8 [0,255] -> [0,1] on device.
        x = x.astype(jnp.float32) / 255.0
        x = x.astype(dt)
        x = act(_conv(w16, 1, dt)(x))
        c0 = bn()(x, use_running_average=not train)

        c1, p1 = enc_block(c0, w16, w16, self.dropout_rate_encoder)
        c2, p2 = enc_block(p1, w32, w32, self.dropout_rate_encoder)
        c3, p3 = enc_block(p2, w64, w64, self.dropout_rate_encoder)
        c4, p4 = enc_block(p3, w128, w128, self.dropout_rate_encoder)

        # Bottleneck (reference unet.py:56: filters 256a -> 128a).
        b = act(_conv(w256, self.ks, dt)(p4))
        b = act(_conv(w128, 1, dt)(b))
        b = drop(b, self.dropout_rate_bottleneck)
        c5 = bn()(b, use_running_average=not train)

        c6 = dec_block(c5, c4, w128, w64, self.dropout_rate_decoder)
        c7 = dec_block(c6, c3, w64, w32, self.dropout_rate_decoder)
        c8 = dec_block(c7, c2, w32, w16, self.dropout_rate_decoder)
        c9 = dec_block(c8, c1, w16, w16, self.dropout_rate_decoder)

        # Output head pinned to float32 (reference unet.py:63).
        logits = nn.Conv(
            features=self.num_classes,
            kernel_size=(1, 1),
            padding="SAME",
            use_bias=True,
            kernel_init=nn.initializers.he_normal(),
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="out",
        )(c9.astype(jnp.float32))

        if return_logits:
            return logits
        return resolve_activation(self.out_activation)(logits)


def create_unet(height: int, width: int, channels: int, num_outputmasks: int,
                alpha: float, actifu: str, actifuout: str, ks: int = 3,
                dropout_rate_encoder: float = 0.0,
                dropout_rate_decoder: float = 0.0,
                dropout_rate_bottleneck: float = 0.0,
                seed: int = 0):
    """Factory mirroring the reference ``get_unet`` call signature.

    Returns ``(module, variables)`` where ``variables`` holds
    ``{'params': ..., 'batch_stats': ...}`` initialised like Keras would.
    """
    module = UNet(
        num_classes=num_outputmasks,
        alpha=alpha,
        activation=actifu,
        out_activation=actifuout,
        ks=ks,
        dropout_rate_encoder=dropout_rate_encoder,
        dropout_rate_decoder=dropout_rate_decoder,
        dropout_rate_bottleneck=dropout_rate_bottleneck,
    )
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, height, width, channels), jnp.uint8)
    # jit the init: one compiled program instead of ~100 eagerly dispatched
    # ops (eager per-op dispatch is pathologically slow on some backends).
    variables = jax.jit(lambda r: module.init(r, dummy, train=False))(rng)
    return module, variables


def param_count(variables) -> int:
    return sum(p.size for p in jax.tree.leaves(variables["params"]))
