"""Optimizers.

The reference compiles every model with ``tfa.optimizers.AdamW(
learning_rate=LR, weight_decay=WD)`` (reference functions.py:215, 255, 303).
tfa's AdamW applies *decoupled* weight decay NOT scaled by the learning
rate:  ``p -= lr * adam_update + wd * p``.  optax.adamw multiplies the decay
by lr, so we build the tfa semantics explicitly: scale_by_adam ->
add_decayed_weights(wd / lr) -> scale(-lr), which yields exactly
``lr * adam + wd * p`` per step.  Keras Adam defaults: b1=0.9, b2=0.999,
eps=1e-7 (note Keras eps differs from optax's 1e-8).  tfa decays every
parameter (no exclusions in the reference scripts), including BN scale/bias.
"""

from __future__ import annotations

import optax


def adamw_decoupled(learning_rate: float, weight_decay: float,
                    b1: float = 0.9, b2: float = 0.999,
                    eps: float = 1e-7) -> optax.GradientTransformation:
    transforms = [optax.scale_by_adam(b1=b1, b2=b2, eps=eps)]
    if weight_decay:
        transforms.append(optax.add_decayed_weights(
            weight_decay / learning_rate))
    transforms.append(optax.scale(-learning_rate))
    return optax.chain(*transforms)
