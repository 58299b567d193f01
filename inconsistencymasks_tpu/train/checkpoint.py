"""Checkpoint I/O preserving the reference's naming contract.

The reference saves Keras ``.h5`` files per candidate and renames the top-K
to ``{modelname}_topK_{i}.h5`` as the inter-script handoff (reference
ISIC_2018/03_ISIC_2018_subset.py:89-93, functions.py:217).  We keep the file
names (including the ``.h5`` suffix and the ``_topK_`` protocol — they are
public API for the generation loop) but store a flax msgpack payload plus a
small JSON header describing the module so checkpoints are self-describing.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import serialization

_MAGIC = b"IMTPU001"


def save_variables(path: str, variables: Any,
                   meta: Optional[dict] = None) -> None:
    """Serialize a flax variables pytree (+ JSON meta) to ``path``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = serialization.to_bytes(jax.device_get(variables))
    header = json.dumps(meta or {}).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(payload)


def load_variables(path: str, template: Optional[Any] = None
                   ) -> Tuple[Any, dict]:
    """Load (variables, meta).  With ``template`` the payload is restored
    into that pytree structure; otherwise a raw nested-dict state is
    returned."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            if magic.startswith(b"\x89HDF"):
                raise ValueError(
                    f"{path} is a Keras HDF5 checkpoint (reference format); "
                    "import it with train.keras_import."
                    "keras_h5_to_unet_variables(path, template)")
            raise ValueError(f"{path} is not an inconsistencymasks_tpu "
                             f"checkpoint (bad magic {magic!r})")
        (hlen,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        payload = f.read()
    if template is not None:
        variables = serialization.from_bytes(template, payload)
    else:
        variables = serialization.msgpack_restore(payload)
    return variables, meta


def stack_variables(variables_list) -> Any:
    """Stack per-model variable pytrees into one tree with a leading
    population/model axis (the layout every batched-ensemble program uses)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *variables_list)


def unstack_variables(stacked: Any, count: int) -> list:
    """Inverse of :func:`stack_variables`."""
    return [jax.tree.map(lambda a: a[i], stacked) for i in range(count)]


def topk_rename(model_dir: str, ranked_names: list[str], top_k: int) -> None:
    """Rename the best ``top_k`` candidates to the ``_topK_{i}`` scheme and
    delete the rest — the reference's selection protocol
    (ISIC_2018/03_ISIC_2018_subset.py:89-93 renames; non-topK files simply
    stay, so we keep them too)."""
    for rank, name in enumerate(ranked_names[:top_k], start=1):
        old = os.path.join(model_dir, f"{name}.h5")
        base = name.rsplit("_", 1)[0]
        new = os.path.join(model_dir, f"{base}_topK_{rank}.h5")
        os.replace(old, new)
