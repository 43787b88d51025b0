"""AOT model export: serialized StableHLO inference artifacts.

The deployment-artifact story of this framework (the reference's nearest
equivalent is Keras ``model.save``, which cannot even round-trip its own
custom layers — vision_transformer_detector.py:180-183). An exported
artifact directory contains:

  * ``model.stablehlo``  — ``jax.export`` serialization of the jitted
    forward + on-device decode, shape- and dtype-checked at call time,
  * ``params.npz``       — the weights (utils/checkpoint.py flat format),
  * ``config.json``      — the DetectorConfig, so the artifact is
    self-describing.

The artifact is loadable in a process that never imports the model code
(only jax + this loader), pinning the serving graph against model-code
drift; ``platforms`` allows cross-lowering (e.g. export for TPU from a
CPU host).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import DetectorConfig, configs_to_dict, configs_from_dict

_MODEL_FILE = "model.stablehlo"
_PARAMS_FILE = "params.npz"
_CONFIG_FILE = "config.json"


def export_inference(params, config: DetectorConfig, batch_size: int,
                     platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize jit(forward + decode) for fixed (batch, H, W, 3) inputs."""
    from jax import export as jax_export

    from .models.vit_detector import forward
    from .ops.decode import transform_predictions

    def infer(params, images):
        return transform_predictions(forward(params, images, config),
                                     config)

    h, w = config.image_size
    image_spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.float32)
    param_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    exported = jax_export.export(
        jax.jit(infer),
        platforms=list(platforms) if platforms else None,
    )(param_specs, image_spec)
    return exported.serialize()


def save_exported(directory: str, params, config: DetectorConfig,
                  batch_size: int,
                  platforms: Optional[Sequence[str]] = None) -> str:
    """Write the self-describing artifact directory; returns its path."""
    from .utils.checkpoint import save_params_npz

    os.makedirs(directory, exist_ok=True)
    blob = export_inference(params, config, batch_size, platforms)
    with open(os.path.join(directory, _MODEL_FILE), "wb") as f:
        f.write(blob)
    save_params_npz(os.path.join(directory, _PARAMS_FILE), params)
    with open(os.path.join(directory, _CONFIG_FILE), "w") as f:
        json.dump(configs_to_dict(config), f, indent=1)
    return directory


class ExportedDetector:
    """Loaded artifact: ``detector(images) -> (B, max_objects, 6)`` decoded
    predictions, without importing the model-building code."""

    def __init__(self, directory: str):
        from jax import export as jax_export

        with open(os.path.join(directory, _MODEL_FILE), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        data = np.load(os.path.join(directory, _PARAMS_FILE))
        # The exported call takes the params pytree flattened in the same
        # order jax.export recorded; rebuild the nested dict from the npz
        # key paths (utils/checkpoint.py save format: "a/b/0/c").
        self._params = _unflatten_npz(data)
        with open(os.path.join(directory, _CONFIG_FILE)) as f:
            self.config, _, _ = configs_from_dict(json.load(f))

    @property
    def batch_size(self) -> int:
        return self._exported.in_avals[-1].shape[0]

    def __call__(self, images) -> jnp.ndarray:
        images = jnp.asarray(images, jnp.float32)
        return self._exported.call(self._params, images)


def load_exported(directory: str) -> ExportedDetector:
    return ExportedDetector(directory)


def _unflatten_npz(data) -> dict:
    """'a/b/0/c' npz keys -> nested dicts/lists (inverse of
    utils/checkpoint.py:save_params_npz for the pytrees init_params
    builds: dicts with string keys and lists with int indices)."""
    root: dict = {}
    for flat_key in data.files:
        parts = flat_key.split("/")
        node = root
        for i, part in enumerate(parts):
            last = i == len(parts) - 1
            key = int(part) if part.isdigit() else part
            if last:
                _assign(node, key, np.asarray(data[flat_key]))
            else:
                nxt_is_idx = parts[i + 1].isdigit()
                child = _lookup(node, key)
                if child is None:
                    child = [] if nxt_is_idx else {}
                    _assign(node, key, child)
                node = child
    return root


def _lookup(node, key):
    if isinstance(node, list):
        return node[key] if key < len(node) else None
    return node.get(key)


def _assign(node, key, value):
    if isinstance(node, list):
        while len(node) <= key:
            node.append(None)
        node[key] = value
    else:
        node[key] = value
