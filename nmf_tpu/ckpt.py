"""Checkpoint save/load.

Reference: TensorNeRF.save/load (modules/tensor_nerf.py:120-175) pickles a
{config, state_dict} dict. Here the model is a pytree whose static fields are
plain python, so a checkpoint is the numpy-ified pytree plus the resolved
config; sampler RNG buffers don't exist (stateless RNG), so the reference's
Sobol-buffer deletion hack (tensor_nerf.py:152) has no analogue.
"""
import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def save(path, nmf, config=None, extra=None):
    host_tree = jax.tree_util.tree_map(np.asarray, jax.device_get(nmf))
    payload = {"model": host_tree, "config": config, "extra": extra or {}}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load(path):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    model = jax.tree_util.tree_map(jnp.asarray, payload["model"])
    return model, payload.get("config"), payload.get("extra", {})
