"""Checkpoint save/load.

Reference: TensorNeRF.save/load (modules/tensor_nerf.py:120-175) persists a
``{config, state_dict}`` pair and re-instantiates the model from config on
load, copying tensors in non-strictly. Format 2 here adopts that split: the
checkpoint stores the resolved config plus a flat ``{path: ndarray}`` state
dict (and the geometry the builders need: aabb / near_far / grid_size), and
``load`` rebuilds the module tree through ``builders.build_nmf`` before
grafting the saved arrays in by path. A field rename then costs at most one
un-restored leaf (warned), never an unpicklable checkpoint.

Format 1 (the whole pytree pickled, including static fields) is still read
for backward compatibility, and remains the format for bare module pytrees
(e.g. a fitted ``IntegralEquirect`` from scripts/pano2env.py) which have no
config to rebuild from; the reference's Sobol-buffer deletion hack
(tensor_nerf.py:152) has no analogue because sampler RNG is stateless.
"""
import pickle
import warnings
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _path_str(path) -> str:
    return jax.tree_util.keystr(path)


def state_dict(tree):
    """Flat {path: host ndarray} over the pytree leaves."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_path_str(p): np.asarray(jax.device_get(v))
            for p, v in leaves}


def load_state_dict(tree, sd, strict=False):
    """Graft saved arrays into a freshly built pytree by path. Leaves
    missing from the state dict keep their initialized values (non-strict,
    like TensorNeRF.load strict=False); unmatched checkpoint entries are
    reported."""
    used = set()

    def pick(path, leaf):
        key = _path_str(path)
        if key in sd:
            used.add(key)
            return jnp.asarray(sd[key])
        return leaf

    out = jax.tree_util.tree_map_with_path(pick, tree)
    missing = [k for k, v in sd.items() if k not in used]
    if missing:
        msg = (f"checkpoint entries with no matching leaf (ignored): "
               f"{sorted(missing)[:8]}{'...' if len(missing) > 8 else ''}")
        if strict:
            raise KeyError(msg)
        warnings.warn(msg)
    return out


def save(path, nmf, config=None, extra=None):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    is_nmf = hasattr(nmf, "rf") and hasattr(nmf, "sampler")
    has_arch = (isinstance(config, dict)
                and isinstance(config.get("model"), dict)
                and config["model"].get("arch") is not None)
    if has_arch and is_nmf:
        payload = {
            "format": 2,
            "config": config,
            "state_dict": state_dict(nmf),
            "aabb": np.asarray(nmf.rf.aabb),
            "near_far": tuple(float(x) for x in nmf.sampler.near_far),
            "grid_size": tuple(int(g) for g in
                               getattr(nmf.rf, "grid_size", ()) or ()),
            "extra": extra or {},
        }
    else:
        # bare module pytrees (fitted envmaps, ...) or configless saves
        host_tree = jax.tree_util.tree_map(np.asarray, jax.device_get(nmf))
        payload = {"model": host_tree, "config": config, "extra": extra or {}}
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load(path, key=None):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("format") == 2:
        from .builders import build_nmf

        cfg = payload["config"]
        key = key if key is not None else jax.random.PRNGKey(0)
        grid_size = list(payload["grid_size"]) or None
        nmf = build_nmf(key, cfg["model"]["arch"], payload["aabb"],
                        payload["near_far"], grid_size=grid_size)
        nmf = load_state_dict(nmf, payload["state_dict"])
        return nmf, cfg, payload.get("extra", {})
    # format 1: whole pytree pickled (also bare module pytrees)
    model = jax.tree_util.tree_map(jnp.asarray, payload["model"])
    return model, payload.get("config"), payload.get("extra", {})
