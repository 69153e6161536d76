"""Functional MLP: parameter pytrees + pure apply.

Mirrors the factory surface of the reference ``modules/util.py:4-79``
(``create_mlp(input_w, output_w, num_layers, hidden_w, skip, initializer,
bias)`` incl. the SkipConnection variant) but as JAX pytrees. All matmuls run
in float32 accumulations on the MXU via ``preferred_element_type``.
"""
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MLP:
    """A plain relu MLP. ``layers`` is a tuple of {'w','b'} dicts.

    compute_dtype="bf16" casts matmul OPERANDS to bfloat16 (the MXU's
    native input width -- halves the weight/activation bytes each layer
    moves) while products still accumulate in f32 via
    preferred_element_type and bias-add/relu stay f32. Parameters remain
    f32 (Adam precision unaffected). Opt-in via model.arch.mlp_dtype.
    """
    layers: Any
    skip_layers: Any = None  # second half for SkipConnection
    skip_in_w: int = struct.field(pytree_node=False, default=0)
    compute_dtype: str = struct.field(pytree_node=False, default="f32")

    def __call__(self, x):
        cd = jnp.bfloat16 if self.compute_dtype == "bf16" else None
        h = x
        if self.skip_layers is not None:
            h = _apply_layers(self.layers, h, cd)
            h = jax.nn.relu(h)
            h = jnp.concatenate([x, h], axis=-1)
            return _apply_layers(self.skip_layers, h, cd)
        return _apply_layers(self.layers, h, cd)


def _apply_layers(layers, x, compute_dtype=None):
    n = len(layers)
    for i, layer in enumerate(layers):
        if layer["w"] is None:  # identity
            continue
        if compute_dtype is not None:
            x = jnp.dot(x.astype(compute_dtype),
                        layer["w"].astype(compute_dtype),
                        preferred_element_type=jnp.float32)
        else:
            x = jnp.dot(x, layer["w"], preferred_element_type=jnp.float32)
        if layer["b"] is not None:
            x = x + layer["b"]
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def _init_linear(key, fan_in, fan_out, initializer, bias=True):
    wkey, bkey = jax.random.split(key)
    if initializer == "kaiming":
        bound = math.sqrt(6.0 / fan_in)
        w = jax.random.uniform(wkey, (fan_in, fan_out), minval=-bound, maxval=bound)
        b = jnp.zeros((fan_out,)) if bias else None
    elif initializer == "xavier":
        bound = math.sqrt(2.0) * math.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(wkey, (fan_in, fan_out), minval=-bound, maxval=bound)
        b = jnp.zeros((fan_out,)) if bias else None
    elif initializer == "xavier_sigmoid":
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(wkey, (fan_in, fan_out), minval=-bound, maxval=bound)
        b = jnp.zeros((fan_out,)) if bias else None
    else:  # torch nn.Linear default
        bound = 1.0 / math.sqrt(fan_in)
        w = jax.random.uniform(wkey, (fan_in, fan_out), minval=-bound, maxval=bound)
        b = (jax.random.uniform(bkey, (fan_out,), minval=-bound, maxval=bound)
             if bias else None)
    return {"w": w, "b": b}


def _make_layers(key, input_w, output_w, num_layers, hidden_w, initializer, bias):
    if num_layers == 0:
        return ({"w": None, "b": None},)
    widths = ([input_w] + [hidden_w] * (num_layers - 1) + [output_w]
              if num_layers > 1 else [input_w, output_w])
    keys = jax.random.split(key, len(widths) - 1)
    layers = []
    for i in range(len(widths) - 1):
        use_bias = bias if i == len(widths) - 2 else True
        layers.append(_init_linear(keys[i], widths[i], widths[i + 1],
                                   initializer, use_bias))
    return tuple(layers)


def create_mlp(key, input_w, output_w, num_layers, hidden_w=128, skip=None,
               initializer=None, bias=True, **_):
    if skip is None:
        return MLP(layers=_make_layers(key, input_w, output_w, num_layers,
                                       hidden_w, initializer, bias))
    k1, k2 = jax.random.split(key)
    return MLP(
        layers=_make_layers(k1, input_w, hidden_w, skip, hidden_w,
                            initializer, True),
        skip_layers=_make_layers(k2, input_w + hidden_w, output_w,
                                 num_layers - skip, hidden_w, initializer, bias),
        skip_in_w=input_w,
    )


def scale_final_layer(mlp: MLP, scale=None, uniform_range=None, key=None):
    """Utility for near-zero final init (MLPNormal, render_modules.py:821-857)."""
    layers = self_layers = mlp.skip_layers if mlp.skip_layers is not None else mlp.layers
    last = layers[-1]
    if last["w"] is None:
        return mlp
    if uniform_range is not None:
        w = jax.random.uniform(key, last["w"].shape, minval=-uniform_range,
                               maxval=uniform_range)
    else:
        w = last["w"] * scale
    new_last = {"w": w, "b": last["b"]}
    new_layers = tuple(layers[:-1]) + (new_last,)
    if mlp.skip_layers is not None:
        return mlp.replace(skip_layers=new_layers)
    return mlp.replace(layers=new_layers)
