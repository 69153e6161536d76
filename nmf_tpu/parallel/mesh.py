"""Multi-chip execution: ray-data parallelism over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md section 2.3: no distributed
layer exists at all), so this layer is designed from scratch for TPU:

- The batch axis of rays/targets is sharded across the mesh axis ``rays``;
  all parameters (VM planes/lines, MLPs, envmap) are replicated -- at
  reference scale the whole model is ~50 MB so replication is optimal and
  the only collective is the gradient all-reduce, which XLA inserts
  automatically over ICI when the loss is computed from sharded inputs
  against replicated params.
- Implemented with jit + NamedSharding (GSPMD) rather than hand-written
  shard_map: every op in the render graph is batched over rays, so the
  partitioner propagates the ray sharding end-to-end without custom rules.
- Per-shard static sample budgets: each chip marches its own rays with the
  same compile-time K, so no cross-chip load balancing is needed.
"""
from functools import partial
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("rays",))


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with their leading axis split over the ``rays`` axis."""
    sharding = NamedSharding(mesh, P("rays"))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_parallel_train_step(tx, mesh: Mesh, hdr=False, use_gt_normals=False,
                             donate=True):
    """Like trainer.make_train_step but with explicit input/output shardings:
    rays/targets sharded over the mesh, model/opt state replicated. XLA
    inserts the psum over ICI for the gradient reduction."""
    from ..trainer import LossWeights, compute_loss

    import jax.numpy as jnp
    import optax

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("rays"))

    def step(nmf, opt_state, rays, rgb_gt, bg_col, key, weights,
             *gt_normals_args):
        gt_normals = gt_normals_args[0] if gt_normals_args else None
        (loss, metrics), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(
                nmf, rays, rgb_gt, key, weights, bg_col,
                gt_normals=gt_normals if use_gt_normals else None, hdr=hdr)
        updates, new_opt_state = tx.update(grads, opt_state, params=nmf)
        new_nmf = optax.apply_updates(nmf, updates)
        ok = jnp.isfinite(loss)
        new_nmf = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_nmf, nmf)
        new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state,
            opt_state)
        return new_nmf, new_opt_state, metrics

    in_shardings = (repl, repl, shard, shard, repl, repl, repl) + (
        (shard,) if use_gt_normals else ())
    return jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )


def make_parallel_render(mesh: Mesh, bg_col=(1.0, 1.0, 1.0),
                         draw_debug=False):
    """Sharded eval render: rays split over the mesh, model replicated.
    Returns a jitted fn(nmf, rays, key, bg_cache) -> images dict with every
    map sharded over its leading (ray) axis; feed it to
    eval.render_rays_chunked via render_fn= to spread an image render
    across a slice."""
    from ..render import render

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("rays"))

    def fn(nmf, rays, key, bg_cache):
        ims, _ = render(nmf, rays, key, is_train=False, bg_col=bg_col,
                        draw_debug=draw_debug, bg_cache=bg_cache)
        return ims

    return jax.jit(fn, in_shardings=(repl, shard, repl, repl),
                   out_shardings=shard)
