#!/usr/bin/env python
"""Distill one radiance field into another representation.

Counterpart of the reference's offline field-fitting experiments
(``scripts/fit_hashgrid.py``): sample random points in the source field's
AABB, regress the target field's density feature (and optionally appearance
features) onto the source's with Adam. Useful to convert a trained
TensorVMSplit checkpoint into a HashGridRF or dense GridRF.

Usage:
  python -m nmf_tpu.scripts.fit_field --ckpt log/run/run.th \
      --target hashgrid --steps 2000 --out /tmp/distilled.th
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))


def fit_field(src_rf, target_rf, key, steps=2000, batch=65536, lr=1e-2,
              fit_app=True, log_every=200):
    """Returns (fitted_rf, losses). Pure function; used by tests and CLI."""
    import jax
    import jax.numpy as jnp
    import optax

    aabb = jnp.asarray(src_rf.aabb)

    tx = optax.adam(lr)
    opt = tx.init(target_rf)

    def loss_fn(rf, xyz):
        s_sig = jax.lax.stop_gradient(
            src_rf.compute_densityfeature(xyz, activate=False))
        t_sig = rf.compute_densityfeature(xyz, activate=False)
        loss = ((t_sig - s_sig) ** 2).mean()
        if fit_app:
            s_app = jax.lax.stop_gradient(src_rf.compute_appfeature(xyz))
            t_app = rf.compute_appfeature(xyz)
            loss = loss + ((t_app - s_app) ** 2).mean()
        return loss

    @jax.jit
    def step(rf, opt, key):
        xyz = jax.random.uniform(key, (batch, 3), minval=aabb[0],
                                 maxval=aabb[1])
        loss, grads = jax.value_and_grad(loss_fn)(rf, xyz)
        updates, opt = tx.update(grads, opt, params=rf)
        rf = optax.apply_updates(rf, updates)
        return rf, opt, loss

    losses = []
    for it in range(steps):
        key, sk = jax.random.split(key)
        target_rf, opt, loss = step(target_rf, opt, sk)
        if it % log_every == 0 or it == steps - 1:
            losses.append(float(loss))
            print(f"fit_field step {it}: loss={losses[-1]:.5f}")
    return target_rf, losses


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--target", choices=("hashgrid", "grid"),
                    default="hashgrid")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--grid-size", type=int, default=128)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parents[2] / ".jax_cache"))

    from nmf_tpu import ckpt as ckpt_lib

    nmf, cfg, _ = ckpt_lib.load(args.ckpt)
    key = jax.random.PRNGKey(0)
    if args.target == "hashgrid":
        from nmf_tpu.fields.hashgrid import init_hashgrid_rf

        tgt = init_hashgrid_rf(key, nmf.rf.aabb, app_dim=nmf.rf.app_dim)
    else:
        from nmf_tpu.fields.grid import init_grid_rf

        tgt = init_grid_rf(key, nmf.rf.aabb, app_dim=nmf.rf.app_dim,
                           grid_size=(args.grid_size,) * 3)
    fitted, losses = fit_field(nmf.rf, tgt, key, steps=args.steps,
                               batch=args.batch, lr=args.lr)
    ckpt_lib.save(args.out, nmf.replace(rf=fitted), config=cfg,
                  extra={"distilled_from": args.ckpt,
                         "fit_losses": losses})
    print(f"saved distilled {args.target} field to {args.out}")


if __name__ == "__main__":
    main()
