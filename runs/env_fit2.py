"""Envmap oracle round 2: loss matched to the metric (clipped absolute),
plus query-PSNR of the fitted map to separate deconvolution null-space
from optimization failure."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nmf_tpu.data.synthetic import _ShinyEnv, equirect_dirs, shiny_env_fn
from nmf_tpu.eval import calc_envmap_metrics
from nmf_tpu.modules.bg import init_integral_equirect


def psnr(a, b):
    err = np.clip(np.asarray(a) - np.asarray(b), -1, 1)
    return float(-10 * np.log10(np.mean(err ** 2) + 1e-12))


def fit(loss_kind, H=64, steps=3000, batch=8192, lr=0.05, seed=0):
    key = jax.random.PRNGKey(seed)
    bg = init_integral_equirect(key, bg_resolution=H, activation="exp")
    env = _ShinyEnv(H=H)
    gt_pano = np.roll(env.map, env.W // 2, axis=1)[:, ::-1].copy()

    opt = optax.adam(lr)
    params = bg.bg_mat
    opt_state = opt.init(params)

    def step(p, s, d, sa, tgt):
        def lf(p):
            b = bg.replace(bg_mat=p)
            pred = b(d, sa, cache=b.prepare(with_sh=False))
            if loss_kind == "clipped_abs":
                return (jnp.clip(pred - tgt, -1, 1) ** 2).mean()
            rel = (pred - tgt) / (jax.lax.stop_gradient(pred) + tgt + 1e-2)
            return (rel ** 2).mean()
        l, g = jax.value_and_grad(lf)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l

    step = jax.jit(step)
    rng = np.random.default_rng(seed)
    for i in range(steps):
        d = rng.normal(size=(batch, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        sa = np.full((batch,), -9.0, np.float32)
        tgt = shiny_env_fn(d)
        params, opt_state, l = step(params, opt_state, jnp.asarray(d),
                                    jnp.asarray(sa), jnp.asarray(tgt))
        if i % 500 == 0:
            print(f"[{loss_kind}] step {i} loss {float(l):.5f}")
    bg = bg.replace(bg_mat=params)
    m = calc_envmap_metrics(bg, gt_pano, fH=H)
    # query-path PSNR of the fitted map at texel centers
    dirs = equirect_dirs(H, 2 * H).reshape(-1, 3).astype(np.float32)
    tgt = shiny_env_fn(dirs)
    pred = np.asarray(bg(jnp.asarray(dirs),
                         jnp.full((dirs.shape[0],), -9.0),
                         cache=bg.prepare(with_sh=False)))
    print(f"[{loss_kind}] map metric: {m}")
    print(f"[{loss_kind}] query psnr of fitted map: {psnr(pred, tgt):.2f}"
          f"  (perfect-map reference: 21.6)")
    return m


if __name__ == "__main__":
    fit("clipped_abs")
    fit("rel")
