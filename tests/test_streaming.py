"""Streaming renderer parity (reference march_rays/composite_rays path,
raymarching.cu:660-800): blockwise incremental compositing must reproduce
the batch renderer's global transmittance cumprod."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from nmf_tpu import trainer
from nmf_tpu.data.synthetic import make_sphere_dataset
from nmf_tpu.render import render
from nmf_tpu.render_streaming import render_streaming


def _trained_nmf():
    from test_train import build_small

    ds = make_sphere_dataset(n_views=4, H=32, W=32)
    key = jax.random.PRNGKey(7)
    key, bk = jax.random.split(key)
    nmf = build_small(bk, ds, grid=32, k_spr=-1)  # full budget, no top-K
    tx = trainer.make_optimizer(nmf, trainer.OptimConfig(n_iters=100))
    opt_state = tx.init(nmf)
    step = trainer.make_train_step(tx, donate=False)
    weights = trainer.LossWeights(ori_lambda=0.0, pred_lambda=0.0)
    samp = trainer.SimpleSampler(ds["all_rays"].shape[0], 512)
    for _ in range(30):
        key, sk = jax.random.split(key)
        ids = samp.nextids()
        nmf, opt_state, _ = step(
            nmf, opt_state, jnp.asarray(ds["all_rays"][ids]),
            jnp.asarray(ds["all_rgbs"][ids]), jnp.ones(3), sk, weights)
    return nmf, ds


class TestStreaming:
    def test_matches_batch_renderer(self):
        nmf, ds = _trained_nmf()
        rays = jnp.asarray(ds["all_rays"][:256])
        key = jax.random.PRNGKey(0)
        ims, _ = render(nmf, rays, key, is_train=False, bg_col=(1., 1., 1.))
        stream = jax.jit(
            lambda n, r: render_streaming(n, r, block=32, t_thresh=0.0)
        )(nmf, rays)
        a = np.asarray(ims["rgb_map"])
        b = np.asarray(stream["rgb_map"])
        assert np.abs(a - b).max() < 5e-3, np.abs(a - b).max()
        assert np.abs(np.asarray(ims["acc_map"])
                      - np.asarray(stream["acc_map"])).max() < 5e-3

    def test_early_exit_close(self):
        """With a realistic t_thresh the result stays visually identical."""
        nmf, ds = _trained_nmf()
        rays = jnp.asarray(ds["all_rays"][:128])
        full = render_streaming(nmf, rays, block=32, t_thresh=0.0)
        fast = render_streaming(nmf, rays, block=32, t_thresh=1e-3)
        diff = np.abs(np.asarray(full["rgb_map"])
                      - np.asarray(fast["rgb_map"])).max()
        assert diff < 2e-2, diff

    def test_microfacet_rejected(self):
        import pytest

        from nmf_tpu import config as config_lib
        from nmf_tpu.builders import build_nmf

        cfg = config_lib.compose([
            "model=microfacet_tensorf2", "field.N_voxel_init=4096",
            "field.N_voxel_final=4096", "field.upsamp_list=[]"])
        aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)
        nmf = build_nmf(jax.random.PRNGKey(0), cfg["model"]["arch"], aabb,
                        (2.0, 6.0))
        with pytest.raises(ValueError):
            render_streaming(nmf, jnp.zeros((4, 6)))


class TestStreamingFixedShape:
    def test_fixed_shape_field_streams(self):
        """Streaming inference over a fixed-shape (padded) field matches the
        batch renderer — live-resolution index math rides through the
        blockwise march unchanged."""
        from nmf_tpu.fields.tensorf import init_tensorvm_split
        from nmf_tpu.models.tensorf import init_tensorf_shade
        from nmf_tpu.render import NMF
        from nmf_tpu.samplers.alphagrid import AlphaGridSampler

        ds = make_sphere_dataset(n_views=2, H=24, W=24)
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        rf = init_tensorvm_split(
            k1, ds["scene_bbox"], grid_size=[24] * 3, N_voxel_init=24 ** 3,
            N_voxel_final=32 ** 3, upsamp_list=(5,), fixed_shape=True)
        rf, changed = rf.check_schedule(5)  # move live reso off its init
        assert changed
        sampler = AlphaGridSampler(
            alpha_mask=None, aabb=jnp.asarray(ds["scene_bbox"]),
            near_far=tuple(ds["near_far"])).update(rf, init=True)
        model = init_tensorf_shade(k2, rf.app_dim)
        nmf = NMF(rf=rf, sampler=sampler, model=model,
                  max_samples_per_ray=-1)

        rays = jnp.asarray(ds["all_rays"][:128])
        ims, _ = render(nmf, rays, jax.random.PRNGKey(0), is_train=False,
                        bg_col=(1.0, 1.0, 1.0))
        stream = render_streaming(nmf, rays, block=32, t_thresh=0.0)
        diff = np.abs(np.asarray(ims["rgb_map"])
                      - np.asarray(stream["rgb_map"])).max()
        assert diff < 5e-3, diff
