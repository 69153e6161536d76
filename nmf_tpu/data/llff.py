"""LLFF (real forward-facing) dataset loader with NDC rays.

Host-side numpy port of the semantics of reference ``dataLoader/llff.py``:
poses_bounds.npy parsing, pose recentering/average, spiral render path,
near/far from bounds, NDC ray conversion for training.
"""
from pathlib import Path

import numpy as np

from .ray_utils import get_ray_directions, get_rays, ndc_rays_blender


def _normalize(v):
    return v / (np.linalg.norm(v) + 1e-10)


def average_poses(poses):
    """Compute the central camera-to-world (3, 4) from (N, 3, 4)."""
    center = poses[..., 3].mean(0)
    z = _normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = _normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)


def center_poses(poses):
    avg = average_poses(poses)
    avg_h = np.eye(4)
    avg_h[:3] = avg
    last = np.broadcast_to(np.array([0, 0, 0, 1.0]), (len(poses), 1, 4))
    poses_h = np.concatenate([poses, last], 1)
    centered = np.linalg.inv(avg_h) @ poses_h
    return centered[:, :3], avg_h


def create_spiral_poses(radii, focus_depth, n_poses=120, n_circles=2):
    poses = []
    for t in np.linspace(0, n_circles * 2 * np.pi, n_poses + 1)[:-1]:
        center = np.array([np.cos(t), -np.sin(t), -np.sin(0.5 * t)]) * radii
        z = _normalize(center - np.array([0, 0, -focus_depth]))
        y_ = np.array([0, 1.0, 0])
        x = _normalize(np.cross(y_, z))
        y = np.cross(z, x)
        poses.append(np.stack([x, y, z, center], 1))
    return np.stack(poses)


def load_llff(datadir, split="train", downsample=4.0, hold_every=8,
              ndc_ray=True):
    datadir = Path(datadir)
    poses_bounds = np.load(datadir / "poses_bounds.npy")  # (N, 17)
    import glob

    image_paths = sorted(
        sum([glob.glob(str(datadir / "images" / ext))
             for ext in ("*.png", "*.jpg", "*.JPG", "*.jpeg")], []))
    assert len(poses_bounds) == len(image_paths), (
        f"{len(poses_bounds)} poses vs {len(image_paths)} images")

    poses = poses_bounds[:, :15].reshape(-1, 3, 5)
    bounds = poses_bounds[:, -2:]
    H, W, focal = poses[0, :, -1]
    focal = focal / downsample
    w, h = int(W / downsample), int(H / downsample)

    # (down right back) -> (right up back)
    poses = np.concatenate(
        [poses[..., 1:2], -poses[..., :1], poses[..., 2:4]], -1)
    poses, _ = center_poses(poses)
    near_original = bounds.min()
    scale = near_original * 0.75
    bounds /= scale
    poses[..., 3] /= scale

    directions = np.stack([
        (np.arange(w)[None, :].repeat(h, 0) - w / 2 + 0.5) / focal,
        -(np.arange(h)[:, None].repeat(w, 1) - h / 2 + 0.5) / focal,
        -np.ones((h, w))], -1).astype(np.float32)

    i_test = np.arange(0, len(poses), hold_every)
    idxs = (np.array([i for i in range(len(poses)) if i not in i_test])
            if split == "train" else i_test)

    all_rays, all_rgbs = [], []
    from .blender import _imread, _resize

    for i in idxs:
        img = _imread(image_paths[i])[..., :3]
        img = _resize(img, (w, h))
        all_rgbs.append(img.reshape(-1, 3))
        c2w = poses[i]
        rays_o, rays_d = get_rays(directions, c2w)
        if ndc_ray:
            rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
            rays_o, rays_d = ndc_rays_blender(h, w, focal, 1.0, rays_o, rays_d)
        all_rays.append(np.concatenate([rays_o, rays_d], -1))

    return {
        "all_rays": np.concatenate(all_rays, 0).astype(np.float32),
        "all_rgbs": np.concatenate(all_rgbs, 0).astype(np.float32),
        "poses": poses[idxs],
        "img_wh": (w, h),
        "focal": focal,
        "near_far": (0.0, 1.0) if ndc_ray else (float(bounds.min()),
                                                float(bounds.max())),
        "scene_bbox": np.array([[-1.5, -1.67, -1.0], [1.5, 1.67, 1.0]],
                               dtype=np.float32),
        "white_bg": False,
        "ndc_ray": ndc_ray,
    }
