"""Blender (nerf_synthetic) dataset loader.

Host-side numpy port of reference ``dataLoader/blender.py`` (BlenderDataset
:21-258): reads transforms_{split}.json, precomputes per-pixel rays in world
space, RGBA images, optional GT normal maps. Rays/images stay in host memory
(the reference moves the whole store to GPU, train.py:333-334; on TPU we feed
per-step batches instead, which also makes multi-host sharding trivial).
"""
import json
import os
from pathlib import Path

import numpy as np

from .ray_utils import get_ray_directions, get_rays


def _imread(path):
    if str(path).lower().endswith(".exr"):
        # HDR frames (reference blender.py exr branch) via the in-repo
        # OpenEXR reader
        from .exr import read_exr

        return read_exr(path)
    import imageio.v2 as imageio

    img = imageio.imread(path)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    else:
        img = img.astype(np.float32)
    return img


def _resize(img, wh):
    w, h = wh
    if img.shape[1] == w and img.shape[0] == h:
        return img
    try:
        import cv2

        return cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
    except ImportError:
        from PIL import Image

        pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        return np.asarray(pil.resize((w, h))).astype(np.float32) / 255.0


BLENDER2OPENCV = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]],
    dtype=np.float32)


def load_blender(datadir, split="train", downsample=1.0, white_bg=True,
                 load_normals=False, n_vis=-1):
    """Returns the standard dataset dict (all_rays (N,6), all_rgbs (N,C), ...)."""
    datadir = Path(datadir)
    with open(datadir / f"transforms_{split}.json") as f:
        meta = json.load(f)

    ext = meta.get("ext", ".png")
    near_far = meta.get("near_far", [2.0, 6.0])
    white_bg = meta.get("white_bg", white_bg)
    w = int(meta.get("w", 800) / downsample)
    h = int(meta.get("h", 800) / downsample)

    scene_bbox = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]],
                          dtype=np.float32)
    aabb_scale = meta.get("aabb_scale", 1.0)
    scene_bbox *= aabb_scale

    if "camera_angle_x" in meta:
        fx = 0.5 * w / np.tan(0.5 * meta["camera_angle_x"])
        fy = fx
    else:
        fx, fy = meta["fl_x"] / downsample, meta["fl_y"] / downsample

    directions = get_ray_directions(h, w, [fx, fy])  # OpenCV convention
    directions = directions / np.linalg.norm(directions, axis=-1,
                                             keepdims=True)

    frames = meta["frames"]
    interval = 1 if n_vis < 0 else max(len(frames) // n_vis, 1)
    all_rays, all_rgbs, all_norms, all_tints, poses = [], [], [], [], []
    for frame in frames[::interval]:
        pose = np.array(frame["transform_matrix"],
                        dtype=np.float32) @ BLENDER2OPENCV
        poses.append(pose)
        fp = frame["file_path"]
        img_path = datadir / (fp + ext if not fp.endswith(ext) else fp)
        if not img_path.exists() and fp.startswith("./"):
            img_path = datadir / (fp[2:] + ext)
        img = _imread(img_path)
        img = _resize(img, (w, h))
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        all_rgbs.append(img.reshape(-1, img.shape[-1]))

        rays_o, rays_d = get_rays(directions, pose)
        all_rays.append(np.concatenate([rays_o, rays_d], -1))

        if load_normals:
            npath = datadir / (fp.replace("r_", "normal_") + ext)
            if npath.exists():
                nim = _imread(npath)[..., :3] * 2 - 1
                nim = _resize(nim, (w, h))
                all_norms.append(nim.reshape(-1, 3))
            tpath = datadir / (fp.replace("r_", "tint_") + ext)
            if tpath.exists():
                tim = _resize(_imread(tpath)[..., :3], (w, h))
                all_tints.append(tim.reshape(-1, 3))

    return {
        "all_rays": np.concatenate(all_rays, 0).astype(np.float32),
        "all_rgbs": np.concatenate(all_rgbs, 0).astype(np.float32),
        "all_norms": (np.concatenate(all_norms, 0).astype(np.float32)
                      if all_norms else None),
        "all_tints": (np.concatenate(all_tints, 0).astype(np.float32)
                      if all_tints else None),
        "poses": np.stack(poses),
        "img_wh": (w, h),
        "focal": fx,
        "near_far": tuple(near_far),
        "scene_bbox": scene_bbox,
        "white_bg": white_bg,
    }


def load_own_data(datadir, split="train", downsample=1.0, white_bg=True):
    """Self-captured transforms (reference dataLoader/your_own_data.py:13-
    104): explicit w/h/camera_angle_x/camera_angle_y/cx/cy metadata,
    principal-point-centered normalized directions, near_far [0.1, 100]."""
    datadir = Path(datadir)
    with open(datadir / f"transforms_{split}.json") as f:
        meta = json.load(f)
    ext = meta.get("ext", ".png")
    w = int(meta["w"] / downsample)
    h = int(meta["h"] / downsample)
    fx = 0.5 * w / np.tan(0.5 * meta["camera_angle_x"])
    fy = (0.5 * h / np.tan(0.5 * meta["camera_angle_y"])
          if "camera_angle_y" in meta else fx)
    cx = meta.get("cx", w / 2) / downsample
    cy = meta.get("cy", h / 2) / downsample

    directions = get_ray_directions(h, w, [fx, fy], center=[cx, cy])
    directions = directions / np.linalg.norm(directions, axis=-1,
                                             keepdims=True)
    all_rays, all_rgbs, poses = [], [], []
    for frame in meta["frames"]:
        pose = np.array(frame["transform_matrix"],
                        dtype=np.float32) @ BLENDER2OPENCV
        poses.append(pose)
        fp = frame["file_path"]
        img_path = datadir / (fp + ext if not fp.endswith(ext) else fp)
        img = _imread(img_path)
        img = _resize(img, (w, h))
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        img = img.reshape(-1, img.shape[-1])
        if img.shape[-1] == 4:
            img = img[:, :3] * img[:, -1:] + (1 - img[:, -1:])
        all_rgbs.append(img)
        rays_o, rays_d = get_rays(directions, pose)
        all_rays.append(np.concatenate([rays_o, rays_d], -1))

    return {
        "all_rays": np.concatenate(all_rays, 0).astype(np.float32),
        "all_rgbs": np.concatenate(all_rgbs, 0).astype(np.float32),
        "poses": np.stack(poses),
        "img_wh": (w, h),
        "focal": fx,
        "near_far": (0.1, 100.0),
        "scene_bbox": np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]],
                               np.float32),
        "white_bg": True,
    }


def load_dataset(cfg_dataset, datadir, split="train", n_vis=-1):
    """Dispatch on dataset_name (reference dataLoader/__init__.py registry)."""
    name = cfg_dataset["dataset_name"]
    if name == "blender":
        ds = load_blender(
            os.path.join(datadir, cfg_dataset["scenedir"]), split=split,
            downsample=cfg_dataset.get("downsample_train", 1.0),
            white_bg=cfg_dataset.get("white_bg", True), n_vis=n_vis,
            load_normals=cfg_dataset.get("stack_norms", False))
    elif name == "llff":
        from .llff import load_llff

        ds = load_llff(os.path.join(datadir, cfg_dataset["scenedir"]),
                       split=split,
                       downsample=cfg_dataset.get("downsample_train", 4.0),
                       ndc_ray=cfg_dataset.get("ndc_ray", True))
    elif name == "nsvf":
        from .nsvf import load_nsvf

        ds = load_nsvf(os.path.join(datadir, cfg_dataset["scenedir"]),
                       split=split,
                       downsample=cfg_dataset.get("downsample_train", 1.0),
                       white_bg=cfg_dataset.get("white_bg", True))
    elif name == "tankstemple":
        from .nsvf import load_tankstemple

        ds = load_tankstemple(
            os.path.join(datadir, cfg_dataset["scenedir"]), split=split,
            downsample=cfg_dataset.get("downsample_train", 1.0),
            white_bg=cfg_dataset.get("white_bg", True))
    elif name == "own_data":
        ds = load_own_data(os.path.join(datadir, cfg_dataset["scenedir"]),
                           split=split,
                           downsample=cfg_dataset.get("downsample_train",
                                                      1.0),
                           white_bg=cfg_dataset.get("white_bg", True))
    elif name == "synthetic_sphere":
        from .synthetic import make_sphere_dataset

        n_views = cfg_dataset.get("n_views", 12)
        size = cfg_dataset.get("image_size", 64)
        seed = 0 if split == "train" else 1
        phi = -30.0 if split == "train" else -25.0
        ds = make_sphere_dataset(n_views=n_views, H=size, W=size, seed=seed,
                                 phi_deg=phi)
    elif name in ("synthetic_shiny", "synthetic_cluster",
                  "synthetic_studio"):
        from .synthetic import make_shiny_dataset

        n_views = cfg_dataset.get("n_views", 24)
        size = cfg_dataset.get("image_size", 128)
        ds = make_shiny_dataset(
            n_views=n_views, H=size, W=size, split=split,
            env_bg=cfg_dataset.get("env_bg", False),
            hemisphere=cfg_dataset.get("hemisphere", False),
            interreflect=cfg_dataset.get("interreflect", True),
            n_gi_samples=cfg_dataset.get("n_gi_samples", 64),
            scene=name.split("_", 1)[1])
    else:
        raise ValueError(f"unknown dataset {name}")
    if "near_far" in cfg_dataset and cfg_dataset["near_far"]:
        ds["near_far"] = tuple(cfg_dataset["near_far"])
    return ds
