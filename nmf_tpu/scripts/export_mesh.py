"""Extract a triangle mesh from a trained field via marching cubes.

Reference ``scripts/export_mesh.py`` + ``utils.convert_sdf_samples_to_ply``
(utils.py:159-219). Density is evaluated on a dense grid in one batched
query and marched with skimage.

Usage:
    python -m nmf_tpu.scripts.export_mesh ckpt.th out.ply [--reso 256]
"""
import argparse

import numpy as np


def density_volume(nmf, reso=256):
    import jax.numpy as jnp

    aabb = np.asarray(nmf.rf.aabb)
    lin = [np.linspace(aabb[0][i], aabb[1][i], reso) for i in range(3)]
    gx, gy, gz = np.meshgrid(*lin, indexing="ij")
    xyz = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    sigmas = []
    chunk = 1 << 18
    for i in range(0, xyz.shape[0], chunk):
        s = nmf.rf.compute_densityfeature(jnp.asarray(xyz[i:i + chunk]))
        sigmas.append(np.asarray(s))
    return np.concatenate(sigmas).reshape(reso, reso, reso), aabb


def export_mesh(nmf, path, reso=256, level=5.0):
    from ..ops.marching import marching_tets

    vol, aabb = density_volume(nmf, reso)
    level = min(level, float(vol.max()) * 0.5)
    verts, faces = marching_tets(vol, level=level)
    scale = (aabb[1] - aabb[0]) / (reso - 1)
    verts = verts * scale + aabb[0]
    _write_ply(path, verts, faces)
    return verts, faces


def _write_ply(path, verts, faces):
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n")
        f.write(header.encode())
        f.write(verts.astype("<f4").tobytes())
        face_rec = np.empty(len(faces),
                            dtype=[("n", "u1"), ("idx", "<i4", 3)])
        face_rec["n"] = 3
        face_rec["idx"] = faces
        f.write(face_rec.tobytes())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("output")
    p.add_argument("--reso", type=int, default=256)
    p.add_argument("--level", type=float, default=5.0)
    args = p.parse_args(argv)

    from .. import ckpt as ckpt_lib

    nmf, _, _ = ckpt_lib.load(args.ckpt)
    verts, faces = export_mesh(nmf, args.output, reso=args.reso,
                               level=args.level)
    print(f"wrote {args.output}: {len(verts)} verts, {len(faces)} faces")


if __name__ == "__main__":
    main()
