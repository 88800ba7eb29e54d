"""Generate a small synthetic CMU-Panoptic-layout sequence on disk.

Renders a random Gaussian cloud (drifting over time) from a ring of cameras
with the oracle renderer and writes train_meta.json / init_pt_cld.npz /
ims/ / seg/ — the exact input layout both CLI stages consume.

Usage: python scripts/make_synthetic_sequence.py <out_dir> [--frames 3]
    [--cameras 4] [--size 48] [--gaussians 60]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir", type=Path)
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--cameras", type=int, default=4)
    p.add_argument("--size", type=int, default=48)
    p.add_argument("--gaussians", type=int, default=60)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from splatpu.core.types import activate_cloud
    from splatpu.data.dataset import save_synthetic_sequence
    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
    from splatpu.render.api import render

    w = h = args.size
    cloud = make_random_cloud(jax.random.key(0), args.gaussians, extent=0.8)
    cams = [
        make_lookat_camera(
            eye=(4.0 * np.sin(a), 0.5, -4.0 * np.cos(a)), width=w, height=h
        )
        for a in np.linspace(0, 2 * np.pi, args.cameras, endpoint=False)
    ]

    images = np.zeros((args.frames, args.cameras, 3, h, w), np.float32)
    segs = np.zeros((args.frames, args.cameras, h, w), np.float32)
    for t in range(args.frames):
        moved = cloud.replace(means=cloud.means + jnp.asarray([0.02 * t, 0.0, 0.0]))
        margs = activate_cloud(moved)
        seg_args = margs.replace(colors=moved.segmentation_masks)
        for c, cam in enumerate(cams):
            images[t, c] = np.asarray(render(margs, cam, impl="oracle").image)
            seg_img = np.asarray(render(seg_args, cam, impl="oracle").image)
            segs[t, c] = (seg_img[0] > 0.5).astype(np.float32)

    pc = np.concatenate(
        [
            np.asarray(cloud.means),
            np.asarray(cloud.colors),
            (np.asarray(cloud.segmentation_masks)[:, :1] > 0.5).astype(np.float32),
        ],
        axis=1,
    )
    K = np.stack([np.stack([np.asarray(c.K) for c in cams])] * args.frames)
    w2c = np.stack([np.stack([np.asarray(c.w2c) for c in cams])] * args.frames)
    save_synthetic_sequence(args.out_dir, images, segs, K, w2c, pc)
    print(f"wrote synthetic sequence -> {args.out_dir}")


if __name__ == "__main__":
    main()
