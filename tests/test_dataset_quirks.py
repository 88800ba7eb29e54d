"""Dataset-loader parity against CMU-Panoptic-format quirks beyond the happy
path (`/root/reference/shared.py:127-171` semantics; VERDICT r3 missing #4):
ragged per-timestep camera lists (dropped frames), positional per-timestep
camera indices, jpg/png name pairing, seg -> (fg, 0, bg) stacking, /255 CHW
images, and the frames-1 timestep count."""

import json
from pathlib import Path

import numpy as np
import pytest

from splatpu.data.dataset import (
    get_scene_radius,
    load_metadata,
    load_timestep_views,
)


def _write_fixture(root: Path):
    """3 frames; camera counts [3, 2, 3] — frame 1 drops camera 'c'.

    Filenames follow the Panoptic layout ims/<cam>/<frame>.jpg with the seg
    mask at seg/<cam>/<frame>.png."""
    from PIL import Image

    rng = np.random.default_rng(0)
    cams = ["a", "b", "c"]
    fn, ks, w2cs = [], [], []
    w, h = 32, 24
    for t in range(3):
        present = cams if t != 1 else cams[:2]
        fn_t, k_t, w2c_t = [], [], []
        for ci, cam in enumerate(present):
            name = f"{cam}/{t:06d}.jpg"
            (root / "ims" / cam).mkdir(parents=True, exist_ok=True)
            (root / "seg" / cam).mkdir(parents=True, exist_ok=True)
            # Constant-color images: JPEG is ~lossless on them, so the test
            # can assert exact-ish values after the /255 load.
            color = np.array(
                [(t * 50) % 255, (ci * 40 + 30) % 255, 128], np.uint8
            )
            img = np.broadcast_to(color, (h, w, 3)).copy()
            Image.fromarray(img).save(root / "ims" / name, quality=100)
            seg = np.zeros((h, w), np.uint8)
            seg[: h // 2] = 1  # top half foreground
            Image.fromarray(seg).save(
                root / "seg" / name.replace(".jpg", ".png")
            )
            fn_t.append(name)
            k_t.append(
                [[30.0 + t, 0.0, 16.0], [0.0, 30.0 + ci, 12.0], [0.0, 0.0, 1.0]]
            )
            m = np.eye(4)
            m[:3, 3] = [ci * 1.0, 0.0, 3.0 + t]
            w2c_t.append(m.tolist())
        fn.append(fn_t)
        ks.append(k_t)
        w2cs.append(w2c_t)
    meta = {"w": w, "h": h, "fn": fn, "k": ks, "w2c": w2cs}
    (root / "train_meta.json").write_text(json.dumps(meta))
    return meta


def test_ragged_dropped_frame_sequence(tmp_path):
    """Dropped frames make per-timestep camera lists RAGGED; the loader must
    behave like the reference's per-timestep list indexing, not assume a
    rectangular (T, C) block."""
    meta = _write_fixture(tmp_path)
    md = load_metadata(tmp_path)
    assert md.timestep_count == 2      # frames - 1 (`train.py:130-135`)
    assert md.camera_count == 3        # timestep-0 cameras
    assert [len(f) for f in md.filenames] == [3, 2, 3]

    for t, expect in [(0, 3), (1, 2), (2, 3)]:
        views = load_timestep_views(md, t, tmp_path)
        assert len(views) == expect
        # Positional per-timestep camera indices, like the reference's
        # `for camera_index in range(len(fn[timestep]))`.
        assert [v.camera_index for v in views] == list(range(expect))
        for ci, v in enumerate(views):
            assert v.image.shape == (3, 24, 32)
            assert v.image.dtype == np.float32
            # /255 CHW with the per-view constant color intact (channel
            # order check: R and G encode t and ci respectively).
            expect_rgb = np.array(
                [(t * 50) % 255, (ci * 40 + 30) % 255, 128], np.float32
            ) / 255.0
            np.testing.assert_allclose(
                v.image.mean(axis=(1, 2)), expect_rgb, atol=0.02
            )
            # Seg stacking: (fg, 0, bg) with bg = 1 - fg (`shared.py:162-168`).
            assert v.segmentation.shape == (3, 24, 32)
            np.testing.assert_array_equal(
                v.segmentation[1], np.zeros((24, 32), np.float32)
            )
            np.testing.assert_array_equal(
                v.segmentation[2], 1.0 - v.segmentation[0]
            )
            assert v.segmentation[0, 0, 0] == 1.0   # top half fg
            assert v.segmentation[0, -1, 0] == 0.0
            # Per-timestep intrinsics/extrinsics, not timestep-0's.
            np.testing.assert_allclose(
                v.K, np.asarray(meta["k"][t][ci], np.float32)
            )
            np.testing.assert_allclose(
                v.w2c, np.asarray(meta["w2c"][t][ci], np.float32)
            )


def test_scene_radius_from_timestep0_cameras(tmp_path):
    """1.1 * max distance from the mean camera center (`densify.py:60-65`),
    computed on the timestep-0 cameras only."""
    _write_fixture(tmp_path)
    md = load_metadata(tmp_path)
    centers = np.linalg.inv(np.asarray(md.extrinsics[0]))[:, :3, 3]
    expect = 1.1 * np.max(
        np.linalg.norm(centers - centers.mean(0, keepdims=True), axis=-1)
    )
    assert get_scene_radius(md) == pytest.approx(expect)


def test_camera_subset_keeps_global_indices(tmp_path):
    """Per-process loading (dist.process) restricts cameras but keeps the
    per-timestep positional index."""
    _write_fixture(tmp_path)
    md = load_metadata(tmp_path)
    views = load_timestep_views(md, 0, tmp_path, camera_indices=[2, 0])
    assert sorted(v.camera_index for v in views) == [0, 2]
