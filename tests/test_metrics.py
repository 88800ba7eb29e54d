"""Observability parity tests (SURVEY.md §5.5): per-step learning-rate
logging, wandb video logging and run-file mirroring (exercised against a mock
wandb module — there is no network in CI)."""

import json

import numpy as np

from splatpu.obs.metrics import MetricsLogger


class FakeWandb:
    def __init__(self):
        self.logged = []
        self.saved = []

    class Video:
        def __init__(self, data, fps=30, format=None):
            assert data.ndim == 4 and data.shape[1] == 3  # (T, C, H, W)
            self.data = data
            self.fps = fps

    def log(self, payload, step=None):
        self.logged.append((step, payload))

    def save(self, path, base_path=None, policy=None):
        self.saved.append(path)


def test_log_video_uses_wandb_video():
    logger = MetricsLogger()
    fake = FakeWandb()
    logger._wandb = fake
    frames = [np.zeros((8, 12, 3), np.uint8)] * 3
    logger.log_video("000-video", frames, fps=15, step=7)
    assert len(fake.logged) == 1
    step, payload = fake.logged[0]
    assert step == 7
    vid = payload["000-video"]
    assert isinstance(vid, FakeWandb.Video)
    assert vid.data.shape == (3, 3, 8, 12)
    assert vid.fps == 15


def test_log_video_noop_without_wandb():
    logger = MetricsLogger()
    logger.log_video("x", [np.zeros((4, 4, 3), np.uint8)])  # must not raise


def test_save_run_files_mirrors_directory(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.json").write_text("{}")
    (tmp_path / "sub" / "b.txt").write_text("x")
    logger = MetricsLogger()
    fake = FakeWandb()
    logger._wandb = fake
    logger.save_run_files(tmp_path)
    assert sorted(fake.saved) == [
        str(tmp_path / "a.json"),
        str(tmp_path / "sub" / "b.txt"),
    ]


def test_jsonl_logging_and_flush(tmp_path):
    path = tmp_path / "m.jsonl"
    logger = MetricsLogger(jsonl_path=path, flush_every=100)
    logger.log({"loss": 0.5, "learning_rate": 1e-3}, step=1)
    logger.close()
    rows = [json.loads(line) for line in path.read_text().splitlines()]
    assert rows[0]["step"] == 1
    assert rows[0]["learning_rate"] == 1e-3


def test_stage2_logs_learning_rate():
    """The stage-2 trainer must log the schedule lr every step
    (reference `train.py:758`)."""
    import jax

    from splatpu.data.synthetic import make_lookat_camera, make_random_cloud
    from splatpu.data.dataset import ViewData
    from splatpu.render.binning import BinningConfig
    from splatpu.train.optim import stage2_lr_at
    from splatpu.train.stage2 import Stage2Config, train

    cam = make_lookat_camera(eye=(0, 0, -4.0), width=16, height=16)
    rng = np.random.default_rng(0)
    views = [
        [
            ViewData(
                camera_index=0,
                w2c=np.asarray(cam.w2c),
                K=np.asarray(cam.K),
                width=16,
                height=16,
                image=rng.random((3, 16, 16), dtype=np.float32),
                segmentation=np.zeros((3, 16, 16), np.float32),
            )
        ]
    ]
    cloud = make_random_cloud(jax.random.key(0), 16)

    class Capture:
        def __init__(self):
            self.rows = []

        def log(self, m, step):
            self.rows.append((step, m))

        def flush(self):
            pass

    cap = Capture()
    config = Stage2Config(
        total_iterations=2,
        warmup_iterations=1,
        hidden_dim=16,
        residual_blocks=1,
        views_per_step=1,
        timestep_count=1,
        renderer="stream",
        binning=BinningConfig(max_span=64, max_pairs=1 << 10, chunk_pairs=128),
    )
    train(cloud, views, config, logger=cap)
    assert len(cap.rows) == 2
    for step, m in cap.rows:
        assert m["learning_rate"] == stage2_lr_at(1e-3, 1, 2, step - 1)
