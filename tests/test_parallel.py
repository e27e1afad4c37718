"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY §4: pjit tests with xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spurfies_tpu.config import (
    Config,
    ModelConfig,
    SamplerConfig,
    TrainConfig,
)
from spurfies_tpu.data.synthetic import make_synthetic_scene
from spurfies_tpu.parallel.mesh import make_mesh
from spurfies_tpu.train.trainer import Trainer

# Small enough that the sharded compiles keep these in the FAST tier
# (VERDICT r2 #3: the dp=8 product path must run on every pytest).
TINY = Config(
    model=ModelConfig(
        max_shading_pts=8,
        ray_sampler=SamplerConfig(
            near=0.5, far=3.0, n_samples=8, n_samples_eval=16,
            n_samples_extra=4,
        ),
    ),
    train=TrainConfig(num_pixels=32, fast_iters=1, eval_iters=1,
                      render_chunk=1024),
)


def test_device_count():
    assert jax.device_count() >= 8, (
        "conftest must provide 8 virtual CPU devices"
    )


def test_trainer_data_parallel_e2e():
    """Product path: cfg.train.data_parallel=8 trains end-to-end on the
    virtual mesh (VERDICT r1 #4 — the knob must reach the Trainer)."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, data_parallel=8,
                                        num_pixels=64)
    )
    pts, cols, views = make_synthetic_scene(n_points=1500, n_views=2,
                                            img_res=(24, 24))
    trainer = Trainer(cfg, pts, cols, views)
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8

    losses = []
    trainer.run(6, window=3,
                callback=lambda s, m: losses.append(float(m["loss"])))
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
    assert int(trainer.state.step) == 6

    # multi-chip eval render produces a finite image
    out = trainer.render_image(
        trainer.state.params, np.asarray(trainer.views["uv"]),
        trainer.views["pose"][0], trainer.views["intrinsics"][0],
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(out["rgb_values"])).all()


def test_trainer_dp_matches_single():
    """Same seed => dp=8 and dp=1 sample identical batches and take the
    same update (reduction-order drift only)."""
    import dataclasses

    pts, cols, views = make_synthetic_scene(n_points=1500, n_views=2,
                                            img_res=(24, 24))
    results = {}
    for dp in (1, 8):
        cfg = dataclasses.replace(
            TINY, train=dataclasses.replace(TINY.train, data_parallel=dp)
        )
        trainer = Trainer(cfg, pts, cols, views, seed=7)
        trainer.run(2, window=2)
        results[dp] = np.asarray(trainer.state.params["feats_color"])
    np.testing.assert_allclose(results[1], results[8], atol=5e-4)


def test_trainer_dp_validates_divisibility():
    import dataclasses

    cfg = dataclasses.replace(
        TINY, train=dataclasses.replace(TINY.train, data_parallel=8,
                                        num_pixels=60)
    )
    pts, cols, views = make_synthetic_scene(n_points=500, n_views=2,
                                            img_res=(16, 16))
    with pytest.raises(ValueError, match="multiple of data_parallel"):
        Trainer(cfg, pts, cols, views)


class TestFleet:
    def test_shard_round_robin(self):
        from spurfies_tpu.cli.fleet import shard_scans
        scans = [f"scan{i}" for i in range(11)]
        shards = [shard_scans(scans, 4, h) for h in range(4)]
        # complete, disjoint, balanced within 1
        flat = [s for sh in shards for s in sh]
        assert sorted(flat) == sorted(scans)
        sizes = [len(sh) for sh in shards]
        assert max(sizes) - min(sizes) <= 1

    def test_shard_validates_index(self):
        from spurfies_tpu.cli.fleet import shard_scans
        with pytest.raises(ValueError):
            shard_scans(["a"], 2, 2)

    @pytest.mark.slow
    def test_fleet_e2e_single_host(self, tmp_path, monkeypatch):
        """Fleet CLI runs a (tiny) scene end-to-end on host 0 of 2 and
        writes its manifest; host 1 gets the other scene."""
        import dataclasses
        monkeypatch.chdir(tmp_path)
        from spurfies_tpu.data.synthetic import export_synthetic_own_data
        export_synthetic_own_data("data", "s0", n_points=800, n_views=3,
                                  img_res=(16, 16))
        export_synthetic_own_data("data", "s1", n_points=800, n_views=3,
                                  img_res=(16, 16))
        from spurfies_tpu.cli import fleet
        ov = [
            "dataset.data_dir=own_data",
            "model.max_shading_pts=8",
            "model.ray_sampler.near=0.5", "model.ray_sampler.far=3.0",
            "model.ray_sampler.n_samples=8",
            "model.ray_sampler.n_samples_eval=16",
            "model.ray_sampler.n_samples_extra=4",
            "train.num_pixels=32", "train.opt_steps=2",
            "train.render_freq=1000", "train.checkpoint_freq=1000",
        ]
        fleet.main(["--scans", "s0,s1", "--num-hosts", "2",
                    "--host-index", "0"] + ov)
        import json
        with open("exps/fleet_host0.json") as f:
            manifest = json.load(f)
        assert list(manifest["scenes"]) == ["s0"]
