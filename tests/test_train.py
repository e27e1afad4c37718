"""End-to-end optimization smoke test on the synthetic sphere scene
(SURVEY §4: 'end-to-end tiny-scene optimization smoke test')."""

import jax
import numpy as np
import pytest

from spurfies_tpu.config import (
    Config,
    LossConfig,
    ModelConfig,
    SamplerConfig,
    TrainConfig,
)
from spurfies_tpu.data.synthetic import make_synthetic_scene
from spurfies_tpu.train.optim import build_optimizer, cosine_lr
from spurfies_tpu.train.trainer import Trainer

TINY = Config(
    model=ModelConfig(
        max_shading_pts=24,
        ray_sampler=SamplerConfig(
            near=0.5, far=3.0, n_samples=16, n_samples_eval=32,
            n_samples_extra=8,
        ),
    ),
    loss=LossConfig(),
    train=TrainConfig(num_pixels=128, fast_iters=1),
)


class TestOptim:
    def test_cosine_schedule(self):
        sched = cosine_lr(5e-4, 100, 3e-4)
        np.testing.assert_allclose(float(sched(0)), 5e-4, rtol=1e-6)
        np.testing.assert_allclose(float(sched(100)), 3e-4, rtol=1e-6)
        np.testing.assert_allclose(
            float(sched(50)), 3e-4 + (5e-4 - 3e-4) * 0.5, rtol=1e-6
        )
        # clamps past T_max
        np.testing.assert_allclose(float(sched(500)), 3e-4, rtol=1e-6)

    def test_nan_guard(self):
        import jax.numpy as jnp
        import optax
        tx = build_optimizer(TINY.train)
        params = {"feats_color": jnp.ones((4, 2)), "w": jnp.ones((2,))}
        st = tx.init(params)
        bad = {"feats_color": jnp.full((4, 2), jnp.nan), "w": jnp.ones((2,))}
        upd, st2 = tx.update(bad, st, params)
        flat, _ = jax.tree_util.tree_flatten(upd)
        for leaf in flat:
            np.testing.assert_allclose(np.asarray(leaf), 0.0)

    def test_grad_clip(self):
        import jax.numpy as jnp
        tx = build_optimizer(TINY.train)
        params = {"w": jnp.ones((2,))}
        st = tx.init(params)
        big = {"w": jnp.asarray([300.0, 400.0])}
        upd, _ = tx.update(big, st, params)
        # clipped to norm 1 then adam normalizes; just check finite + nonzero
        assert np.all(np.isfinite(np.asarray(upd["w"])))
        assert np.abs(np.asarray(upd["w"])).max() > 0

    @pytest.mark.parametrize("bad_val", [np.nan, np.inf],
                             ids=["nan", "inf"])
    def test_guard_skips_whole_step(self, bad_val):
        """A non-finite grad leaves the Adam moments and counts untouched
        (reference on_after_backward skips the step, train.py:548-564)
        and increments the skip telemetry counter."""
        import jax.numpy as jnp
        tx = build_optimizer(TINY.train)
        params = {"feats_color": jnp.ones((4, 2)), "w": jnp.ones((2,))}
        st = tx.init(params)
        good = {"feats_color": jnp.full((4, 2), 0.5), "w": jnp.ones((2,))}
        _, st = tx.update(good, st, params)   # advance moments once
        bad = {"feats_color": jnp.full((4, 2), bad_val),
               "w": jnp.ones((2,))}
        upd, st2 = tx.update(bad, st, params)
        for leaf in jax.tree_util.tree_leaves(upd):
            np.testing.assert_allclose(np.asarray(leaf), 0.0)
        for a, b in zip(jax.tree_util.tree_leaves(st.inner_state),
                        jax.tree_util.tree_leaves(st2.inner_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(st2.notfinite_count) == 1
        # and a following finite step proceeds + resets the counter
        upd3, st3 = tx.update(good, st2, params)
        assert np.abs(np.asarray(upd3["w"])).max() > 0
        assert int(st3.notfinite_count) == 0

    def test_guard_matches_optax_chain_on_finite_grads(self):
        """finite_guarded_clip == chain(clip_by_global_norm,
        apply_if_finite(adam)) on finite gradients, step for step."""
        import jax.numpy as jnp
        import optax
        from spurfies_tpu.train.optim import finite_guarded_clip

        adam_a = optax.adam(1e-3)
        adam_b = optax.adam(1e-3)
        ours = finite_guarded_clip(adam_a, 1.0)
        ref = optax.apply_if_finite(
            optax.chain(optax.clip_by_global_norm(1.0), adam_b), 100
        )
        params = {"w": jnp.ones((8,)), "b": jnp.zeros((3,))}
        s_o, s_r = ours.init(params), ref.init(params)
        rng = np.random.default_rng(3)
        for i in range(5):
            g = {"w": jnp.asarray(rng.normal(size=8) * (10 ** (i - 2)),
                                  jnp.float32),
                 "b": jnp.asarray(rng.normal(size=3), jnp.float32)}
            u_o, s_o = ours.update(g, s_o, params)
            u_r, s_r = ref.update(g, s_r, params)
            for a, b in zip(jax.tree_util.tree_leaves(u_o),
                            jax.tree_util.tree_leaves(u_r)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6, atol=1e-9)


@pytest.mark.slow
def test_e2e_sphere_optimization():
    pts, cols, views = make_synthetic_scene(
        n_points=3000, n_views=3, img_res=(48, 48)
    )
    trainer = Trainer(TINY, pts, cols, views)

    metrics = []
    trainer.run(120, window=40,
                callback=lambda s, m: metrics.append((s, m)))

    first = metrics[0][1]
    last = metrics[-1][1]
    assert np.isfinite(last["loss"])
    assert last["rgb_loss"] < first["rgb_loss"], (
        f"rgb loss did not decrease: {first['rgb_loss']} -> "
        f"{last['rgb_loss']}"
    )
    assert int(trainer.state.step) == 120


def test_auto_ray_budget_calibration():
    """ray_budget_frac=-1: the Trainer measures the scene's occupancy
    fraction once and replaces the knob with a concrete (0, 1] value; the
    compacted step still optimizes."""
    import dataclasses

    pts, cols, views = make_synthetic_scene(
        n_points=3000, n_views=3, img_res=(48, 48)
    )
    cfg = dataclasses.replace(
        TINY, model=dataclasses.replace(TINY.model, ray_budget_frac=-1.0)
    )
    trainer = Trainer(cfg, pts, cols, views)
    frac = trainer.cfg.model.ray_budget_frac
    assert 0.0 < frac <= 1.0
    # the 48x48 synthetic sphere views have visible background, so the
    # calibrated budget should be meaningfully under dense
    assert frac < 1.0
    metrics = []
    trainer.run(40, window=20,
                callback=lambda s, m: metrics.append((s, m)))
    assert np.isfinite(metrics[-1][1]["loss"])


def test_render_skip_empty_matches_dense():
    """Empty-chunk skipping emits exactly what the dense renderer returns
    for background chunks (superset property of the fine bitmap)."""
    import dataclasses

    # small radius: the sphere covers only the middle rows, so the
    # 64-ray (2-row) chunks at the frame's top/bottom are all background
    pts, cols, views = make_synthetic_scene(
        n_points=2000, n_views=2, img_res=(32, 32), radius=0.2
    )
    cfg = dataclasses.replace(
        TINY,
        train=dataclasses.replace(TINY.train, num_pixels=64, eval_iters=1,
                                  render_chunk=64),
    )
    trainer = Trainer(cfg, pts, cols, views)
    trainer.run(5, window=5)

    from spurfies_tpu.train.trainer import (_rays_occupied_np,
                                            make_render_fn)
    uv = np.asarray(trainer.views["uv"])
    pose = trainer.views["pose"][0]
    intr = trainer.views["intrinsics"][0]
    key = jax.random.PRNGKey(3)

    # fixture sanity: the view must actually have at least one
    # all-background chunk for this test to bite
    occ = _rays_occupied_np(
        np.asarray(trainer.scene.occ_fine).reshape(-1), trainer.scene.spec,
        cfg.model.ray_sampler, uv, np.asarray(pose), np.asarray(intr))
    per_chunk = occ.reshape(-1, 64).any(axis=1)
    assert not per_chunk.all(), "fixture has no empty chunk; shrink chunk"

    out_skip = trainer.render_image(trainer.state.params, uv, pose, intr,
                                    key)
    dense_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, render_skip_empty=False)
    )
    render_dense = make_render_fn(dense_cfg)
    out_dense = render_dense(trainer.state.params, trainer.scene,
                             trainer.frozen, uv, pose, intr, key)
    for k in out_dense:
        np.testing.assert_allclose(
            np.asarray(out_skip[k]), np.asarray(out_dense[k]),
            atol=1e-6, err_msg=k,
        )


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    pts, cols, views = make_synthetic_scene(
        n_points=2000, n_views=2, img_res=(32, 32)
    )
    trainer = Trainer(TINY, pts, cols, views)
    trainer.run(5, window=5)
    path = str(tmp_path / "ckpt")
    trainer.save_checkpoint(path)

    t2 = Trainer(TINY, pts, cols, views, seed=123)
    t2.restore_checkpoint(path)
    assert int(t2.state.step) == 5
    a = np.asarray(trainer.state.params["feats_color"])
    b = np.asarray(t2.state.params["feats_color"])
    np.testing.assert_allclose(a, b)

    # restore must NOT force a train-window recompile: orbax arrays come
    # back committed, which keys a fresh pjit executable unless re-placed
    # (cost +1200 s on the 8-dev production dryrun before the fix).
    # `trainer` already holds a compiled window from run(5); restoring
    # into it and stepping must reuse that one executable.
    assert trainer.train_window._cache_size() == 1
    trainer.restore_checkpoint(path)
    trainer.run(5, window=5)        # same static window as the first run
    assert trainer.train_window._cache_size() == 1

    # restored optimizer state must carry the live Adam moments, not a
    # fresh init (count advanced past 0)
    import optax
    counts = [
        int(s.count) for s in jax.tree_util.tree_leaves(
            t2.state.opt_state,
            is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState),
        ) if isinstance(s, optax.ScaleByAdamState)
    ]
    assert counts and all(c == 5 for c in counts)


@pytest.mark.slow
def test_checkpoint_restore_pre_opt_state_format(tmp_path):
    """A round-1-format checkpoint (no opt_state) restores with a fresh
    optimizer — detected from checkpoint metadata, not by swallowing
    errors (VERDICT r3 weak #5)."""
    import orbax.checkpoint as ocp

    pts, cols, views = make_synthetic_scene(
        n_points=1500, n_views=2, img_res=(24, 24)
    )
    trainer = Trainer(TINY, pts, cols, views)
    trainer.run(2, window=2)
    path = str(tmp_path / "old_ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {
        "params": trainer.state.params,
        "frozen": trainer.frozen,
        "step": trainer.state.step,
    }, force=True)
    ckptr.wait_until_finished()

    t2 = Trainer(TINY, pts, cols, views, seed=99)
    t2.restore_checkpoint(path)
    assert int(t2.state.step) == 2
    np.testing.assert_allclose(
        np.asarray(trainer.state.params["feats_color"]),
        np.asarray(t2.state.params["feats_color"]),
    )


@pytest.mark.slow
def test_checkpoint_restore_bad_opt_state_raises(tmp_path):
    """A checkpoint whose opt_state EXISTS but has the wrong structure
    (saved by a different optimizer, or damaged) must RAISE on restore —
    the old blanket except silently re-initialized the optimizer for any
    failure whatsoever (VERDICT r3 weak #5)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    pts, cols, views = make_synthetic_scene(
        n_points=1500, n_views=2, img_res=(24, 24)
    )
    trainer = Trainer(TINY, pts, cols, views)
    trainer.run(1, window=1)
    path = str(tmp_path / "bad_ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {
        "params": trainer.state.params,
        "frozen": trainer.frozen,
        "step": trainer.state.step,
        "opt_state": {"bogus": jnp.zeros((3,))},
    }, force=True)
    ckptr.wait_until_finished()

    t2 = Trainer(TINY, pts, cols, views, seed=99)
    with pytest.raises(Exception):
        t2.restore_checkpoint(path)


def test_beyond_reference_losses_in_train_step():
    """cloud_anchor + fd_eikonal active in the full jitted scanned step:
    losses finite, parts reported, training proceeds."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY,
        loss=dataclasses.replace(TINY.loss, cloud_anchor_weight=0.1,
                                 fd_eikonal_weight=0.1),
        train=dataclasses.replace(TINY.train, num_pixels=64),
    )
    pts, cols, views = make_synthetic_scene(
        n_points=1500, n_views=2, img_res=(24, 24)
    )
    trainer = Trainer(cfg, pts, cols, views)
    parts_seen = []
    trainer.run(2, window=2, callback=lambda s, m: parts_seen.append(m))
    m = parts_seen[-1]
    for key in ("cloud_anchor_loss", "fd_eikonal_loss", "loss"):
        assert key in m and np.isfinite(float(m[key])), key
    assert float(m["cloud_anchor_loss"]) >= 0
    assert float(m["fd_eikonal_loss"]) >= 0


def test_scan_unroll_equivalence():
    """train.scan_unroll only changes the lax.scan loop structure (carry
    plumbing amortization) — the trained parameters must be identical to
    the unroll=1 window."""
    import dataclasses

    pts, cols, views = make_synthetic_scene(
        n_points=2000, n_views=2, img_res=(32, 32)
    )
    states = []
    for unroll in (1, 4):
        cfg = dataclasses.replace(
            TINY, train=dataclasses.replace(TINY.train, scan_unroll=unroll)
        )
        trainer = Trainer(cfg, pts, cols, views)
        trainer.run(8, window=8)
        states.append(trainer.state)
    a, b = states
    assert int(a.step) == int(b.step) == 8
    la = np.asarray(a.params["feats_geometry"])
    lb = np.asarray(b.params["feats_geometry"])
    np.testing.assert_allclose(la, lb, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.params["beta"]),
                               np.asarray(b.params["beta"]), atol=1e-7)
