"""Per-scene optimization driver (the reference VolOpt, train.py:21-564).

TPU redesign:
  * all train views live on device; view + pixel sampling happens INSIDE the
    jitted step (the reference re-indexes on host and H2D-copies every step,
    train.py:334-343).
  * ``lax.scan`` over an inner step window keeps the host out of the hot loop
    entirely — the north-star metric is rays/sec/chip (BASELINE.md).
  * optional ray sharding over a device mesh (parallel/mesh.py): params
    replicated, rays split, gradients psum'd by jit under shardings.
  * checkpoints via orbax (reference: torch .pth, train.py:293-328).
"""

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spurfies_tpu.config import Config
from spurfies_tpu.core.metrics import psnr as psnr_fn
from spurfies_tpu.model.losses import total_loss
from spurfies_tpu.model.networks import init_model_params
from spurfies_tpu.model.neural_points import build_scene
from spurfies_tpu.model.renderer import (
    cloud_anchor_loss,
    fd_eikonal_loss,
    pseudo_sdf_loss,
    render_rays,
    tv_loss,
)
from spurfies_tpu.train.optim import build_optimizer


def _calibrate_ray_budget(scene, views, cfg: Config):
    """Measure per-view occupancy over the train views (fine bitmap).

    Returns ``(ray_frac, probe_frac)``:
      * ray_frac — worst-view RAY occupancy (any of the n_samples_eval
        uniform z's lands in an occupied fine cell) plus a 4-sigma
        binomial margin for num_pixels-ray batch sampling noise, capped
        at 1.0 (dense).
      * probe_frac — worst-view mean per-ray SAMPLE occupancy over the
        ray population the ray budget keeps (occupied rays when the ray
        budget is active, all rays otherwise), plus 4x the standard error
        of that mean across a batch of kept rays.  This is exactly the
        fraction of the sampler's uniform probe points that can have
        neighbors, so it bounds field.sdf_probe's budget (VERDICT r3 #2).

    Overflow past the margins (~3e-5 of steps) drops a few occupied
    rays/samples from that batch — excluded like misses, harmless.  Pure
    numpy (one bitmap readback) so the ``-1`` defaults add no XLA compile
    to Trainer construction."""
    occ0 = np.asarray(scene.occ_fine).reshape(-1)          # padded flat [F']
    uv_all = np.asarray(views["uv"], dtype=np.float32)
    n_px = uv_all.shape[0]
    sub = np.random.RandomState(0).choice(
        n_px, size=min(8192, n_px), replace=False
    )
    uv = uv_all[sub]
    worst_ray = 0.0
    worst_probe = 0.0
    ray_budget_on = 0 < cfg.model.ray_budget_frac < 1 or (
        cfg.model.ray_budget_frac < 0
    )
    for v in range(np.asarray(views["pose"]).shape[0]):
        samp = _samples_occupied_np(
            occ0, scene.spec, cfg.model.ray_sampler, uv,
            np.asarray(views["pose"][v]), np.asarray(views["intrinsics"][v])
        )                                                  # [P, Z] bool
        ray_occ = samp.any(axis=1)                         # [P]
        worst_ray = max(worst_ray, float(ray_occ.mean()))
        per_ray = samp.mean(axis=1)                        # [P] in [0, 1]
        kept = per_ray[ray_occ] if ray_budget_on else per_ray
        if kept.size:
            n_kept = max(
                int(cfg.train.num_pixels
                    * (float(ray_occ.mean()) if ray_budget_on else 1.0)),
                1,
            )
            se = float(kept.std()) / np.sqrt(n_kept)
            worst_probe = max(worst_probe, float(kept.mean()) + 4.0 * se)
    sigma = np.sqrt(worst_ray * (1.0 - worst_ray)
                    / max(cfg.train.num_pixels, 1))
    return min(1.0, worst_ray + 4.0 * sigma), min(1.0, worst_probe)


def _rays_occupied_np(occ0, spec, scfg, uv, pose, K):
    """Pure-numpy per-ray fine-bitmap occupancy (the host-side twin of
    renderer._coarse_ray_occupancy): does any of the n_samples_eval
    uniform z samples land in an occupied fine cell?

    Shared by the auto ray-budget calibration and the eval renderer's
    empty-chunk skip.  Returns ``[P]`` bool."""
    return _samples_occupied_np(occ0, spec, scfg, uv, pose, K).any(axis=1)


def _samples_occupied_np(occ0, spec, scfg, uv, pose, K):
    """Per-(ray, uniform z sample) fine-bitmap occupancy, ``[P, Z]`` bool
    — the sample-granular form behind :func:`_rays_occupied_np`, also
    used to calibrate the sampler-probe budget."""
    from spurfies_tpu.ops.voxel_grid import fine_spec

    fs = fine_spec(spec)
    dims = np.asarray(fs.dims)
    lo = np.asarray(fs.lo, dtype=np.float32)
    pose = np.asarray(pose, dtype=np.float32)
    K = np.asarray(K, dtype=np.float32)
    uv = np.asarray(uv, dtype=np.float32)
    z = np.linspace(scfg.near, scfg.far, scfg.n_samples_eval,
                    dtype=np.float32)

    fx, fy = K[0, 0], K[1, 1]
    cx, cy, sk = K[0, 2], K[1, 2], K[0, 1]
    x, y = uv[:, 0], uv[:, 1]
    # pinhole+skew lift at depth 1 (core/cameras.lift)
    xl = (x - cx + cy * sk / fy - sk * y / fy) / fx
    yl = (y - cy) / fy
    d = np.stack([xl, yl, np.ones_like(xl)], -1) @ pose[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = pose[:3, 3] + z[None, :, None] * d[:, None, :]      # [P, Z, 3]
    ijk = np.floor((pts - lo) / np.float32(fs.cell_size)).astype(np.int64)
    in_r = np.all((ijk >= 0) & (ijk < dims), axis=-1)
    ijk = np.clip(ijk, 0, dims - 1)
    lin = (ijk[..., 0] * dims[1] + ijk[..., 1]) * dims[2] + ijk[..., 2]
    return (occ0[lin] != 0) & in_r


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    params: dict          # trainable params (latents + nets + beta)
    opt_state: object
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_train_step(cfg: Config, tx, use_local: bool = False, mesh=None):
    """Build the jitted train step.

    Everything data-sized (scene tables, view stacks, frozen nets, MVS
    features) is a traced ARGUMENT, never a closure constant — baked-in
    constants of tens of MB make XLA compiles take minutes.

    With ``mesh`` (cfg.train.data_parallel > 1), the sampled batch's ray
    axis gets a sharding constraint along mesh axis ``data`` INSIDE the
    jitted (scanned) step: params/scene replicate, rays split, and XLA
    inserts the gradient all-reduce over ICI.  Pixel sampling is keyed
    identically on every chip, so single- and multi-chip runs see the same
    batches (tests/test_parallel.py equivalence).  The reference is strictly
    single-GPU (SURVEY §2.2) — this axis is new capability.

    The returned window fn signature:
      ``train_window(state, bundle, key, n_steps)`` where bundle =
      {"scene": SceneState, "frozen": ..., "views": {...},
       "local": optional ctx dict}.
    """
    mcfg = cfg.model
    lcfg = cfg.loss
    n_pix = cfg.train.num_pixels
    fast = cfg.train.fast_iters

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def constrain_batch(batch):
            cs = jax.lax.with_sharding_constraint
            batch["inputs"]["uv"] = cs(
                batch["inputs"]["uv"], NamedSharding(mesh, P(None, "data"))
            )
            batch["gt"]["rgb"] = cs(
                batch["gt"]["rgb"], NamedSharding(mesh, P("data"))
            )
            batch["gt"]["mask"] = cs(
                batch["gt"]["mask"], NamedSharding(mesh, P("data"))
            )
            return batch
    else:
        def constrain_batch(batch):
            return batch

    def loss_fn(tp, bundle, batch, key, step=None):
        scene = bundle["scene"]
        params = {"frozen": bundle["frozen"], "train": tp}
        out = render_rays(params, scene, batch["inputs"], key, mcfg,
                          train=True, iters=fast)
        if not mcfg.entangled:  # legacy ablation trains rgb+eik+mask only
            out["tv_loss"] = tv_loss(params, scene)
            out["pseudo_pts_loss"] = pseudo_sdf_loss(params, scene, out,
                                                     mcfg)
            if lcfg.cloud_anchor_weight > 0:
                out["cloud_anchor_loss"] = cloud_anchor_loss(
                    params, scene, jax.random.fold_in(key, 7), mcfg
                )
            if lcfg.fd_eikonal_weight > 0:
                out["fd_eikonal_loss"] = fd_eikonal_loss(
                    params, scene, out, jax.random.fold_in(key, 8), mcfg,
                    n_sub=lcfg.fd_eikonal_points,
                )
        if use_local:
            from spurfies_tpu.model.local_loss import (
                find_surface_depth,
                local_feature_loss,
            )
            local_ctx = bundle["local"]
            d_surf, surf_mask = find_surface_depth(
                out["sdf"], out["z_sel"], out["valid_pt"]
            )
            surface = out["cam_loc"] + out["ray_dirs"] * d_surf[:, None]
            v = batch["view"]
            out["local_loss"] = local_feature_loss(
                surface, surf_mask & out["ray_mask"],
                local_ctx["feats"][v],
                local_ctx["feats"][local_ctx["src"][v]],
                local_ctx["cams"][v],
                local_ctx["cams"][local_ctx["src"][v]],
                local_ctx["size"], local_ctx["center"],
            )
        loss, parts = total_loss(out, batch["gt"], lcfg, step=step)
        parts["psnr"] = psnr_fn(
            out["rgb_values"], batch["gt"]["rgb"].reshape(-1, 3)
        )
        # budget telemetry: 1.0 on steps where occupied rays (or occupied
        # sampler-probe points) were dropped by a calibrated budget
        # (window sums reported by run())
        parts["ray_overflow"] = out["ray_budget_overflow"].astype(
            jnp.float32
        )
        parts["probe_overflow"] = out["probe_budget_overflow"].astype(
            jnp.float32
        )
        return loss, parts

    def sample_batch(views, key):
        n_views = views["rgb"].shape[0]
        total_px = views["uv"].shape[0]
        kv, kp = jax.random.split(key)
        v = jax.random.randint(kv, (), 0, n_views)
        pix = jax.random.choice(kp, total_px, (n_pix,), replace=False)
        inputs = {
            "uv": views["uv"][pix][None],
            "pose": views["pose"][v][None],
            "intrinsics": views["intrinsics"][v][None],
        }
        gt = {
            "rgb": views["rgb"][v][pix],
            "mask": views["mask"][v][pix],
        }
        return {"inputs": inputs, "gt": gt, "view": v}

    def train_step(bundle, state: TrainState, key):
        batch = sample_batch(bundle["views"], jax.random.fold_in(key, 0))
        batch = constrain_batch(batch)
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, bundle, batch, jax.random.fold_in(key, 1),
            state.step,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # non-finite-gradient skips (finite_guarded_clip): surface the
        # consecutive-skip counter so a persistently-NaN run is visible in
        # the window metrics instead of silently spinning (ADVICE r4)
        parts["notfinite"] = getattr(
            opt_state, "notfinite_count", jnp.asarray(0)
        ).astype(jnp.float32)
        return TrainState(params, opt_state, state.step + 1), parts

    # run() reads only the LAST value of each metric (plus window sums of
    # the rare-event counters), so metrics ride the scan CARRY instead of
    # stacked ys — the per-step dynamic_update_slice stacking showed up as
    # ~1.3 ms/step of scan-machinery ops at window=50 (trace r5)
    _SUM_KEYS = ("ray_overflow", "probe_overflow")

    @partial(jax.jit, static_argnames=("n_steps",))
    def train_window(state: TrainState, bundle, key, n_steps: int):
        """n_steps of training fully on device."""
        keys = jax.random.split(key, n_steps)
        _, parts_sd = jax.eval_shape(train_step, bundle, state, keys[0])
        acc0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), parts_sd)

        def body(carry, k):
            s, acc = carry
            s2, parts = train_step(bundle, s, k)
            acc = {kk: (acc[kk] + v if kk in _SUM_KEYS else v)
                   for kk, v in parts.items()}
            return (s2, acc), None

        (state, acc), _ = jax.lax.scan(
            body, (state, acc0), keys,
            unroll=min(cfg.train.scan_unroll, n_steps),
        )
        return state, acc

    return train_window, train_step


def make_render_fn(cfg: Config, chunk: int | None = None, mesh=None,
                   iters: int | None = None):
    """Full-image eval renderer (reference render_step, train.py:399-472).

    Renders in ``chunk``-ray slices under one jit; returns stacked dense
    outputs for PSNR / plotting.  scene/frozen are traced args (see
    make_train_step note on closure constants).  With ``mesh``, each
    chunk's rays are sharded across the mesh (multi-chip eval render).

    The chunk ADAPTS DOWN to the image: a 48x64 validation render is padded
    to the next 128*dp multiple, not to the full TPU-tuned chunk (which cost
    28x compute on the round-2 dryrun and blew up its sharded CPU compile).
    """
    mcfg = cfg.model
    if chunk is None:
        chunk = cfg.train.render_chunk
    if iters is None:
        iters = cfg.train.eval_iters or mcfg.ray_sampler.max_total_iters
    dp = mesh.devices.size if mesh is not None else 1
    align = 128 * dp  # lane-width multiple, divisible across the mesh

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def render_chunk(tp, scene, frozen, inputs, key):
        if mesh is not None:
            inputs = dict(inputs)
            inputs["uv"] = jax.lax.with_sharding_constraint(
                inputs["uv"], NamedSharding(mesh, P(None, "data"))
            )
        params = {"frozen": frozen, "train": tp}
        out = render_rays(params, scene, inputs, key, mcfg, train=False,
                          iters=iters)
        # no weights in the eval readback: nothing downstream consumes
        # them and the [chunk, S] plane was 43% of the per-chunk D2H
        # transfer — which measured as ~7 s/image of host-side wall over
        # the tunneled device (r4 eval profile)
        keep = ("rgb_values", "depth_values", "normal_map", "acc",
                "ray_mask")
        return {k: out[k] for k in keep}

    @jax.jit
    def occ_chunk(scene, inputs):
        """Per-ray fine-bitmap occupancy on DEVICE (the host numpy scan
        measured ~7 s/image at 384x512; this is one [T, n_samples_eval]
        int8 gather, ~ms, and one [T]-bool readback)."""
        from spurfies_tpu.core.cameras import get_camera_params
        from spurfies_tpu.model.renderer import _coarse_ray_occupancy
        ray_dirs_b, cam_loc_b = get_camera_params(
            inputs["uv"], inputs["pose"], inputs["intrinsics"]
        )
        ray_dirs = ray_dirs_b.reshape(-1, 3)
        cam_loc = jnp.broadcast_to(
            cam_loc_b[:, None, :], ray_dirs_b.shape
        ).reshape(-1, 3)
        return _coarse_ray_occupancy(cam_loc, ray_dirs, scene,
                                     mcfg.ray_sampler)

    def _empty_chunk(eff):
        """Host-side outputs for a chunk whose rays all miss — identical
        to what the renderer emits for miss rays (renderer.py miss
        defaults; white_bkgd composites bg onto zero-acc rays)."""
        rgb = np.zeros((eff, 3), np.float32)
        if mcfg.white_bkgd:
            rgb[:] = np.asarray(mcfg.bg_color, np.float32)
        return {
            "rgb_values": rgb,
            "depth_values": np.ones((eff, 1), np.float32),
            "normal_map": np.zeros((eff, 3), np.float32),
            "acc": np.zeros((eff, 1), np.float32),
            "ray_mask": np.zeros((eff,), bool),
        }

    def render_image(tp, scene, frozen, uv, pose, intrinsics, key):
        n = uv.shape[0]
        eff = min(chunk, -(-n // align) * align)
        pad = (-n) % eff
        uv_p = np.pad(np.asarray(uv), ((0, pad), (0, 0)))

        def run_chunk(uv_chunk):
            inputs = {
                "uv": jnp.asarray(uv_chunk)[None],
                "pose": pose[None],
                "intrinsics": intrinsics[None],
            }
            return render_chunk(tp, scene, frozen, inputs, key)

        # PER-RAY COMPACTION (eval-side analogue of the train ray budget,
        # VERDICT r3 #6): the fine-bitmap occupancy test runs on device
        # per eff-slice, the OCCUPIED rays are gathered on the host
        # (exact, data-independent shapes: every render call is eff-wide)
        # and only those hit the renderer; background rays get the exact
        # miss defaults (superset property — same soundness and the same
        # exact-match test as the r3 per-chunk skip, but a full DTU frame
        # is ~40-70% background even inside occupied chunks).
        # cfg.train.render_skip_empty=false restores the dense loop.
        # All chunk calls are DISPATCHED before any readback: a per-chunk
        # np.asarray stalls the device on the host scatter + tunnel
        # transfer every 4096 rays (the r4 full-image eval spent more
        # wall-clock serialized on readbacks than on device compute).
        if cfg.train.render_skip_empty and scene.occ_fine is not None:
            # one whole-image occupancy call (one dispatch + one [n]-bool
            # readback; shapes are constant per dataset so this compiles
            # once)
            occ = np.asarray(occ_chunk(scene, {
                "uv": jnp.asarray(uv_p)[None],
                "pose": pose[None],
                "intrinsics": intrinsics[None],
            }))[:n]
            out = _empty_chunk(n)
            sel = np.nonzero(occ)[0]
            if len(sel) == 0:
                return out
            pad_s = (-len(sel)) % eff
            sel_p = np.concatenate(
                [sel, np.zeros(pad_s, dtype=sel.dtype)]
            )
            outs = [run_chunk(uv_p[sel_p[i:i + eff]])
                    for i in range(0, len(sel_p), eff)]
            for i, o in zip(range(0, len(sel_p), eff), outs):
                keep = min(eff, len(sel) - i)
                for k in out:
                    out[k][sel[i:i + keep]] = np.asarray(o[k])[:keep]
            return out

        outs = [
            run_chunk(uv_p[i:i + eff]) for i in range(0, n + pad, eff)
        ]
        merged = {
            k: np.concatenate([np.asarray(o[k]) for o in outs])[:n]
            for k in outs[0]
        }
        return merged

    return render_image


class Trainer:
    """Host-side driver: builds scene/params/optimizer, runs windows of
    device-side steps, handles eval renders + orbax checkpoints."""

    def __init__(self, cfg: Config, point_cloud, colors, views,
                 seed: int | None = None, local_bundle=None):
        from spurfies_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        self.cfg = cfg
        self.local_bundle = local_bundle
        from spurfies_tpu.model.field import set_fused_agg, set_scatter_mode
        set_scatter_mode(cfg.model.scatter_mode)
        set_fused_agg(cfg.model.fused_agg)
        seed = cfg.train.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        k_scene, k_params, self.key = jax.random.split(key, 3)

        self.scene, latents = build_scene(k_scene, point_cloud, cfg.model,
                                          colors)
        if cfg.model.ray_budget_frac < 0 or cfg.model.probe_budget_frac < 0:
            # auto budgets: measure the scene's fine-bitmap occupancy over
            # the train views once; 4-sigma sampling margins make batches
            # essentially never overflow (a full-frame scene calibrates to
            # 1.0 = dense, no harm)
            ray_frac, probe_frac = _calibrate_ray_budget(self.scene, views,
                                                         cfg)
            updates = {}
            if cfg.model.ray_budget_frac < 0:
                updates["ray_budget_frac"] = ray_frac
            if cfg.model.probe_budget_frac < 0:
                updates["probe_budget_frac"] = probe_frac
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, **updates)
            )
            self.cfg = cfg
        params = init_model_params(k_params, cfg.model)
        params["train"].update(latents)
        self.frozen = params["frozen"]

        # optional ray-sharding mesh (train.data_parallel chips; SURVEY §5
        # "distributed backend" — params replicated, rays split over ICI)
        self.mesh = None
        dp = cfg.train.data_parallel
        if dp > 1:
            from spurfies_tpu.parallel.mesh import make_mesh
            if len(jax.devices()) < dp:
                raise ValueError(
                    f"train.data_parallel={dp} but only "
                    f"{len(jax.devices())} devices visible"
                )
            if cfg.train.num_pixels % dp:
                raise ValueError(
                    f"train.num_pixels={cfg.train.num_pixels} must be a "
                    f"multiple of data_parallel={dp}"
                )
            self.mesh = make_mesh(dp)

        self.views = {k: jnp.asarray(v) for k, v in views.items()}
        self.tx = build_optimizer(cfg.train)
        opt_state = self.tx.init(params["train"])
        self.state = TrainState(params["train"], opt_state,
                                jnp.asarray(0, dtype=jnp.int32))
        if self.mesh is not None:
            # replicate everything the step closes over; the in-step
            # constraint splits the ray axis
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            self.views = jax.device_put(self.views, rep)
            self.scene = jax.device_put(self.scene, rep)
            self.frozen = jax.device_put(self.frozen, rep)
            self.state = jax.device_put(self.state, rep)
        use_local = (local_bundle is not None
                     and cfg.loss.local_weight > 0)
        self.local_ctx = None
        if use_local:
            from spurfies_tpu.data.mvs_local import SRC_MAP
            n_views = self.views["rgb"].shape[0]
            self.local_ctx = {
                "feats": jnp.asarray(local_bundle.feats),
                "cams": jnp.asarray(local_bundle.cams_hd),
                "src": jnp.asarray(
                    [SRC_MAP[i] for i in range(n_views)], dtype=jnp.int32
                ),
                "size": jnp.asarray(local_bundle.size),
                "center": jnp.asarray(local_bundle.center),
            }
        self.train_window, self.train_step = make_train_step(
            cfg, self.tx, use_local=use_local, mesh=self.mesh
        )
        self._render = make_render_fn(cfg, mesh=self.mesh)

    @property
    def bundle(self):
        b = {"scene": self.scene, "frozen": self.frozen,
             "views": self.views}
        if self.local_ctx is not None:
            b["local"] = self.local_ctx
        return b

    def render_image(self, tp, uv, pose, intrinsics, key):
        return self._render(tp, self.scene, self.frozen, uv, pose,
                            intrinsics, key)

    def _replicate(self, tree):
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(tree, NamedSharding(self.mesh, P()))

    def _place_like_step_output(self, tree):
        """Re-place restored arrays so they key the SAME jit executable as
        train-window outputs (uncommitted; mesh-replicated under dp).

        orbax restores COMMITTED arrays, and committed-ness is part of the
        pjit executable cache key: feeding them straight into the train
        window forced a full recompile of the step after every resume
        (12 s tiny-CPU repro; +1200 s on the 8-device production dryrun,
        r4).  Neither an identity jit nor an in-jit copy un-commits (jit
        outputs inherit committed-ness from inputs), so the restored tree
        takes a host roundtrip — restore-time only, a few MB."""
        tree = jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, tree)
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P())
        return jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t),
                       out_shardings=jax.tree_util.tree_map(
                           lambda _: sh, tree))(tree)

    def load_frozen(self, frozen_params):
        """Install pretrained local-prior weights (reference train.py:124-143).

        frozen is a traced arg of the jitted step, so this does NOT
        recompile."""
        self.frozen = self._place_like_step_output(
            jax.tree_util.tree_map(jnp.asarray, frozen_params)
        )

    def run(self, n_steps: int, window: int = 100, callback=None):
        """Run n_steps; callback(step, metrics) per window."""
        done = 0
        while done < n_steps:
            w = min(window, n_steps - done)
            self.key, sub = jax.random.split(self.key)
            self.state, parts = self.train_window(self.state, self.bundle,
                                                  sub, w)
            done += w
            if "notfinite" in parts:
                # finite_guarded_clip zeroes updates on non-finite grads;
                # a whole window of consecutive skips means the run is
                # spinning without learning — fail loudly (the reference's
                # on_after_backward skip has trainer-level visibility via
                # its loss logs; ADVICE r4 backstop)
                nf = np.asarray(parts["notfinite"])
                consec = float(nf if nf.ndim == 0 else nf[-1])
                if consec >= max(w, 100):
                    raise RuntimeError(
                        f"{int(consec)} consecutive non-finite-gradient "
                        f"steps at step {int(self.state.step)}; aborting "
                        "(every update in the last window was skipped)"
                    )
            if callback is not None:
                # train_window reports each metric's last-step value, with
                # the overflow counters pre-summed over the window (rare
                # single-step events a last-step read would miss)
                last = {}
                for k, v in parts.items():
                    v = np.asarray(v)
                    last[k] = v if v.ndim == 0 else v[-1]
                callback(int(self.state.step), last)
        return self.state

    # ---- checkpointing (orbax) ------------------------------------------
    # The reference persists both ModelParameters and OptimizerParameters
    # (train.py:293-328); we store params+frozen+step+opt_state together.
    def save_checkpoint(self, path: str):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        payload = {
            "params": self.state.params,
            "frozen": self.frozen,
            "step": self.state.step,
            "opt_state": self.state.opt_state,
        }
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    def restore_checkpoint(self, path: str):
        """Restore params+frozen+step(+opt_state) saved by save_checkpoint.

        Pre-opt-state checkpoints (the round-1 format) restore with a
        freshly initialized optimizer — detected EXPLICITLY from the
        checkpoint's metadata tree, not by swallowing restore errors: a
        genuinely corrupt checkpoint must raise, not silently restore
        params-only (VERDICT r3 weak #5)."""
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": self.state.params,
            "frozen": self.frozen,
            "step": self.state.step,
            "opt_state": self.state.opt_state,
        }
        has_opt = self._ckpt_has_compatible_opt_state(ckptr, path)
        if not has_opt:
            target.pop("opt_state")
        restored = ckptr.restore(path, target)
        opt_state = (restored["opt_state"] if has_opt
                     else self.tx.init(restored["params"]))
        self.frozen = restored["frozen"]
        self.state = self._place_like_step_output(
            TrainState(restored["params"], opt_state, restored["step"])
        )
        self.load_frozen(self.frozen)

    def _ckpt_has_compatible_opt_state(self, ckptr, path: str) -> bool:
        """True iff the checkpoint stores an opt_state whose STRUCTURE
        matches the current optimizer.

        Three generations of checkpoints exist: round-1 (no opt_state),
        pre-r4 (ApplyIfFiniteState wrapper) and current (FiniteGuardState).
        A structure mismatch must degrade to a fresh-optimizer restore
        with a warning — not raise (ADVICE r4) — while a genuinely corrupt
        checkpoint still raises from the restore itself.  The metadata
        probe is also guarded against orbax version drift (item_metadata
        None / non-dict metadata objects): it falls back to listing the
        checkpoint's subdirectories.
        """
        import warnings

        try:
            meta = ckptr.metadata(path)
            tree = getattr(meta, "item_metadata", None)
            if tree is None:
                tree = meta
            has_opt = "opt_state" in tree
            opt_meta = tree["opt_state"] if has_opt else None
        except (TypeError, KeyError, AttributeError):
            has_opt = os.path.isdir(os.path.join(path, "opt_state"))
            opt_meta = ...   # unknown structure: trust + let restore check
        if not has_opt:
            return False
        if opt_meta is not None and opt_meta is not ...:
            # structural compatibility: compare the flattened key paths of
            # the stored opt_state against the live optimizer's.  Orbax
            # metadata mirrors the saved pytree as nested dicts (NamedTuple
            # fields become dict keys, masked None leaves become entries
            # with value_type='None'); the live tree uses attribute paths
            # and hides MaskedNode/None — normalize both to name tuples
            # and drop the None placeholders before comparing.
            def _names(kp):
                out = []
                for e in kp:
                    for attr in ("key", "name", "idx"):
                        if hasattr(e, attr):
                            out.append(str(getattr(e, attr)))
                            break
                    else:
                        out.append(str(e))
                return tuple(out)

            def key_set(t, drop_none_entries):
                flat = jax.tree_util.tree_flatten_with_path(t)[0]
                out = set()
                for kp, leaf in flat:
                    if (drop_none_entries
                            and getattr(leaf, "value_type", None)
                            in ("None", "NoneType")):
                        continue
                    out.add(_names(kp))
                return out

            try:
                stored = key_set(opt_meta, True)
                live = key_set(self.state.opt_state, False)
            except Exception:
                return True   # metadata not tree-like; let restore decide
            if stored != live:
                warnings.warn(
                    "checkpoint opt_state structure does not match the "
                    "current optimizer (saved by an older revision?); "
                    "restoring params only with a fresh optimizer state",
                    stacklevel=3,
                )
                return False
        return True
