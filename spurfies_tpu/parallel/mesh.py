"""Multi-chip ray sharding over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY §2.2: no distributed components
whatsoever) — parallelism is a new capability of this rebuild.  Design per
SURVEY §5/§7: the per-scene model is tiny (latents + MLPs, a few MB), so
parameters are REPLICATED and rays are SHARDED along a 1-D ``data`` mesh
axis; XLA inserts the gradient all-reduce (psum over ICI) when the jitted
loss reduces over the sharded ray axis.  Multi-host fleets run independent
scenes (matching the reference's scene-at-a-time loop, runner.py:64-65).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spurfies_tpu.config import Config
from spurfies_tpu.core.metrics import psnr as psnr_fn
from spurfies_tpu.model.losses import total_loss
from spurfies_tpu.model.renderer import (
    pseudo_sdf_loss,
    render_rays,
    tv_loss,
)
from spurfies_tpu.train.trainer import TrainState


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), ("data",))


def shard_views(views: dict, mesh: Mesh) -> dict:
    """Replicate the (small) view stacks across the mesh."""
    rep = NamedSharding(mesh, P())
    return {k: jax.device_put(jnp.asarray(v), rep) for k, v in views.items()}


def make_sharded_train_step(cfg: Config, scene, frozen, tx, mesh: Mesh):
    """Jitted train step with rays sharded over mesh axis 'data'.

    The batch's ray axis is annotated with a sharding constraint; everything
    else (params, scene tables, optimizer state) is replicated.  Gradient
    cross-chip reduction is inserted by XLA — no hand-written collectives in
    the hot path (they ride ICI).  scene/frozen are traced args of the
    jitted step (replicated), not closure constants.
    """
    mcfg, lcfg = cfg.model, cfg.loss
    fast = cfg.train.fast_iters
    ray_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def constrain(batch):
        return {
            "inputs": {
                "uv": jax.lax.with_sharding_constraint(
                    batch["inputs"]["uv"],
                    NamedSharding(mesh, P(None, "data")),
                ),
                "pose": batch["inputs"]["pose"],
                "intrinsics": batch["inputs"]["intrinsics"],
            },
            "gt": {
                "rgb": jax.lax.with_sharding_constraint(
                    batch["gt"]["rgb"], ray_sharding
                ),
                "mask": jax.lax.with_sharding_constraint(
                    batch["gt"]["mask"], ray_sharding
                ),
            },
        }

    def loss_fn(tp, ctx, batch, key):
        params = {"frozen": ctx["frozen"], "train": tp}
        out = render_rays(params, ctx["scene"], batch["inputs"], key, mcfg,
                          train=True, iters=fast)
        out["tv_loss"] = tv_loss(params, ctx["scene"])
        out["pseudo_pts_loss"] = pseudo_sdf_loss(params, ctx["scene"], out,
                                                 mcfg)
        loss, parts = total_loss(out, batch["gt"], lcfg)
        parts["psnr"] = psnr_fn(
            out["rgb_values"], batch["gt"]["rgb"].reshape(-1, 3)
        )
        return loss, parts

    rep_ctx = jax.device_put({"scene": scene, "frozen": frozen}, rep)

    @partial(jax.jit, out_shardings=None)
    def _step(state: TrainState, ctx, batch, key):
        batch = constrain(batch)
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, ctx, batch, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), parts

    def step(state, batch, key):
        return _step(state, rep_ctx, batch, key)

    def place_batch(batch):
        return {
            "inputs": {
                "uv": jax.device_put(
                    batch["inputs"]["uv"],
                    NamedSharding(mesh, P(None, "data")),
                ),
                "pose": jax.device_put(batch["inputs"]["pose"], rep),
                "intrinsics": jax.device_put(
                    batch["inputs"]["intrinsics"], rep
                ),
            },
            "gt": {
                "rgb": jax.device_put(batch["gt"]["rgb"], ray_sharding),
                "mask": jax.device_put(batch["gt"]["mask"], ray_sharding),
            },
        }

    return step, place_batch
