"""Multi-chip ray sharding over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY §2.2: no distributed components
whatsoever) — parallelism is a new capability of this rebuild.  Design per
SURVEY §5/§7: the per-scene model is tiny (latents + MLPs, a few MB), so
parameters are REPLICATED and rays are SHARDED along a 1-D ``data`` mesh
axis; XLA inserts the gradient all-reduce (psum over ICI) when the jitted
loss reduces over the sharded ray axis.  The PRODUCT integration lives in
train.trainer (cfg.train.data_parallel builds the mesh; the sampled
batch's ray axis gets a sharding constraint inside the scanned step);
multi-host fleets run independent scenes via cli.fleet (matching the
reference's scene-at-a-time loop, runner.py:64-65).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), ("data",))


def shard_views(views: dict, mesh: Mesh) -> dict:
    """Replicate the (small) view stacks across the mesh."""
    rep = NamedSharding(mesh, P())
    return {k: jax.device_put(jnp.asarray(v), rep) for k, v in views.items()}
