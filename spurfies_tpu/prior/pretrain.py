"""Local-geometry-prior pretraining (reproduces ``ckpt/local_prior.pt``).

Recipe (designed from the paper's description — SURVEY §7 step 10; the
reference repo ships only the result): jointly train the shared SDF decoder
(F_geometry + T) and per-shape, per-point 32-dim geometry latents so that
the RBF-interpolated neighborhood SDF matches ground truth near each
shape's surface.  Losses: SDF L1 + eikonal + latent L2.

After pretraining, :func:`frozen_params` yields the decoder in exactly the
format ``Trainer.load_frozen`` expects; per-scene optimization then fits
fresh latents against the frozen decoder like the reference
(train.py:124-157).

All shapes' points live in stacked static-shape arrays; each step samples a
(shape, query-batch) pair on device.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spurfies_tpu.config import ModelConfig
from spurfies_tpu.model import field
from spurfies_tpu.model.networks import init_model_params
from spurfies_tpu.ops.voxel_grid import VoxelGridSpec, build_query_table


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    n_shapes: int = 32
    n_surface_cap: int = 4096       # padded neural points per shape
    n_query: int = 8192             # query pool per shape
    batch_queries: int = 4096
    spacing: float = 0.02
    latent_dim: int = 32
    k: int = 8
    r: float = 2.0
    rbf: float = 45.0
    lr: float = 5e-4
    latent_lr: float = 1e-3
    eikonal_weight: float = 0.1
    latent_reg: float = 1e-4
    steps: int = 20000
    seed: int = 0
    # tighter bounds than scenes: shapes fit in ±0.8
    bounds: float = 0.8
    qcap: int = 64


def build_corpus(cfg: PriorConfig, shapes=None):
    """Stack shapes into static arrays + query tables.

    shapes: optional pre-built list of shape dicts (surface/query/query_sdf
    — the protocol shared by prior.shapes.sample_shape and
    prior.mesh_corpus.mesh_to_shape).  Default: procedural primitives.
    """
    rng = np.random.default_rng(cfg.seed)
    spec = VoxelGridSpec(
        lo=(-cfg.bounds,) * 3, hi=(cfg.bounds,) * 3, qcap=cfg.qcap
    )

    from spurfies_tpu.prior.shapes import sample_shape

    if shapes is not None and len(shapes) != cfg.n_shapes:
        raise ValueError(
            f"got {len(shapes)} shapes but cfg.n_shapes={cfg.n_shapes}"
        )

    pts_all, mask_all, q_all, qs_all = [], [], [], []
    tables_idx, tables_pos = [], []
    for i in range(cfg.n_shapes):
        sh = (shapes[i] if shapes is not None else
              sample_shape(rng, n_query=cfg.n_query, spacing=cfg.spacing))
        if len(sh["query"]) < cfg.n_query:
            raise ValueError(
                f"shape {i}: {len(sh['query'])} queries < cfg.n_query="
                f"{cfg.n_query}"
            )
        pts = sh["surface"][: cfg.n_surface_cap]
        n = len(pts)
        pad = cfg.n_surface_cap - n
        # pad FAR outside the grid so padded points never appear in tables
        pts_p = np.concatenate(
            [pts, np.full((pad, 3), 10.0, dtype=np.float32)]
        )
        table = build_query_table(jnp.asarray(pts_p), spec, r=cfg.r)
        pts_all.append(pts_p)
        mask_all.append(np.arange(cfg.n_surface_cap) < n)
        q_all.append(sh["query"][: cfg.n_query])
        qs_all.append(sh["query_sdf"][: cfg.n_query])
        tables_idx.append(np.asarray(table.idx))
        tables_pos.append(np.asarray(table.pos))

    corpus = {
        "points": jnp.asarray(np.stack(pts_all)),
        "point_mask": jnp.asarray(np.stack(mask_all)),
        "query": jnp.asarray(np.stack(q_all)),
        "query_sdf": jnp.asarray(np.stack(qs_all)),
        "table_idx": jnp.asarray(np.stack(tables_idx)),
        "table_pos": jnp.asarray(np.stack(tables_pos)),
    }
    return corpus, spec


def init_prior_params(key, cfg: PriorConfig):
    kd, kl = jax.random.split(key)
    mcfg = ModelConfig(feature_vector_size=cfg.latent_dim * 2)
    decoder = init_model_params(kd, mcfg)["frozen"]
    latents = 0.01 * jax.random.normal(
        kl, (cfg.n_shapes, cfg.n_surface_cap, cfg.latent_dim)
    )
    return {"decoder": decoder, "latents": latents}


def make_prior_train_step(cfg: PriorConfig, spec, tx):
    """corpus is a traced argument (NOT a closure constant: 100s of MB of
    baked-in constants make XLA compiles crawl)."""
    from spurfies_tpu.ops.voxel_grid import QueryTable, query_grid

    def shape_sdf_and_grad(params, corpus, s, x):
        qt = QueryTable(
            idx=corpus["table_idx"][s], pos=corpus["table_pos"][s], r=cfg.r
        )
        idx, _ = query_grid(x, qt, spec, k=cfg.k)
        valid = idx >= 0
        return field.sdf_and_grad(
            params["decoder"], params["latents"][s],
            corpus["points"][s], idx, valid, x, cfg.rbf,
        ), jnp.any(valid, -1)

    def loss_fn(params, corpus, s, qidx):
        x = corpus["query"][s][qidx]
        gt = corpus["query_sdf"][s][qidx]
        (sdf, grad), has = shape_sdf_and_grad(params, corpus, s, x)
        l1 = jnp.where(has, jnp.abs(sdf - gt), 0.0)
        sdf_loss = jnp.sum(l1) / jnp.maximum(jnp.sum(has), 1)
        # neighbor-less rows have exactly-zero grad: unit-substitute before
        # the norm so its backward stays NaN-free (see losses.eikonal_loss)
        safe = jnp.where(has[:, None], grad, jnp.asarray([1.0, 0.0, 0.0]))
        gnorm = jnp.linalg.norm(safe, axis=-1)
        eik = jnp.sum(jnp.where(has, (gnorm - 1.0) ** 2, 0.0)) / \
            jnp.maximum(jnp.sum(has), 1)
        reg = jnp.mean(jnp.sum(params["latents"][s] ** 2, -1))
        loss = sdf_loss + cfg.eikonal_weight * eik + cfg.latent_reg * reg
        return loss, {"sdf_l1": sdf_loss, "eikonal": eik,
                      "coverage": jnp.mean(has.astype(jnp.float32))}

    def step(corpus, carry, key):
        params, opt_state = carry
        ks, kq = jax.random.split(key)
        s = jax.random.randint(ks, (), 0, cfg.n_shapes)
        qidx = jax.random.choice(kq, cfg.n_query, (cfg.batch_queries,),
                                 replace=False)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, corpus, s, qidx
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux["loss"] = loss
        return (params, opt_state), aux

    @partial(jax.jit, static_argnames=("n_steps",))
    def window(params, opt_state, corpus, key, n_steps: int):
        """n_steps on device per host roundtrip (dispatch-latency hiding)."""
        keys = jax.random.split(key, n_steps)
        (params, opt_state), aux = jax.lax.scan(
            lambda c, k: step(corpus, c, k), (params, opt_state), keys
        )
        last = jax.tree_util.tree_map(lambda a: a[-1], aux)
        return params, opt_state, last

    return window


def pretrain(cfg: PriorConfig = PriorConfig(), log_every: int = 500,
             callback=None, shapes=None):
    """Run pretraining; returns (params, history).

    shapes: optional pre-built shape dicts (e.g. from
    prior.mesh_corpus.build_shapes_from_meshes — the ShapeNet-ready path).
    """
    from spurfies_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    corpus, spec = build_corpus(cfg, shapes=shapes)
    key = jax.random.PRNGKey(cfg.seed)
    params = init_prior_params(key, cfg)

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {
                "latents": optax.adam(cfg.latent_lr),
                "decoder": optax.adam(cfg.lr),
            },
            {"latents": "latents", "decoder": "decoder"},
        ),
    )
    opt_state = tx.init(params)
    window = make_prior_train_step(cfg, spec, tx)

    history = []
    done = 0
    while done < cfg.steps:
        n = min(log_every, cfg.steps - done)
        key, sub = jax.random.split(key)
        params, opt_state, aux = window(params, opt_state, corpus, sub, n)
        done += n
        rec = {k: float(v) for k, v in aux.items()}
        rec["step"] = done
        history.append(rec)
        if callback:
            callback(rec)
    return params, history


def frozen_params(params):
    """Extract the decoder in Trainer.load_frozen format."""
    return params["decoder"]


def eval_holdout(decoder, shapes, cfg: PriorConfig, fit_steps: int = 1500,
                 seed: int = 0):
    """Held-out SDF L1 of a FROZEN decoder on unseen shapes.

    Auto-decoder protocol (exactly how the prior is consumed per-scene,
    reference train.py:124-157): fresh latents are optimized against the
    frozen decoder on half of each shape's queries; L1 is reported on the
    other half.  Returns mean held-out L1 across shapes — the gate for
    comparing procedural- vs mesh-corpus-trained priors.
    """
    holdout_cfg = dataclasses.replace(cfg, n_shapes=len(shapes))
    corpus, spec = build_corpus(holdout_cfg, shapes=shapes)
    half = cfg.n_query // 2

    tx = optax.adam(cfg.latent_lr)
    frozen = {"decoder": decoder}

    from spurfies_tpu.ops.voxel_grid import QueryTable, query_grid

    def shape_sdf(latents, s, x):
        qt = QueryTable(
            idx=corpus["table_idx"][s], pos=corpus["table_pos"][s], r=cfg.r
        )
        idx, _ = query_grid(x, qt, spec, k=cfg.k)
        valid = idx >= 0
        sdf, _ = field.aggregate_sdf(
            frozen["decoder"], latents, corpus["points"][s], idx, valid, x,
            cfg.rbf,
        )
        return sdf, jnp.any(valid, -1)

    def masked_l1(latents, s, x, gt):
        sdf, has = shape_sdf(latents, s, x)
        l1 = jnp.where(has, jnp.abs(sdf - gt), 0.0)
        return jnp.sum(l1) / jnp.maximum(jnp.sum(has), 1)

    @partial(jax.jit, static_argnames=("n_steps",))
    def fit(latents, s, key, n_steps: int):
        opt_state = tx.init(latents)

        def step(carry, k):
            lat, opt = carry
            qidx = jax.random.choice(k, half, (cfg.batch_queries,))
            x = corpus["query"][s][qidx]
            gt = corpus["query_sdf"][s][qidx]
            g = jax.grad(masked_l1)(lat, s, x, gt)
            upd, opt = tx.update(g, opt, lat)
            return (optax.apply_updates(lat, upd), opt), None

        (latents, _), _ = jax.lax.scan(
            step, (latents, opt_state), jax.random.split(key, n_steps)
        )
        return latents

    key = jax.random.PRNGKey(seed)
    l1s = []
    for s in range(len(shapes)):
        key, kl, kf = jax.random.split(key, 3)
        lat = 0.01 * jax.random.normal(
            kl, (cfg.n_surface_cap, cfg.latent_dim)
        )
        lat = fit(lat, jnp.asarray(s), kf, fit_steps)
        l1 = masked_l1(lat, jnp.asarray(s), corpus["query"][s][half:],
                       corpus["query_sdf"][s][half:])
        l1s.append(float(l1))
    return float(np.mean(l1s)), l1s


def save_prior(path: str, params):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"decoder": params["decoder"]}, force=True)
    ckptr.wait_until_finished()


def load_prior(path: str):
    import orbax.checkpoint as ocp
    from spurfies_tpu.config import ModelConfig
    ckptr = ocp.StandardCheckpointer()
    template = {
        "decoder": init_model_params(
            jax.random.PRNGKey(0), ModelConfig()
        )["frozen"]
    }
    return ckptr.restore(path, template)["decoder"]
