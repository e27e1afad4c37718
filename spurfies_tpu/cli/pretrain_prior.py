"""Pretrain the local-geometry prior (reproduces ckpt/local_prior.pt role).

    python -m spurfies_tpu.cli.pretrain_prior --steps 20000 \
        --out artifacts/local_prior

The resulting checkpoint is auto-loaded by the training CLI when present
(ckpt/local_prior.pt takes precedence if a converted torch prior exists).
"""

import argparse
import json
import os

from spurfies_tpu.utils.experiment import get_logger

log = get_logger()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--shapes", type=int, default=32)
    ap.add_argument("--out", default="artifacts/local_prior")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mesh-dir", default=None,
                    help="directory of .ply/.obj meshes (ShapeNet-style); "
                         "default is the procedural-primitive corpus")
    ap.add_argument("--eval-holdout", type=int, default=0, metavar="N",
                    help="after training, score held-out SDF L1 on N "
                         "unseen shapes (auto-decoder protocol)")
    args = ap.parse_args(argv)

    from spurfies_tpu.prior.pretrain import (
        PriorConfig,
        eval_holdout,
        pretrain,
        save_prior,
    )

    cfg = PriorConfig(steps=args.steps, n_shapes=args.shapes,
                      seed=args.seed)
    shapes = None
    if args.mesh_dir:
        from spurfies_tpu.prior.mesh_corpus import build_shapes_from_meshes
        log.info(f"building mesh corpus from {args.mesh_dir}")
        shapes = build_shapes_from_meshes(
            args.mesh_dir, n_shapes=cfg.n_shapes, n_query=cfg.n_query,
            spacing=cfg.spacing, seed=cfg.seed, log=log.info,
        )
    log.info(f"pretraining prior: {cfg.n_shapes} shapes, {cfg.steps} steps")
    params, history = pretrain(
        cfg, shapes=shapes, callback=lambda r: log.info(
            f"step {r['step']}: sdf_l1={r['sdf_l1']:.4f} "
            f"eik={r['eikonal']:.3f} cov={r['coverage']:.2f}"
        )
    )
    if args.eval_holdout:
        import numpy as np

        from spurfies_tpu.prior.shapes import sample_shape
        rng = np.random.default_rng(args.seed + 10_000)
        held = [sample_shape(rng, n_query=cfg.n_query, spacing=cfg.spacing)
                for _ in range(args.eval_holdout)]
        mean_l1, per = eval_holdout(params["decoder"], held, cfg)
        log.info(f"held-out SDF L1 ({args.eval_holdout} unseen shapes): "
                 f"{mean_l1:.4f}  per-shape={['%.4f' % v for v in per]}")
        history.append({"holdout_l1": mean_l1})
    out = os.path.abspath(args.out)
    save_prior(out, params)
    with open(out + "_history.json", "w") as f:
        json.dump(history, f, indent=2)
    log.info(f"saved prior to {out}")


if __name__ == "__main__":
    main()
