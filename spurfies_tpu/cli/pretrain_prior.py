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
    args = ap.parse_args(argv)

    from spurfies_tpu.prior.pretrain import (
        PriorConfig,
        pretrain,
        save_prior,
    )

    cfg = PriorConfig(steps=args.steps, n_shapes=args.shapes,
                      seed=args.seed)
    log.info(f"pretraining prior: {cfg.n_shapes} shapes, {cfg.steps} steps")
    params, history = pretrain(
        cfg, callback=lambda r: log.info(
            f"step {r['step']}: sdf_l1={r['sdf_l1']:.4f} "
            f"eik={r['eikonal']:.3f} cov={r['coverage']:.2f}"
        )
    )
    out = os.path.abspath(args.out)
    save_prior(out, params)
    with open(out + "_history.json", "w") as f:
        json.dump(history, f, indent=2)
    log.info(f"saved prior to {out}")


if __name__ == "__main__":
    main()
