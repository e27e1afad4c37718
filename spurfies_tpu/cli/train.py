"""Training CLI — per-scene optimization driver.

Reference surface: ``python runner.py testlist=scan24 vol=dtu_pn
opt_stepNs=[100_000,0,0]`` (runner.py:8-65).  Here:

    python -m spurfies_tpu.cli.train --config configs/dtu_pn.yaml \
        --scans scan24 [--resume] [key.path=value ...]

Loops over scans, builds a Trainer per scene, runs ``train.opt_steps``
steps with periodic eval renders + checkpoints.
"""

import argparse
import os
import sys

import numpy as np

from spurfies_tpu.config import Config, apply_overrides, load_yaml
from spurfies_tpu.utils.experiment import (
    ExperimentDir,
    MetricWriter,
    get_logger,
)

log = get_logger()


def load_scene_data(cfg: Config, scan: str):
    ds = cfg.dataset
    if ds.data_dir == "own_data":
        from spurfies_tpu.data.own_data import load_own_data
        return load_own_data(ds.data_dir_root, scan)
    if ds.data_dir == "dtu":
        from spurfies_tpu.data.dtu import load_dtu
        scan_id = int(scan[4:]) if str(scan).startswith("scan") else int(scan)
        return load_dtu(ds.data_dir_root, scan_id, ds.img_res, ds.num_views)
    if ds.data_dir == "mipnerf":
        from spurfies_tpu.data.mip_nerf import load_mipnerf
        return load_mipnerf(ds.data_dir_root, scan)
    raise NotImplementedError(ds.data_dir)


def apply_scene_overrides(cfg: Config, scan: str) -> Config:
    """Scene-dependent model knobs (±2 bounds for mipnerf garden/stump —
    reference pointneus_disent.py:45-53)."""
    import dataclasses
    if cfg.dataset.data_dir == "mipnerf" and scan in ("garden", "stump"):
        model = dataclasses.replace(
            cfg.model, scene_lo=(-2.0, -2.0, -2.0), scene_hi=(2.0, 2.0, 2.0)
        )
        cfg = dataclasses.replace(cfg, model=model)
    return cfg


def train_scene(cfg: Config, scan: str, resume: bool = False):
    from spurfies_tpu.train.trainer import Trainer

    cfg = apply_scene_overrides(cfg, scan)
    sd = load_scene_data(cfg, scan)
    log.info(f"scene {scan}: {len(sd.train.ids)} train views, "
             f"{len(sd.points)} raw points, img_res={sd.img_res}")

    # MVS feature-consistency bundle (DTU local loss) when the frozen
    # Vis-MVSNet checkpoint is available (reference dtu.py:228-239)
    local_bundle = None
    vismvs_ckpt = os.path.join("ckpt", "vismvsnet.pt")
    if (cfg.dataset.data_dir == "dtu" and cfg.loss.local_weight > 0
            and os.path.exists(vismvs_ckpt)):
        from spurfies_tpu.convert.torch2jax import convert_vismvsnet
        from spurfies_tpu.data.mvs_local import build_local_bundle
        fx = convert_vismvsnet(vismvs_ckpt)
        local_bundle = build_local_bundle(
            cfg.dataset.data_dir_root, int(scan.replace("scan", "")), fx,
            sd.scale_mat,
        )
        log.info("local (Vis-MVSNet) feature loss enabled")

    trainer = Trainer(cfg, sd.points, sd.colors, sd.train_views(),
                      local_bundle=local_bundle)

    # frozen local-geometry prior (reference train.py:124-157): prefer the
    # converted torch checkpoint, else our own pretrained prior
    # (cli/pretrain_prior.py); else warn (tests / smoke runs only)
    prior_ckpt = os.path.join("ckpt", "local_prior.pt")
    own_prior = os.path.abspath(os.path.join("artifacts", "local_prior"))
    if os.path.exists(prior_ckpt):
        from spurfies_tpu.convert.torch2jax import convert_local_prior
        trainer.load_frozen(convert_local_prior(prior_ckpt))
        log.info("loaded frozen local-geometry prior (torch ckpt)")
    elif os.path.isdir(own_prior):
        from spurfies_tpu.prior.pretrain import load_prior
        trainer.load_frozen(load_prior(own_prior))
        log.info("loaded frozen local-geometry prior (pretrained here)")
    else:
        log.warning("no local prior found (ckpt/local_prior.pt or "
                    "artifacts/local_prior) — frozen SDF decoder is "
                    "randomly initialized")

    exp = None
    if resume:
        exp = ExperimentDir.latest(cfg.exps_folder, cfg.expname, scan)
        if exp is not None:
            trainer.restore_checkpoint(exp.checkpoint_path("latest"))
            log.info(f"resumed from {exp.dir} at step "
                     f"{int(trainer.state.step)}")
    if exp is None:
        exp = ExperimentDir(cfg.exps_folder, cfg.expname, scan)
    exp.save_config(cfg)
    writer = MetricWriter(os.path.join(exp.plots_dir, "logs"))

    tcfg = cfg.train
    h, w = sd.img_res
    start = int(trainer.state.step)

    # In-training eval renders run at 1/4 resolution like the reference's
    # plot dataset (train.py:243-257,399) — a full-res render through the
    # 5-iteration sampler every render_freq steps is a 16x wall-clock tax.
    vstride = 4
    vh = (h + vstride - 1) // vstride
    vw = (w + vstride - 1) // vstride
    val_uv = np.ascontiguousarray(
        np.asarray(sd.uv).reshape(h, w, 2)[::vstride, ::vstride]
    ).reshape(-1, 2)
    val_gt = np.asarray(sd.train.rgb[0]).reshape(h, w, 3)[::vstride, ::vstride]
    val_mask = (
        np.asarray(sd.train.mask[0]).reshape(h, w, 3)[::vstride, ::vstride,
                                                      0] > 0.5
    )

    done = start
    window = min(tcfg.render_freq, 500)
    while done < tcfg.opt_steps:
        n = min(window, tcfg.opt_steps - done)
        trainer.run(n, window=n, callback=lambda s, m: writer.scalars(s, m))
        done += n

        if done % tcfg.render_freq < window or done >= tcfg.opt_steps:
            import jax
            out = trainer.render_image(
                trainer.state.params, val_uv, trainer.views["pose"][0],
                trainer.views["intrinsics"][0], jax.random.PRNGKey(0),
            )
            pred = out["rgb_values"].reshape(vh, vw, 3)
            mse = float(np.mean(((pred - val_gt) ** 2)[val_mask]))
            writer.scalars(done, {"psnr": -10 * np.log10(mse + 1e-12)},
                           prefix="val")
            from spurfies_tpu.eval.plots import triptych
            panel = triptych(
                pred, out["depth_values"].reshape(vh, vw),
                out["normal_map"].reshape(vh, vw, 3), gt=val_gt,
            )
            writer.image(done, "val/triptych", panel)
            log.info(f"step {done}: val psnr "
                     f"{-10 * np.log10(mse + 1e-12):.2f}")

        if done % tcfg.checkpoint_freq < window or done >= tcfg.opt_steps:
            trainer.save_checkpoint(exp.checkpoint_path("latest"))
            trainer.save_checkpoint(exp.checkpoint_path(done))
            log.info(f"step {done}: checkpoint saved")

    writer.close()
    return trainer, exp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument("--scans", default=None,
                    help="comma-separated scan list (testlist)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("overrides", nargs="*", help="key.path=value")
    args = ap.parse_args(argv)

    cfg = load_yaml(args.config) if args.config else Config()
    cfg = apply_overrides(cfg, args.overrides)

    scans = (args.scans or str(cfg.dataset.scan_id)).split(",")
    for scan in scans:
        train_scene(cfg, scan.strip(), resume=args.resume)


if __name__ == "__main__":
    main()
