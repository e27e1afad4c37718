"""Novel-view-synthesis evaluation: render eval views, score PSNR/SSIM/LPIPS.

Behavioral spec from reference ``eval_spurfies.py:196-374``: per eval view,
render in chunks, save eval/normal/depth PNGs, then masked PSNR, SSIM on
foreground-composited images, LPIPS-VGG; per-scan and global means.
LPIPS runs only when a converted VGG/LPIPS checkpoint is available
(spurfies_tpu.eval.lpips_jax); zero-egress environments skip it.
"""

import os

import numpy as np

from spurfies_tpu.core.metrics import psnr as psnr_fn
from spurfies_tpu.eval.ssim import ssim as ssim_fn


def composite_foreground(img: np.ndarray, mask: np.ndarray,
                         bg: float = 1.0) -> np.ndarray:
    """Foreground-composite onto WHITE like the reference
    (``rgb * mask + (1 - mask)``, eval_spurfies.py:236-237)."""
    return np.where(mask > 0.5, img, bg)


def quantize_png(img: np.ndarray) -> np.ndarray:
    """8-bit PNG roundtrip: the reference scores metrics on RELOADED PNGs
    (``np.array(Image.open(...)) / 255.0``, eval_spurfies.py:229-233), so
    the prediction is quantized before scoring.  Matching that exactly
    avoids a small systematic PSNR bias vs the reference protocol."""
    return np.round(np.clip(img, 0.0, 1.0) * 255.0) / 255.0


def evaluate_views(render_image, params, scene_data, out_dir=None,
                   lpips_fn=None, save_images=True, quantize=True,
                   max_views=None, view_ids=None):
    """Render + score every eval view.

    Args:
      render_image: fn(params, uv, pose, intrinsics, key) -> dict with
        rgb_values/normal_map/depth_values (from train.trainer.make_render_fn).
      scene_data: data.scene_data.SceneData (eval views used).
      lpips_fn: optional callable(img1 [H,W,3], img2) -> float.
      quantize: score the 8-bit PNG roundtrip of the prediction (the
        reference protocol, eval_spurfies.py:229-233); False scores floats.
      view_ids: optional iterable of view ids — score only eval views
        whose id is in it (e.g. views angularly adjacent to the train
        triplet on synthetic full-ring fixtures, where the protocol's
        first-N eval views image the never-observed far side).

    Returns:
      dict with per-view and mean psnr/ssim (+lpips when available).
    """
    import jax

    h, w = scene_data.img_res
    uv = scene_data.uv
    vs = scene_data.eval or scene_data.train
    sel = list(range(len(vs.ids)))
    if view_ids is not None:
        want = {int(v) for v in view_ids}
        sel = [i for i in sel if int(vs.ids[i]) in want]
    if max_views is not None:
        sel = sel[: int(max_views)]
    results = {"psnr": [], "ssim": [], "lpips": [],
               "ids": [vs.ids[i] for i in sel]}

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    for i in sel:
        out = render_image(
            params, uv, vs.pose[i], vs.intrinsics[i],
            jax.random.PRNGKey(0),
        )
        pred = np.asarray(out["rgb_values"]).reshape(h, w, 3)
        if quantize:
            pred = quantize_png(pred)
        gt = np.asarray(vs.rgb[i]).reshape(h, w, 3)
        mask = np.asarray(vs.mask[i]).reshape(h, w, 3)

        mask_bin = mask[..., :1] > 0.5
        se = ((pred - gt) ** 2)[np.repeat(mask_bin, 3, -1)]
        psnr = float(-10.0 * np.log10(se.mean() + 1e-12))

        pred_fg = composite_foreground(pred, mask)
        gt_fg = composite_foreground(gt, mask)
        s = ssim_fn(pred_fg, gt_fg, data_range=1.0)

        results["psnr"].append(psnr)
        results["ssim"].append(s)
        if lpips_fn is not None:
            results["lpips"].append(float(lpips_fn(pred_fg, gt_fg)))

        if out_dir and save_images:
            import imageio.v2 as imageio
            vid = vs.ids[i]
            imageio.imwrite(
                os.path.join(out_dir, f"eval_{vid:03d}.png")
                if isinstance(vid, int)
                else os.path.join(out_dir, f"eval_{vid}.png"),
                (np.clip(pred, 0, 1) * 255).astype(np.uint8),
            )
            if "normal_map" in out:
                nm = np.asarray(out["normal_map"]).reshape(h, w, 3)
                nm = (nm + 1.0) / 2.0
                imageio.imwrite(
                    os.path.join(out_dir, f"normal_{i:03d}.png"),
                    (np.clip(nm, 0, 1) * 255).astype(np.uint8),
                )
            if "depth_values" in out:
                from spurfies_tpu.eval.plots import visualize_depth
                dep = np.asarray(out["depth_values"]).reshape(h, w)
                acc = (np.asarray(out["acc"]).reshape(h, w)
                       if "acc" in out else np.ones_like(dep))
                vis = visualize_depth(dep, acc)
                imageio.imwrite(
                    os.path.join(out_dir, f"dep_{i:03d}.png"),
                    (np.clip(vis, 0, 1) * 255).astype(np.uint8),
                )

    results["mean_psnr"] = float(np.mean(results["psnr"]))
    results["mean_ssim"] = float(np.mean(results["ssim"]))
    if results["lpips"]:
        results["mean_lpips"] = float(np.mean(results["lpips"]))
    return results


