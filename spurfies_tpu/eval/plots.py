"""Visualization helpers (reference spurfies/utils/plots.py roles).

``triptych`` = the rgb/depth/normal panel written to TensorBoard during
training (reference stacked_plot, plots.py:17-31 + train.py:454-466);
depth uses the percentile-normalized turbo map (plots.py:392-468 style).
"""

import numpy as np


def depth_to_rgb(depth: np.ndarray, pmin: float = 1.0,
                 pmax: float = 99.0) -> np.ndarray:
    import matplotlib
    lo, hi = np.percentile(depth, [pmin, pmax])
    norm = np.clip((depth - lo) / max(hi - lo, 1e-9), 0, 1)
    cmap = matplotlib.colormaps["turbo"]
    return cmap(1.0 - norm)[..., :3].astype(np.float32)


def _weighted_percentile(x: np.ndarray, w: np.ndarray, ps) -> np.ndarray:
    """Percentiles of ``x`` under weights ``w`` (reference plots.py:399-407)."""
    x = x.reshape(-1)
    w = w.reshape(-1)
    order = np.argsort(x)
    x, w = x[order], w[order]
    acc_w = np.cumsum(w)
    return np.interp(np.asarray(ps, dtype=np.float64) * (acc_w[-1] / 100),
                     acc_w, x)


def _matte(vis: np.ndarray, acc: np.ndarray, dark: float = 0.8,
           light: float = 1.0, width: int = 8) -> np.ndarray:
    """Checkerboard matte for unaccumulated pixels (reference plots.py:409-415)."""
    bg_mask = np.logical_xor(
        (np.arange(acc.shape[0]) % (2 * width) // width)[:, None],
        (np.arange(acc.shape[1]) % (2 * width) // width)[None, :],
    )
    bg = np.where(bg_mask, light, dark)
    return vis * acc[:, :, None] + (bg * (1 - acc))[:, :, None]


def visualize_depth(depth: np.ndarray, acc: np.ndarray,
                    lo: float | None = None, hi: float | None = None,
                    percentile: float = 99.0,
                    matte_background: bool = True) -> np.ndarray:
    """Protocol-matching mip-NeRF depth render (reference plots.py:392-468).

    accumulation-WEIGHTED percentile bounds, ``-log`` depth curve, turbo
    colormap, checkerboard matte over unaccumulated pixels.  ``depth`` and
    ``acc`` are ``[H, W]``; returns ``[H, W, 3]`` float32 in [0, 1].
    """
    import matplotlib

    depth = np.asarray(depth, dtype=np.float64)
    acc = np.clip(np.asarray(acc, dtype=np.float64), 0.0, 1.0)
    eps = np.finfo(np.float32).eps

    lo_auto, hi_auto = _weighted_percentile(
        depth, acc, [50 - percentile / 2, 50 + percentile / 2]
    )
    lo = lo if lo is not None else lo_auto - eps
    hi = hi if hi is not None else hi_auto + eps

    curve = lambda x: -np.log(x + eps)  # noqa: E731 (reference :395)
    value, lo_c, hi_c = curve(depth), curve(lo), curve(hi)
    value = np.nan_to_num(
        np.clip((value - np.minimum(lo_c, hi_c)) / abs(hi_c - lo_c), 0, 1)
    )
    colorized = matplotlib.colormaps["turbo"](value)[..., :3]
    if matte_background:
        colorized = _matte(colorized, acc)
    return colorized.astype(np.float32)


def normal_to_rgb(normal: np.ndarray) -> np.ndarray:
    return np.clip((normal + 1.0) / 2.0, 0, 1).astype(np.float32)


def triptych(rgb: np.ndarray, depth: np.ndarray, normal: np.ndarray,
             gt: np.ndarray | None = None) -> np.ndarray:
    """Stack panels horizontally -> [H, W*(3|4), 3] float in [0, 1]."""
    panels = [np.clip(rgb, 0, 1)]
    if gt is not None:
        panels.insert(0, np.clip(gt, 0, 1))
    panels.append(depth_to_rgb(depth))
    panels.append(normal_to_rgb(normal))
    return np.concatenate(panels, axis=1)
