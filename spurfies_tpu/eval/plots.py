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
