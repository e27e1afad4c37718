"""Measure the reference Spurfies train step on CPU (torch) — the baseline
denominator for bench.py.

The reference (/root/reference) cannot run unmodified anywhere in this
container: its kNN engine is an empty CUDA submodule (torch_knnquery), it
hard-codes device="cuda", and several of its deps (torch_scatter, plyfile,
skimage, loguru, GPUtil) are absent.  This script runs the reference's OWN
model/sampler/loss code (spurfies.model.pointneus_disent, ray_sampler,
loss — the hot loop of SURVEY §3.1) with:

  * a CPU ``torch_knnquery.VoxelGrid`` stand-in (scipy cKDTree) that
    reproduces the call-site interface at model/utils.py:90-138 — its
    runtime is timed SEPARATELY and excluded from the reported compute
    number (on the reference GPU this kernel is fast; on CPU the stand-in
    would unfairly inflate the reference step time);
  * a TorchFunctionMode that rewrites device="cuda"/.cuda()/.to("cuda")
    to CPU;
  * fake modules for the absent imports;
  * the exact synthetic scene and production knobs that bench.py times
    (8k-point sphere, 192x256 views, 1024 rays, fast=1, k=8, r=2,
    max_shading_pts=80, dtu_pn.yaml model/ray_sampler config).

The step timed is the reference train_step body (train.py:330-397):
forward (incl. tv + pseudo losses) -> VolSDFLoss -> backward (with the
double backprop through get_gradients) -> grad clip -> Adam + cosine step.

Output: a JSON line with cpu rays/s (total and ex-shim), per-phase times,
and the workload's FLOP count measured with torch.utils.flop_counter —
the inputs to the GPU extrapolation documented in BASELINE.md.
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np
import torch
from scipy.spatial import cKDTree
from torch.overrides import TorchFunctionMode

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, REFERENCE)

SHIM_TIME = {"query": 0.0, "set_pointset": 0.0, "calls": 0}


# ---------------------------------------------------------------------------
# Fake modules for deps absent in this container.
# ---------------------------------------------------------------------------

def _fake_logger():
    lg = types.SimpleNamespace()
    for name in ("info", "warning", "debug", "error", "remove", "add"):
        setattr(lg, name, lambda *a, **k: None)
    return lg


def install_fakes():
    loguru = types.ModuleType("loguru")
    loguru.logger = _fake_logger()
    sys.modules["loguru"] = loguru

    gputil = types.ModuleType("GPUtil")
    gputil.getGPUs = lambda: []
    sys.modules["GPUtil"] = gputil

    sys.modules["skimage"] = types.ModuleType("skimage")
    sys.modules["plyfile"] = types.ModuleType("plyfile")

    helpers = types.ModuleType("helpers")
    help_mod = types.ModuleType("helpers.help")
    help_mod.logger = _fake_logger()
    helpers.help = help_mod
    sys.modules["helpers"] = helpers
    sys.modules["helpers.help"] = help_mod

    scatter = types.ModuleType("torch_scatter")

    def scatter_min(src, index, dim=0):  # only import-time needed
        raise NotImplementedError

    scatter.scatter_min = scatter_min
    scatter.scatter_mean = scatter_min
    sys.modules["torch_scatter"] = scatter

    knn = types.ModuleType("torch_knnquery")
    knn.VoxelGrid = CpuVoxelGrid
    sys.modules["torch_knnquery"] = knn


class CpuVoxelGrid:
    """CPU stand-in for the reference's CUDA VoxelGrid (interface per
    reference spurfies/model/utils.py:90-138 call sites).  kNN within
    radius r*voxel_size via cKDTree; compacts rays exactly like the CUDA
    kernel's consumers expect.  Timed separately (SHIM_TIME)."""

    def __init__(self, voxel_size, scale, kernel, max_pts_per_voxel,
                 max_occ_voxels, ranges):
        self.voxel_size = float(voxel_size[0])
        self._tree = None
        self._pts = None

    def set_pointset(self, pts, num):
        t0 = time.perf_counter()
        self._pts = pts[0].detach().cpu().numpy().astype(np.float64)
        self._tree = cKDTree(self._pts)
        SHIM_TIME["set_pointset"] += time.perf_counter() - t0

    def query(self, raypos, k, r, max_shading_pts):
        t0 = time.perf_counter()
        pos = raypos[0].detach().cpu().numpy().astype(np.float64)
        R, S, _ = pos.shape
        radius = r * self.voxel_size
        d, idx = self._tree.query(
            pos.reshape(-1, 3), k=k, distance_upper_bound=radius
        )
        d = d.reshape(R, S, k)
        idx = idx.reshape(R, S, k)
        idx = np.where(np.isinf(d), -1, idx).astype(np.int64)
        has = (idx >= 0).any(-1)                      # [R, S]
        rank = np.cumsum(has, axis=1)                 # 1-based rank of valid
        keep = has & (rank <= max_shading_pts)
        ray_mask = keep.any(1)                        # [R]
        ridx = np.nonzero(ray_mask)[0]
        inv = np.full(R, -1, np.int64)
        inv[ridx] = np.arange(len(ridx))
        rr, ss = np.nonzero(keep)
        slot = rank[rr, ss] - 1
        out_i = inv[rr]
        n_out = len(ridx)
        sample_idx = np.full((n_out, max_shading_pts, k), -1, np.int64)
        sample_loc = np.zeros((n_out, max_shading_pts, 3), np.float32)
        sample_idx[out_i, slot] = idx[rr, ss]
        sample_loc[out_i, slot] = pos[rr, ss]
        out = (
            torch.from_numpy(sample_idx[None]),
            torch.from_numpy(sample_loc[None]),
            torch.from_numpy(ray_mask[None]),
        )
        SHIM_TIME["query"] += time.perf_counter() - t0
        SHIM_TIME["calls"] += 1
        return out


class CudaToCpu(TorchFunctionMode):
    """Rewrite explicit cuda placements in the reference code to CPU."""

    def __torch_function__(self, func, types_, args=(), kwargs=None):
        kwargs = dict(kwargs) if kwargs else {}
        name = getattr(func, "__name__", "")
        if name == "cuda":
            return args[0]
        dev = kwargs.get("device")
        if dev is not None and "cuda" in str(dev):
            kwargs["device"] = "cpu"
        if name == "to" and len(args) >= 2 and isinstance(
            args[1], (str, torch.device)
        ) and "cuda" in str(args[1]):
            args = (args[0], "cpu") + tuple(args[2:])
        return func(*args, **kwargs)


class Conf:
    """pyhocon-ConfigTree stand-in: attribute + get_* access, mutable."""

    def __init__(self, d):
        object.__setattr__(self, "_d", dict(d))

    def __getattr__(self, k):
        try:
            v = object.__getattribute__(self, "_d")[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Conf(v) if isinstance(v, dict) else v

    def __setattr__(self, k, v):
        object.__getattribute__(self, "_d")[k] = v

    def _get(self, k, default):
        return object.__getattribute__(self, "_d").get(k, default)

    def get_int(self, k, default=None):
        return int(self._get(k, default))

    def get_float(self, k, default=None):
        return float(self._get(k, default))

    def get_bool(self, k, default=None):
        return bool(self._get(k, default))

    def get_string(self, k, default=None):
        return str(self._get(k, default))

    def get_list(self, k, default=None):
        return list(self._get(k, default))

    def get_config(self, k):
        return dict(self._get(k, {}))


# dtu_pn.yaml model knobs (reference config/vol/dtu_pn.yaml:24-44)
MODEL_CONF = {
    "feature_vector_size": 64,
    "scene_bounding_sphere": 3.0,
    "initialize_colors": True,
    "k": 8,
    "r": 2,
    "rbf": 45,
    "vox_res": 300,
    "max_shading_pts": 80,
    "density": {"params_init": {"beta": 0.1}, "beta_min": 0.0001},
    "ray_sampler": {
        "far": 4.5, "near": 0.0, "N_samples": 64, "N_samples_eval": 128,
        "N_samples_extra": 32, "eps": 0.1, "beta_iters": 10,
        "max_total_iters": 5,
    },
}


def build(n_points, img_res):
    from spurfies_tpu.data.synthetic import make_synthetic_scene

    pts, cols, views = make_synthetic_scene(
        n_points=n_points, n_views=3, img_res=img_res
    )

    import spurfies.model.utils as mutils

    def fake_load_neural_points(path, vox_res=None):
        return {
            "pts": torch.from_numpy(np.asarray(pts)),
            "colors": torch.from_numpy(np.asarray(cols)),
        }

    mutils.load_neural_points = fake_load_neural_points
    import spurfies.model.pointneus_disent as pnd

    pnd.load_neural_points = fake_load_neural_points

    conf = Conf(MODEL_CONF)
    model = pnd.PointVolSDF(conf, scan_id=24, dataset="dtu")
    # prior nets are frozen in the reference (train.py:144-148)
    for p in model.F_geometry.parameters():
        p.requires_grad_(False)
    for p in model.T.parameters():
        p.requires_grad_(False)
    model.train()
    return model, views


def make_batch(views, num_pixels, rng):
    hw = views["rgb"].shape[1]
    sel = rng.choice(hw, size=num_pixels, replace=False)
    uv = torch.from_numpy(np.asarray(views["uv"])[sel])[None].float()
    model_input = {
        "uv": uv,
        "pose": torch.from_numpy(views["pose"][0])[None].float(),
        "intrinsics": torch.from_numpy(views["intrinsics"][0])[None].float(),
        "iter_step": 1,
        "local_data": None,
    }
    rgb = torch.from_numpy(views["rgb"][0][sel])[None].float()
    mask = torch.from_numpy(views["mask"][0][sel])[None].float()
    mask3 = mask.expand(-1, -1, 3).contiguous()  # dtu masks are 3-channel
    return model_input, {"rgb": rgb, "mask": mask3}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--num-pixels", type=int, default=1024)
    ap.add_argument("--n-points", type=int, default=8000)
    ap.add_argument("--count-flops", action="store_true")
    args = ap.parse_args()

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    install_fakes()
    mode = CudaToCpu()
    mode.__enter__()

    model, views = build(args.n_points, (192, 256))

    from spurfies.model.loss import VolSDFLoss

    # weights from reference config/ours.yaml:15-20
    loss_fn = VolSDFLoss(
        rgb_loss="torch.nn.L1Loss", local_weight=0.5, pseudo_weight=0.5,
        eikonal_weight=0.001, rgb_weight=1.0, tv_weight=0.01,
    )
    trainable = [p for p in model.parameters() if p.requires_grad]
    opt = torch.optim.Adam(trainable, lr=5e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=100_000, eta_min=3e-4
    )
    rng = np.random.default_rng(0)

    def step():
        model_input, gt = make_batch(views, args.num_pixels, rng)
        out = model(model_input, fast=1)  # train.py:345 uses fast=1
        loss_out = loss_fn(out, gt)
        loss = loss_out["loss"]
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        sched.step()
        return float(loss)

    for _ in range(args.warmup):
        step()

    if args.count_flops:
        from torch.utils.flop_counter import FlopCounterMode

        with FlopCounterMode(display=False) as fc:
            step()
        flops = fc.get_total_flops()
    else:
        flops = None

    SHIM_TIME["query"] = SHIM_TIME["set_pointset"] = 0.0
    SHIM_TIME["calls"] = 0
    t0 = time.perf_counter()
    losses = [step() for _ in range(args.steps)]
    dt = time.perf_counter() - t0

    shim = SHIM_TIME["query"] + SHIM_TIME["set_pointset"]
    rays = args.steps * args.num_pixels
    result = {
        "metric": "reference_train_rays_per_sec_cpu",
        "steps": args.steps,
        "num_pixels": args.num_pixels,
        "n_points": args.n_points,
        "total_s": round(dt, 3),
        "shim_knn_s": round(shim, 3),
        "shim_calls": SHIM_TIME["calls"],
        "step_ms_total": round(1e3 * dt / args.steps, 1),
        "step_ms_ex_shim": round(1e3 * (dt - shim) / args.steps, 1),
        "rays_per_sec_total": round(rays / dt, 1),
        "rays_per_sec_ex_shim": round(rays / (dt - shim), 1),
        "device_flops_per_step": flops,
        "torch_threads": torch.get_num_threads(),
        "loss_first_last": [round(losses[0], 4), round(losses[-1], 4)],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
