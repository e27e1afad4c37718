"""One-command activation-parity validation for the three torch artifacts.

The reference loads two frozen checkpoints (``ckpt/local_prior.pt``,
reference train.py:124-143; ``ckpt/vismvsnet.pt``, feat_utils.py:350-374)
and data prep needs ``DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth``
(dust3r_inference.py:275-282).  None of the artifacts ship in this
container, so the converters (convert/torch2jax.py, prep/dust3r_net.py)
are parity-tested only against synthetic modules.  The day the real files
land, validation must be ONE command, not a work item (VERDICT r2 #5):

    python scripts/validate_checkpoints.py \
        --local-prior ckpt/local_prior.pt \
        --vismvsnet ckpt/vismvsnet.pt \
        --dust3r ckpt/DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth

Per artifact it converts, runs layer-by-layer activation diffs against the
torch forward (the reference's OWN module code where needed — executed as
an oracle, nothing copied), and prints pass/fail per tensor.

    python scripts/validate_checkpoints.py --self-test

generates reference-key-scheme torch checkpoints in a temp dir and runs
the full validation path end-to-end (also exercised by
tests/test_validate_checkpoints.py).
"""

import argparse
import contextlib
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = os.environ.get("SPURFIES_REFERENCE_DIR", "/root/reference")

PASS_TOL = 1e-4   # max |diff| per activation tensor (f32 conv stacks)


class Report:
    def __init__(self, name):
        self.name = name
        self.rows = []       # (tensor_name, max_abs_diff, ok)
        self.notes = []

    def check(self, tensor_name, ours, ref, tol=PASS_TOL):
        ours = np.asarray(ours, dtype=np.float64)
        ref = np.asarray(ref, dtype=np.float64)
        if ours.shape != ref.shape:
            self.rows.append((tensor_name, float("inf"), False))
            self.notes.append(
                f"{tensor_name}: shape mismatch ours={ours.shape} "
                f"ref={ref.shape}"
            )
            return False
        diff = float(np.max(np.abs(ours - ref))) if ours.size else 0.0
        ok = diff <= tol
        self.rows.append((tensor_name, diff, ok))
        return ok

    def note(self, msg):
        self.notes.append(msg)

    @property
    def ok(self):
        return all(ok for _, _, ok in self.rows)

    def print(self):
        print(f"== {self.name} ==")
        for tensor_name, diff, ok in self.rows:
            status = "PASS" if ok else "FAIL"
            print(f"  [{status}] {tensor_name:32s} max|diff| = {diff:.3e}")
        for msg in self.notes:
            print(f"  note: {msg}")
        print(f"  => {self.name}: {'PASS' if self.ok else 'FAIL'} "
              f"({len(self.rows)} tensors)")


def _load_state(path_or_state):
    if isinstance(path_or_state, (str, bytes, os.PathLike)):
        import torch
        return torch.load(path_or_state, map_location="cpu",
                          weights_only=False)
    return path_or_state


# ---------------------------------------------------------------------------
# local_prior.pt — frozen F_geometry (5 linears) + T (reference
# train.py:124-143 key remap local_sdf_field.<2i> -> F_geometry,
# density_branch -> T)
# ---------------------------------------------------------------------------

def validate_local_prior(path_or_state, n=256, seed=0):
    import torch

    import jax.numpy as jnp
    from spurfies_tpu.convert.torch2jax import convert_local_prior
    from spurfies_tpu.model.networks import LEAKY_SLOPE, mlp_apply

    rep = Report("local_prior")
    state = _load_state(path_or_state)
    frozen = convert_local_prior(state)

    sd = state.get("model_state_dict", state)
    sdf_keys = sorted(
        {k.rsplit(".", 1)[0] for k in sd if "local_sdf_field" in k},
        key=lambda s: int(s.rsplit(".", 1)[-1]),
    )
    t_key = next(k.rsplit(".", 1)[0] for k in sd if "density_branch" in k)

    rng = np.random.default_rng(seed)
    x_np = rng.standard_normal((n, 35)).astype(np.float32)

    # torch side layer-by-layer straight from the state-dict tensors
    with torch.no_grad():
        h_t = torch.from_numpy(x_np)
        torch_acts = []
        for i, k in enumerate(sdf_keys):
            h_t = h_t @ sd[f"{k}.weight"].T + sd[f"{k}.bias"]
            if i < len(sdf_keys) - 1:
                h_t = torch.nn.functional.leaky_relu(h_t, LEAKY_SLOPE)
            torch_acts.append(h_t.numpy().copy())
        out_t = (h_t @ sd[f"{t_key}.weight"].T + sd[f"{t_key}.bias"]).numpy()

    # jax side layer-by-layer through the converted pytree
    h_j = jnp.asarray(x_np)
    for i, layer in enumerate(frozen["F_geometry"]):
        h_j = h_j @ layer["w"] + layer["b"]
        if i < len(frozen["F_geometry"]) - 1:
            h_j = jnp.where(h_j >= 0, h_j, LEAKY_SLOPE * h_j)
        rep.check(f"F_geometry.{i}", h_j, torch_acts[i])
    out_j = h_j @ frozen["T"][0]["w"] + frozen["T"][0]["b"]
    rep.check("T", out_j, out_t)

    # end-to-end through the production apply fn
    full = mlp_apply(frozen["T"], mlp_apply(frozen["F_geometry"],
                                            jnp.asarray(x_np)))
    rep.check("mlp_apply(e2e)", full, out_t)
    return rep


# ---------------------------------------------------------------------------
# vismvsnet.pt — FeatExt subtree, validated against the reference's own
# torch module code (executed as an oracle from REFERENCE_DIR)
# ---------------------------------------------------------------------------

# jax stage name -> torch module qualified name (see featext_apply stages;
# reference UNet.forward calls enc stages as modules, dec stages piecewise
# with the trailing res layer producing the stage output)
_FEATEXT_STAGES = [
    ("init", "init_conv"),
    ("enc0", "unet.enc_blocks.2d2_0"),
    ("enc1", "unet.enc_blocks.2d4_1"),
    ("enc2", "unet.enc_blocks.2d8_2"),
    ("dec0", "unet.dec_blocks.2d16_3.2"),
    ("dec1", "unet.dec_blocks.2d8_4.2"),
    ("f1", "final_conv_1"),
    ("f2", "final_conv_2"),
    ("f3", "final_conv_3"),
]


@contextlib.contextmanager
def _reference_feat_utils(ckpt_path):
    """Import the reference's feat_utils with ./ckpt/vismvsnet.pt resolving
    to ``ckpt_path`` (the reference FeatExt ctor hard-loads that relative
    path, feat_utils.py:362-369)."""
    if not os.path.isdir(REFERENCE_DIR):
        raise RuntimeError(
            f"reference dir {REFERENCE_DIR} not found; set "
            "SPURFIES_REFERENCE_DIR to validate vismvsnet activations"
        )
    old_cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(os.path.join(tmp, "ckpt"))
        os.symlink(os.path.abspath(ckpt_path),
                   os.path.join(tmp, "ckpt", "vismvsnet.pt"))
        os.chdir(tmp)
        sys.path.insert(0, REFERENCE_DIR)
        try:
            import importlib
            import spurfies.feat_utils as fu
            importlib.reload(fu)
            yield fu
        finally:
            sys.path.remove(REFERENCE_DIR)
            os.chdir(old_cwd)


def validate_vismvsnet(path, hw=(64, 80), seed=0):
    import torch

    import jax.numpy as jnp
    from spurfies_tpu.convert.torch2jax import convert_vismvsnet
    from spurfies_tpu.model.featext import featext_apply

    rep = Report("vismvsnet")
    params = convert_vismvsnet(_load_state(path))

    rng = np.random.default_rng(seed)
    x_np = rng.standard_normal((1, 3, *hw)).astype(np.float32)

    with _reference_feat_utils(path) as fu:
        model = fu.FeatExt().eval()
        acts = {}
        hooks = []
        for name, mod in model.named_modules():
            def _hook(mod, inp, out, name=name):
                if isinstance(out, torch.Tensor):
                    acts[name] = out.detach().numpy()
            hooks.append(mod.register_forward_hook(_hook))
        with torch.no_grad():
            model(torch.from_numpy(x_np))
        for h in hooks:
            h.remove()

    _, stages = featext_apply(
        params, jnp.asarray(x_np.transpose(0, 2, 3, 1)), return_stages=True
    )
    for jax_name, torch_name in _FEATEXT_STAGES:
        if torch_name not in acts:
            rep.note(f"torch module '{torch_name}' not hooked — skipped")
            continue
        ours = np.asarray(stages[jax_name]).transpose(0, 3, 1, 2)
        rep.check(jax_name, ours, acts[torch_name])
    return rep


# ---------------------------------------------------------------------------
# DUSt3R checkpoint — structural validation (key coverage + shapes +
# finite forward); activation parity additionally runs when the upstream
# torch `dust3r` package is importable (it is not in this container)
# ---------------------------------------------------------------------------

class _TrackedState(dict):
    def __init__(self, base):
        super().__init__(base)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


def validate_dust3r(path, seed=0):
    import jax
    import jax.numpy as jnp
    from spurfies_tpu.prep.dust3r_net import (
        Dust3rConfig,
        convert_dust3r,
        infer_pair,
    )

    rep = Report("dust3r")
    state = _load_state(path)
    if "model" in state:
        state = state["model"]
    tracked = _TrackedState(state)
    cfg = Dust3rConfig()
    try:
        params = convert_dust3r(tracked, cfg)
    except KeyError as e:
        rep.rows.append((f"missing key {e}", float("inf"), False))
        return rep

    # key coverage: unconsumed checkpoint tensors are a red flag (a head or
    # norm our mapping silently dropped)
    unconsumed = sorted(set(state) - tracked.accessed)
    if unconsumed:
        rep.note(f"{len(unconsumed)} checkpoint keys not consumed by the "
                 f"converter (first 10): {unconsumed[:10]}")
    rep.rows.append(("key_coverage",
                     float(len(unconsumed)) if unconsumed else 0.0,
                     not unconsumed))

    # shape census on the converted tree
    expected = {
        "patch_embed.w": (cfg.patch, cfg.patch, 3, cfg.enc_dim),
        "decoder_embed.w": (cfg.enc_dim, cfg.dec_dim),
        "head1.w": (cfg.dec_dim, cfg.patch * cfg.patch * 4),
    }
    flat = {}

    def _flatten(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                _flatten(v, f"{prefix}{k}." if prefix or True else k)
                flat[f"{prefix}{k}"] = v
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                _flatten(v, f"{prefix}{i}.")

    _flatten(params)
    for name, shape in expected.items():
        leaf = flat.get(name)
        got = tuple(getattr(leaf, "shape", ())) if leaf is not None else None
        ok = got == shape
        rep.rows.append((f"shape:{name}", 0.0 if ok else float("inf"), ok))
        if not ok:
            rep.note(f"{name}: expected {shape}, got {got}")

    n_enc = len(params["enc_blocks"])
    n_dec = len(params["dec_blocks"])
    rep.rows.append(("depth:enc", float(n_enc),
                     n_enc == cfg.enc_depth))
    rep.rows.append(("depth:dec", float(n_dec),
                     n_dec == cfg.dec_depth))

    # finite forward at a tiny image size (config geometry scales down)
    small = Dust3rConfig(img_size=(64, 96))
    key = jax.random.PRNGKey(seed)
    img = jax.random.uniform(key, (64, 96, 3))
    try:
        out = infer_pair(params, img, img, small)
        finite = all(
            bool(jnp.isfinite(v).all()) for v in jax.tree_util.tree_leaves(out)
        )
    except Exception as e:  # noqa: BLE001
        finite = False
        rep.note(f"forward failed: {e}")
    rep.rows.append(("finite_forward", 0.0 if finite else float("inf"),
                     finite))

    try:
        import dust3r  # noqa: F401
        rep.note("upstream dust3r package found — extend with activation "
                 "parity (not implemented: package absent at build time)")
    except ImportError:
        rep.note("upstream dust3r package not importable: structural "
                 "validation only (activation parity needs it)")
    return rep


# ---------------------------------------------------------------------------
# self-test: synthesize reference-key-scheme checkpoints, validate them
# ---------------------------------------------------------------------------

def make_synthetic_local_prior(path, seed=0):
    import torch
    torch.manual_seed(seed)
    sd = {}
    dims = [(35, 256)] + [(256, 256)] * 4
    for i, (fi, fo) in zip((0, 2, 4, 6, 8), dims):
        sd[f"module.decoder.local_sdf_field.{i}.weight"] = torch.randn(
            fo, fi) * 0.05
        sd[f"module.decoder.local_sdf_field.{i}.bias"] = torch.randn(fo) * 0.1
    sd["density_branch.weight"] = torch.randn(1, 256) * 0.05
    sd["density_branch.bias"] = torch.randn(1) * 0.1
    torch.save({"model_state_dict": sd}, path)


def make_synthetic_vismvsnet(path, seed=0):
    """Random-weight checkpoint with the TRUE reference key schema: the
    reference FeatExt is instantiated schema-only (ctor checkpoint load
    patched out) and its randomly initialized state dict saved under the
    ``module.feat_ext.*`` prefix."""
    import torch
    torch.manual_seed(seed)

    with tempfile.NamedTemporaryFile(suffix=".pt") as dummy:
        torch.save({"state_dict": {}}, dummy.name)
        with _reference_feat_utils(dummy.name) as fu:
            orig = fu.FeatExt.load_state_dict
            fu.FeatExt.load_state_dict = lambda self, sd: None
            try:
                model = fu.FeatExt()
            finally:
                fu.FeatExt.load_state_dict = orig
    # randomize BN stats so folding is actually exercised
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.data.normal_(0, 0.5)
            m.running_var.data.uniform_(0.5, 2.0)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.5, 0.5)
    sd = {f"module.feat_ext.{k}": v for k, v in model.state_dict().items()}
    torch.save({"state_dict": sd}, path)


def make_synthetic_dust3r(path, seed=0):
    """Random-weight checkpoint with the croco/dust3r key scheme the
    converter expects, at a REDUCED depth/width (full ViT-L is 532M params;
    the self-test only needs schema + shape coverage).  Returns the matching
    Dust3rConfig."""
    import torch

    from spurfies_tpu.prep.dust3r_net import Dust3rConfig
    torch.manual_seed(seed)
    cfg = Dust3rConfig(enc_dim=64, enc_depth=2, enc_heads=4,
                       dec_dim=48, dec_depth=2, dec_heads=4)
    sd = {}

    def lin(prefix, din, dout):
        sd[f"{prefix}.weight"] = torch.randn(dout, din) * 0.05
        sd[f"{prefix}.bias"] = torch.randn(dout) * 0.02

    def norm(prefix, d):
        sd[f"{prefix}.weight"] = torch.ones(d)
        sd[f"{prefix}.bias"] = torch.zeros(d)

    def block(prefix, d, cross=False):
        norm(f"{prefix}.norm1", d)
        lin(f"{prefix}.attn.qkv", d, 3 * d)
        lin(f"{prefix}.attn.proj", d, d)
        norm(f"{prefix}.norm2", d)
        lin(f"{prefix}.mlp.fc1", d, 4 * d)
        lin(f"{prefix}.mlp.fc2", 4 * d, d)
        if cross:
            norm(f"{prefix}.norm3", d)
            norm(f"{prefix}.norm_y", d)
            lin(f"{prefix}.cross_attn.projq", d, d)
            lin(f"{prefix}.cross_attn.projk", d, d)
            lin(f"{prefix}.cross_attn.projv", d, d)
            lin(f"{prefix}.cross_attn.proj", d, d)

    sd["patch_embed.proj.weight"] = torch.randn(
        cfg.enc_dim, 3, cfg.patch, cfg.patch) * 0.02
    sd["patch_embed.proj.bias"] = torch.zeros(cfg.enc_dim)
    for i in range(cfg.enc_depth):
        block(f"enc_blocks.{i}", cfg.enc_dim)
    norm("enc_norm", cfg.enc_dim)
    lin("decoder_embed", cfg.enc_dim, cfg.dec_dim)
    for i in range(cfg.dec_depth):
        block(f"dec_blocks.{i}", cfg.dec_dim, cross=True)
        block(f"dec_blocks2.{i}", cfg.dec_dim, cross=True)
    norm("dec_norm", cfg.dec_dim)
    lin("downstream_head1.proj", cfg.dec_dim, cfg.patch * cfg.patch * 4)
    lin("downstream_head2.proj", cfg.dec_dim, cfg.patch * cfg.patch * 4)
    torch.save({"model": sd}, path)
    return cfg


def self_test():
    from spurfies_tpu.prep.dust3r_net import convert_dust3r, infer_pair

    reports = []
    with tempfile.TemporaryDirectory() as tmp:
        lp = os.path.join(tmp, "local_prior.pt")
        make_synthetic_local_prior(lp)
        reports.append(validate_local_prior(lp))

        if os.path.isdir(REFERENCE_DIR):
            vm = os.path.join(tmp, "vismvsnet.pt")
            make_synthetic_vismvsnet(vm)
            reports.append(validate_vismvsnet(vm))
        else:
            print("(skipping vismvsnet self-test: no reference dir)")

        # dust3r structural self-test at reduced width: run the converter's
        # coverage/forward pieces directly against the matching config
        import jax
        import jax.numpy as jnp
        d3 = os.path.join(tmp, "dust3r.pth")
        cfg = make_synthetic_dust3r(d3)
        rep = Report("dust3r(self)")
        import torch
        state = torch.load(d3, map_location="cpu", weights_only=False)
        tracked = _TrackedState(state["model"])
        params = convert_dust3r(
            tracked, dataclass_replace(cfg, img_size=(64, 96))
        )
        unconsumed = sorted(set(state["model"]) - tracked.accessed)
        rep.rows.append(("key_coverage", float(len(unconsumed)),
                         not unconsumed))
        img = jax.random.uniform(jax.random.PRNGKey(0), (64, 96, 3))
        out = infer_pair(params, img, img,
                         dataclass_replace(cfg, img_size=(64, 96)))
        finite = all(
            bool(jnp.isfinite(v).all())
            for v in jax.tree_util.tree_leaves(out)
        )
        rep.rows.append(("finite_forward", 0.0 if finite else float("inf"),
                         finite))
        reports.append(rep)

    for rep in reports:
        rep.print()
    return all(r.ok for r in reports)


def dataclass_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def main(argv=None):
    # Validation is tiny; run on CPU so it never contends with TPU jobs.
    # (The axon TPU plugin ignores the JAX_PLATFORMS env var; the config
    # API before first backend use is the only reliable override.)
    import jax
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--local-prior", help="path to local_prior.pt")
    ap.add_argument("--vismvsnet", help="path to vismvsnet.pt")
    ap.add_argument("--dust3r", help="path to DUSt3R ViT-L checkpoint")
    ap.add_argument("--self-test", action="store_true",
                    help="synthesize checkpoints and validate end-to-end")
    args = ap.parse_args(argv)

    if args.self_test:
        ok = self_test()
        print(f"self-test: {'PASS' if ok else 'FAIL'}")
        return 0 if ok else 1

    if not (args.local_prior or args.vismvsnet or args.dust3r):
        ap.error("provide at least one checkpoint path or --self-test")

    reports = []
    if args.local_prior:
        reports.append(validate_local_prior(args.local_prior))
    if args.vismvsnet:
        reports.append(validate_vismvsnet(args.vismvsnet))
    if args.dust3r:
        reports.append(validate_dust3r(args.dust3r))
    for rep in reports:
        rep.print()
    ok = all(r.ok for r in reports)
    print(f"validate_checkpoints: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
