"""Torch-checkpoint converters for the two frozen artifacts.

The reference loads (SURVEY §5 checkpoint/resume):
  * ``ckpt/local_prior.pt`` — ShapeNet local-geometry prior; keys
    ``*.local_sdf_field.<i>.{weight,bias}`` map onto the 5 F_geometry
    Linears and ``density_branch.{weight,bias}`` onto T
    (spurfies/train.py:124-143).
  * ``ckpt/vismvsnet.pt`` — Vis-MVSNet; the ``module.feat_ext.*`` subtree
    (spurfies/feat_utils.py:362-369).

Torch stores Linear weights ``[out, in]`` (ours: ``[in, out]``) and conv
kernels ``[out, in, kh, kw]`` (ours HWIO); BatchNorms are folded into
scale/shift since only eval mode is ever used.
"""

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _linear(sd, prefix):
    import jax.numpy as jnp
    return {
        "w": jnp.asarray(_np(sd[f"{prefix}.weight"]).T),
        "b": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def convert_local_prior(path_or_state):
    """-> frozen params {"F_geometry": [5 linears], "T": [1 linear]}.

    Accepts a file path or an already-loaded state dict.  Handles both the
    raw checkpoint ({"model_state_dict": ...}) and a bare state dict.
    """
    if isinstance(path_or_state, (str, bytes)):
        import torch
        state = torch.load(path_or_state, map_location="cpu",
                           weights_only=False)
    else:
        state = path_or_state
    if "model_state_dict" in state:
        state = state["model_state_dict"]

    # collect local_sdf_field linear layers in key order; torch Sequential
    # indices 0,2,4,6,8 are the Linears (LeakyReLUs at odd indices)
    sdf_keys = sorted(
        {
            k.rsplit(".", 1)[0]
            for k in state
            if "local_sdf_field" in k and k.endswith(("weight", "bias"))
        },
        key=lambda s: int(s.rsplit(".", 1)[-1]),
    )
    if len(sdf_keys) != 5:
        raise ValueError(
            f"expected 5 local_sdf_field linears, got {sdf_keys}"
        )
    f_geometry = [_linear(state, k) for k in sdf_keys]

    t_key = next(
        k.rsplit(".", 1)[0] for k in state if "density_branch" in k
    )
    return {"F_geometry": f_geometry, "T": [_linear(state, t_key)]}


# ---------------------------------------------------------------------------
# Vis-MVSNet FeatExt
# ---------------------------------------------------------------------------

def _conv_w(sd, key):
    import jax.numpy as jnp
    # [out, in, kh, kw] -> HWIO
    return {"w": jnp.asarray(_np(sd[key]).transpose(2, 3, 1, 0))}


def _deconv_w(sd, key):
    import jax.numpy as jnp
    # torch ConvTranspose2d: [in, out, kh, kw]; equivalent dilated conv
    # needs the spatially flipped kernel in HWIO.
    w = _np(sd[key])[:, :, ::-1, ::-1]          # flip spatial
    return {"w": jnp.asarray(np.ascontiguousarray(w.transpose(2, 3, 0, 1)))}


def _bn_fold(sd, prefix, eps=1e-5):
    import jax.numpy as jnp
    gamma = _np(sd[f"{prefix}.weight"])
    beta = _np(sd[f"{prefix}.bias"])
    mean = _np(sd[f"{prefix}.running_mean"])
    var = _np(sd[f"{prefix}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    return {
        "scale": jnp.asarray(scale),
        "shift": jnp.asarray(beta - mean * scale),
    }


def _basic_block(sd, prefix, stride):
    p = {
        "conv1": _conv_w(sd, f"{prefix}.conv1.weight"),
        "bn1": _bn_fold(sd, f"{prefix}.bn1"),
        "conv2": _conv_w(sd, f"{prefix}.conv2.weight"),
        "bn2": _bn_fold(sd, f"{prefix}.bn2"),
        "stride": stride,
    }
    if f"{prefix}.downsample.0.weight" in sd:
        p["downsample"] = _conv_w(sd, f"{prefix}.downsample.0.weight")
        p["downsample_bn"] = _bn_fold(sd, f"{prefix}.downsample.1")
    return p


def convert_vismvsnet(path_or_state):
    """-> featext params pytree (see model/featext.py).

    Accepts the full vismvsnet checkpoint ({"state_dict": {"module.feat_ext.
    ..."}}) or an already-stripped feat_ext state dict.
    """
    if isinstance(path_or_state, (str, bytes)):
        import torch
        state = torch.load(path_or_state, map_location="cpu",
                           weights_only=False)
    else:
        state = path_or_state
    if "state_dict" in state:
        state = {
            k[len("module.feat_ext."):]: v
            for k, v in state["state_dict"].items()
            if k.startswith("module.feat_ext.")
        }

    # UNet(16, enc=2, dec=1, filters=[32,64,128], prefix="2d"):
    # enc ListModule names: 2d2_0, 2d4_1, 2d8_2; dec: 2d16_3, 2d8_4
    enc_names = ["2d2_0", "2d4_1", "2d8_2"]
    enc_strides = [1, 2, 2]
    dec_names = ["2d16_3", "2d8_4"]

    enc = []
    for name, stride in zip(enc_names, enc_strides):
        base = f"unet.enc_blocks.{name}"
        enc.append([
            _basic_block(state, f"{base}.0", stride),
            _basic_block(state, f"{base}.1", 1),
        ])

    dec = []
    for name in dec_names:
        base = f"unet.dec_blocks.{name}"
        dec.append({
            "deconv": _deconv_w(state, f"{base}.0.weight"),
            "post": _conv_w(state, f"{base}.1.weight"),
            "res": [_basic_block(state, f"{base}.2.0", 1)],
        })

    return {
        "init_conv": _conv_w(state, "init_conv.0.weight"),
        "init_bn": _bn_fold(state, "init_conv.1"),
        "enc": enc,
        "dec": dec,
        "head1": _conv_w(state, "final_conv_1.weight"),
        "head2": _conv_w(state, "final_conv_2.weight"),
        "head3": _conv_w(state, "final_conv_3.weight"),
    }
