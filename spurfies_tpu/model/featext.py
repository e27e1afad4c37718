"""Vis-MVSNet feature extractor (frozen UNet) in pure JAX, NHWC.

Behavioral spec from reference ``spurfies/feat_utils.py:179-374``:
  * FeatExt = Conv(3->16, k5, s2, p2, no bias) + BN + ReLU, then
    UNet(16, enc=2, dec=1, filters=[32, 64, 128]):
      - 3 encoder stages of 2 BasicBlocks each (strides 1, 2, 2),
      - 2 decoder stages: ConvTranspose(k3, s2, p1, op1) -> concat skip ->
        Conv(2f->f, k3) -> 1 BasicBlock,
    and three 3x3 heads mapping (128, 64, 32)-channel maps to 32 channels.
  * BasicBlock = conv3x3-BN-ReLU-conv3x3-BN (+ 1x1-BN downsample) + ReLU.
  * Only eval mode is ever used (weights frozen), so BatchNorm folds into a
    per-channel scale/shift at conversion time (convert/torch2jax.py).

The params pytree is produced by ``convert.torch2jax.convert_vismvsnet``;
layout: conv kernels HWIO, each conv dict {"w": ...} plus folded
{"scale", "shift"} when a BN follows.
"""

import jax
import jax.numpy as jnp

DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w, stride=1):
    """torch-style symmetric padding p=(k-1)//2 (XLA SAME pads
    asymmetrically for even sizes with stride 2 — not equivalent)."""
    k = w.shape[0]
    p = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(p, p), (p, p)], dimension_numbers=DN
    )


def deconv2x(x, w):
    """torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) equivalent:
    input-dilated conv with flipped kernel, padding (1, 2)."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 2), (1, 2)], lhs_dilation=(2, 2),
        dimension_numbers=DN,
    )


def bn(x, p):
    return x * p["scale"] + p["shift"]


def basic_block(x, p):
    out = conv(x, p["conv1"]["w"], stride=p["stride"])
    out = jax.nn.relu(bn(out, p["bn1"]))
    out = conv(out, p["conv2"]["w"])
    out = bn(out, p["bn2"])
    if "downsample" in p:
        res = bn(conv(x, p["downsample"]["w"], stride=p["stride"]),
                 p["downsample_bn"])
    else:
        res = x
    return jax.nn.relu(out + res)


def res_layer(x, blocks):
    for b in blocks:
        x = basic_block(x, b)
    return x


def featext_apply(params, x, return_stages: bool = False):
    """x: ``[N, H, W, 3]`` ImageNet-normalized. Returns three NHWC feature
    maps at 1/8, 1/4, 1/2 input resolution, each 32 channels (reference
    forward, feat_utils.py:370-374).

    return_stages: also return a dict of named intermediate activations
    (init / enc{i} / dec{i} / f{1,2,3}) for layer-by-layer checkpoint
    parity validation (scripts/validate_checkpoints.py)."""
    stages = {}
    out = conv(x, params["init_conv"]["w"], stride=2)
    out = jax.nn.relu(bn(out, params["init_bn"]))
    stages["init"] = out

    enc_out = []
    for i, stage in enumerate(params["enc"]):
        out = res_layer(out, stage)
        enc_out.append(out)
        stages[f"enc{i}"] = out

    dec_out = [out]
    x_ = out
    for i, d in enumerate(params["dec"]):
        x_ = deconv2x(x_, d["deconv"]["w"])
        x_ = jnp.concatenate([x_, enc_out[-2 - i]], axis=-1)
        x_ = conv(x_, d["post"]["w"])
        x_ = res_layer(x_, d["res"])
        dec_out.append(x_)
        stages[f"dec{i}"] = x_

    f1 = conv(dec_out[0], params["head1"]["w"])
    f2 = conv(dec_out[1], params["head2"]["w"])
    f3 = conv(dec_out[2], params["head3"]["w"])
    stages.update(f1=f1, f2=f2, f3=f3)
    if return_stages:
        return (f1, f2, f3), stages
    return f1, f2, f3
