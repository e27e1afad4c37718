"""LPIPS perceptual metric in JAX (VGG16 backbone + linear heads).

Behavioral spec from the reference's vendored ``lpipsPyTorch/`` (LPIPS v0.1,
VGG16 features from relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, per-channel
unit-normalize, learned 1x1 linear heads, spatial mean, summed across
stages; inputs scaled by ImageNet-style shift/scale constants).

Zero-egress environment: the VGG16 weights and LPIPS linear weights cannot
be downloaded here, so this module exposes converters from user-supplied
torch checkpoints (torchvision ``vgg16`` state dict + the richzhang
``vgg.pth`` linear weights) and a pure-JAX forward.  ``lpips_available``
gates usage.
"""

import os

import numpy as np

# torchvision VGG16 conv layer indices per stage (features module)
_VGG_SLICES = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
_CHANNELS = [64, 128, 256, 512, 512]

# LPIPS input normalization (lpips v0.1 scaling layer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def convert_vgg16_features(path_or_state):
    """torchvision VGG16 state dict -> list of per-stage conv params."""
    if isinstance(path_or_state, (str, bytes)):
        import torch
        state = torch.load(path_or_state, map_location="cpu",
                           weights_only=False)
    else:
        state = path_or_state
    if "state_dict" in state:
        state = state["state_dict"]

    import jax.numpy as jnp

    def conv_at(i):
        w = np.asarray(state[f"features.{i}.weight"].detach().numpy())
        b = np.asarray(state[f"features.{i}.bias"].detach().numpy())
        return {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "b": jnp.asarray(b),
        }

    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    return {str(i): conv_at(i) for i in conv_idx}


def convert_lpips_linear(path_or_state):
    """richzhang lpips vgg.pth -> list of [C] weights per stage."""
    if isinstance(path_or_state, (str, bytes)):
        import torch
        state = torch.load(path_or_state, map_location="cpu",
                           weights_only=False)
    else:
        state = path_or_state
    import jax.numpy as jnp
    lins = []
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        w = np.asarray(state[key].detach().numpy())  # [1, C, 1, 1]
        lins.append(jnp.asarray(w.reshape(-1)))
    return lins


def _vgg_stage_features(convs, x):
    """x NHWC in [-1, 1] -> list of 5 stage feature maps."""
    import jax
    import jax.numpy as jnp

    x = (x - _SHIFT) / _SCALE
    feats = []
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    pool_after = {4, 9, 16, 23}  # torchvision maxpool positions
    stage_ends = {3: 0, 8: 1, 15: 2, 22: 3, 29: 4}

    i_conv = 0
    for i in range(30):
        if i in conv_idx:
            p = convs[str(i)]
            x = jax.lax.conv_general_dilated(
                x, p["w"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["b"]
            i_conv += 1
        elif i in pool_after:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
        else:  # ReLU positions
            x = jax.nn.relu(x)
        if i in stage_ends:
            feats.append(x)
    return feats


def lpips(convs, lins, img1, img2):
    """img: ``[H, W, 3]`` in [0, 1]. Returns scalar LPIPS distance."""
    import jax.numpy as jnp

    def prep(im):
        return (jnp.asarray(im)[None] * 2.0 - 1.0).astype(jnp.float32)

    f1 = _vgg_stage_features(convs, prep(img1))
    f2 = _vgg_stage_features(convs, prep(img2))
    total = 0.0
    for a, b, w in zip(f1, f2, lins):
        na = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        nb = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        total = total + jnp.mean(jnp.sum(d * w, axis=-1))
    return total


def make_lpips_fn(vgg_path="ckpt/vgg16.pth", lin_path="ckpt/lpips_vgg.pth"):
    """Returns a jitted lpips(img1, img2) or None when weights absent."""
    if not (os.path.exists(vgg_path) and os.path.exists(lin_path)):
        return None
    import jax
    convs = convert_vgg16_features(vgg_path)
    lins = convert_lpips_linear(lin_path)
    return jax.jit(lambda a, b: lpips(convs, lins, a, b))


def lpips_available(vgg_path="ckpt/vgg16.pth",
                    lin_path="ckpt/lpips_vgg.pth") -> bool:
    return os.path.exists(vgg_path) and os.path.exists(lin_path)
