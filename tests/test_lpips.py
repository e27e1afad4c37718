"""LPIPS converter/forward parity vs a hand-built torch VGG16 slice."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from spurfies_tpu.eval.lpips_jax import (  # noqa: E402
    _SCALE,
    _SHIFT,
    _vgg_stage_features,
    convert_lpips_linear,
    convert_vgg16_features,
    lpips,
)

VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]


def _torch_vgg16_features():
    """torchvision-layout VGG16 `features` Sequential (random init)."""
    layers = []
    in_c = 3
    for v in VGG_CFG:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_c, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            in_c = v
    return torch.nn.Sequential(*layers)


class TestLPIPS:
    def test_stage_features_match_torch(self):
        torch.manual_seed(0)
        feats = _torch_vgg16_features().eval()
        sd = {f"features.{i}.{k}": v
              for i, m in enumerate(feats)
              for k, v in m.state_dict().items()}
        convs = convert_vgg16_features(sd)

        x = torch.rand(1, 3, 32, 32)
        xin = (x * 2 - 1 - torch.tensor(_SHIFT).view(1, 3, 1, 1)) / \
            torch.tensor(_SCALE).view(1, 3, 1, 1)
        stage_ends = [3, 8, 15, 22, 29]
        refs = []
        h = xin
        with torch.no_grad():
            for i, m in enumerate(feats):
                h = m(h)
                if i in stage_ends:
                    refs.append(h.numpy())

        x_nhwc = jnp.asarray((x[0] * 2 - 1).numpy().transpose(1, 2, 0))
        ours = _vgg_stage_features(convs, x_nhwc[None])
        assert len(ours) == 5
        for o, r in zip(ours, refs):
            np.testing.assert_allclose(
                np.asarray(o)[0].transpose(2, 0, 1), r[0], atol=1e-4
            )

    def test_lpips_zero_for_identical(self):
        torch.manual_seed(1)
        feats = _torch_vgg16_features().eval()
        sd = {f"features.{i}.{k}": v
              for i, m in enumerate(feats)
              for k, v in m.state_dict().items()}
        convs = convert_vgg16_features(sd)
        lins = [jnp.ones(c) * 0.1 for c in (64, 128, 256, 512, 512)]
        img = np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(
            np.float32
        )
        d = lpips(convs, lins, img, img)
        np.testing.assert_allclose(float(d), 0.0, atol=1e-6)
        d2 = lpips(convs, lins, img, np.roll(img, 5, axis=0))
        assert float(d2) > 0

    def test_linear_converter(self):
        sd = {
            f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1)
            for i, c in enumerate((64, 128, 256, 512, 512))
        }
        lins = convert_lpips_linear(sd)
        assert [l.shape[0] for l in lins] == [64, 128, 256, 512, 512]
