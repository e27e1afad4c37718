"""Torch->JAX conversion parity tests (SURVEY §7 hard part 5: numerical
parity of the frozen-network conversion)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from spurfies_tpu.convert.torch2jax import (  # noqa: E402
    _bn_fold,
    _conv_w,
    _deconv_w,
    convert_local_prior,
)
from spurfies_tpu.model.featext import basic_block, bn, conv, deconv2x
from spurfies_tpu.model.networks import mlp_apply


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


class TestConvPrimitives:
    def test_conv_stride2(self):
        tc = torch.nn.Conv2d(3, 8, 5, 2, 2, bias=False)
        x = torch.randn(1, 3, 16, 20)
        ref = tc(x).detach().numpy()
        w = _conv_w(tc.state_dict(), "weight")
        out = _nchw(conv(_nhwc(x), w["w"], stride=2))
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_deconv(self):
        td = torch.nn.ConvTranspose2d(6, 4, 3, 2, 1, 1, bias=False)
        x = torch.randn(1, 6, 9, 11)
        ref = td(x).detach().numpy()
        w = _deconv_w(td.state_dict(), "weight")
        out = _nchw(deconv2x(_nhwc(x), w["w"]))
        assert out.shape == ref.shape  # exact 2x upsample
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_bn_fold(self):
        tb = torch.nn.BatchNorm2d(5)
        tb.weight.data.uniform_(0.5, 1.5)
        tb.bias.data.uniform_(-1, 1)
        tb.running_mean.data.normal_()
        tb.running_var.data.uniform_(0.5, 2.0)
        tb.eval()
        x = torch.randn(2, 5, 4, 4)
        ref = tb(x).detach().numpy()
        sd = {f"b.{k}": v for k, v in tb.state_dict().items()}
        p = _bn_fold(sd, "b")
        out = _nchw(bn(_nhwc(x), p))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_basic_block_with_downsample(self):
        """Residual block conv-bn-relu-conv-bn (+1x1 downsample) + relu."""
        c1 = torch.nn.Conv2d(4, 8, 3, 2, 1, bias=False)
        b1 = torch.nn.BatchNorm2d(8).eval()
        c2 = torch.nn.Conv2d(8, 8, 3, 1, 1, bias=False)
        b2 = torch.nn.BatchNorm2d(8).eval()
        dc = torch.nn.Conv2d(4, 8, 1, 2, bias=False)
        db = torch.nn.BatchNorm2d(8).eval()
        for m in (b1, b2, db):
            m.running_mean.data.normal_()
            m.running_var.data.uniform_(0.5, 2.0)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.5, 0.5)

        x = torch.randn(1, 4, 10, 12)
        with torch.no_grad():
            ref = torch.relu(
                b2(c2(torch.relu(b1(c1(x))))) + db(dc(x))
            ).numpy()

        sd = {}
        for name, m in [("conv1", c1), ("conv2", c2)]:
            sd[f"{name}.weight"] = m.weight
        for name, m in [("bn1", b1), ("bn2", b2)]:
            for k, v in m.state_dict().items():
                sd[f"{name}.{k}"] = v
        sd["downsample.0.weight"] = dc.weight
        for k, v in db.state_dict().items():
            sd[f"downsample.1.{k}"] = v

        p = {
            "conv1": _conv_w(sd, "conv1.weight"),
            "bn1": _bn_fold(sd, "bn1"),
            "conv2": _conv_w(sd, "conv2.weight"),
            "bn2": _bn_fold(sd, "bn2"),
            "downsample": _conv_w(sd, "downsample.0.weight"),
            "downsample_bn": _bn_fold(sd, "downsample.1"),
            "stride": 2,
        }
        out = _nchw(basic_block(_nhwc(x), p))
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestLocalPrior:
    def _torch_prior(self):
        """Synthetic local-prior state dict with the reference's key scheme
        (train.py:124-139: *.local_sdf_field.<2i>.{weight,bias},
        density_branch.{weight,bias})."""
        layers = {}
        seq = torch.nn.Sequential(
            torch.nn.Linear(35, 256), torch.nn.LeakyReLU(),
            torch.nn.Linear(256, 256), torch.nn.LeakyReLU(),
            torch.nn.Linear(256, 256), torch.nn.LeakyReLU(),
            torch.nn.Linear(256, 256), torch.nn.LeakyReLU(),
            torch.nn.Linear(256, 256),
        )
        t = torch.nn.Linear(256, 1)
        sd = {"sdf_features": torch.zeros(10)}
        for i in (0, 2, 4, 6, 8):
            sd[f"module.decoder.local_sdf_field.{i}.weight"] = (
                seq[i].weight
            )
            sd[f"module.decoder.local_sdf_field.{i}.bias"] = seq[i].bias
        sd["density_branch.weight"] = t.weight
        sd["density_branch.bias"] = t.bias
        return {"model_state_dict": sd}, seq, t

    def test_remap_and_numerics(self):
        state, seq, t = self._torch_prior()
        frozen = convert_local_prior(state)
        assert len(frozen["F_geometry"]) == 5
        assert frozen["F_geometry"][0]["w"].shape == (35, 256)
        assert frozen["T"][0]["w"].shape == (256, 1)

        x = torch.randn(16, 35)
        with torch.no_grad():
            ref = t(seq(x)).numpy()
        h = mlp_apply(frozen["F_geometry"], jnp.asarray(x.numpy()))
        out = np.asarray(mlp_apply(frozen["T"], h))
        np.testing.assert_allclose(out, ref, atol=2e-5)
