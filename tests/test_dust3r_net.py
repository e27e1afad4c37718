"""DUSt3R-net component tests: layer parity vs torch + pipeline shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spurfies_tpu.prep.dust3r_net import (
    Dust3rConfig,
    apply_rope,
    attention,
    infer_pair,
    init_dust3r,
    layer_norm,
    rope2d_angles,
)

TINY = Dust3rConfig(
    img_size=(64, 64), patch=16, enc_dim=64, enc_depth=2, enc_heads=4,
    dec_dim=32, dec_depth=2, dec_heads=2,
)


class TestRope:
    def test_norm_preserving(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 16, 32)).astype(np.float32))
        pos = jnp.asarray(rng.integers(0, 10, (16, 2)).astype(np.float32))
        cos, sin = rope2d_angles(pos, 32)
        y = apply_rope(x, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5,
        )

    def test_relative_property(self, rng):
        """<rope(q,p1), rope(k,p2)> depends only on p1-p2 (per axis)."""
        q = rng.normal(size=(1, 1, 8)).astype(np.float32)
        k = rng.normal(size=(1, 1, 8)).astype(np.float32)

        def dot_at(p1, p2):
            c1, s1 = rope2d_angles(jnp.asarray([p1], jnp.float32), 8)
            c2, s2 = rope2d_angles(jnp.asarray([p2], jnp.float32), 8)
            rq = apply_rope(jnp.asarray(q), c1, s1)
            rk = apply_rope(jnp.asarray(k), c2, s2)
            return float(jnp.sum(rq * rk))

        a = dot_at([2.0, 3.0], [5.0, 1.0])
        b = dot_at([4.0, 7.0], [7.0, 5.0])  # same (dy, dx) = (-3, 2)
        assert a == pytest.approx(b, rel=1e-4)

    def test_identity_at_origin(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 1, 16)).astype(np.float32))
        cos, sin = rope2d_angles(jnp.zeros((1, 2)), 16)
        np.testing.assert_allclose(np.asarray(apply_rope(x, cos, sin)),
                                   np.asarray(x), atol=1e-6)


class TestLayersVsTorch:
    def test_layernorm(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.normal(size=(5, 16)).astype(np.float32)
        tln = torch.nn.LayerNorm(16)
        tln.weight.data.uniform_(0.5, 1.5)
        tln.bias.data.uniform_(-0.5, 0.5)
        ref = tln(torch.from_numpy(x)).detach().numpy()
        p = {"g": jnp.asarray(tln.weight.detach().numpy()),
             "b": jnp.asarray(tln.bias.detach().numpy())}
        ours = layer_norm(p, jnp.asarray(x), eps=1e-5)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_attention_no_rope(self, rng):
        torch = pytest.importorskip("torch")
        d, h, n = 32, 4, 9
        x = rng.normal(size=(n, d)).astype(np.float32)
        mha = torch.nn.MultiheadAttention(d, h, bias=True,
                                          batch_first=True)
        with torch.no_grad():
            ref = mha(torch.from_numpy(x)[None],
                      torch.from_numpy(x)[None],
                      torch.from_numpy(x)[None])[0][0].numpy()
        w = mha.in_proj_weight.detach().numpy()
        b = mha.in_proj_bias.detach().numpy()
        p = {
            "q": {"w": jnp.asarray(w[:d].T), "b": jnp.asarray(b[:d])},
            "k": {"w": jnp.asarray(w[d:2 * d].T),
                  "b": jnp.asarray(b[d:2 * d])},
            "v": {"w": jnp.asarray(w[2 * d:].T),
                  "b": jnp.asarray(b[2 * d:])},
            "proj": {
                "w": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
                "b": jnp.asarray(mha.out_proj.bias.detach().numpy()),
            },
        }
        ours = attention(p, jnp.asarray(x), jnp.asarray(x), h)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


class TestFullNet:
    def test_shapes_and_pipeline(self, rng):
        params = init_dust3r(jax.random.PRNGKey(0), TINY)
        img1 = jnp.asarray(rng.uniform(-1, 1, (64, 64, 3)).astype(
            np.float32))
        img2 = jnp.asarray(rng.uniform(-1, 1, (64, 64, 3)).astype(
            np.float32))
        out = infer_pair(params, img1, img2, TINY)
        assert out["pts1"].shape == (64, 64, 3)
        assert out["conf1"].shape == (64, 64)
        assert np.all(np.asarray(out["conf1"]) >= 1.0)
        for v in out.values():
            assert np.all(np.isfinite(np.asarray(v)))

        # pointmaps feed the alignment optimizer end-to-end
        from spurfies_tpu.prep.alignment import AlignConfig, align_pointmaps
        edges = np.array([[0, 1]])
        res = align_pointmaps(
            edges,
            np.asarray(out["pts1"]).reshape(1, -1, 3)[:, :256],
            np.asarray(out["pts2"]).reshape(1, -1, 3)[:, :256],
            np.asarray(out["conf1"]).reshape(1, -1)[:, :256],
            np.asarray(out["conf2"]).reshape(1, -1)[:, :256],
            n_views=2, cfg=AlignConfig(iters=10),
        )
        assert np.isfinite(res["loss"])
