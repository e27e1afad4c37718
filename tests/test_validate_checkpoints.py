"""End-to-end test of the one-command checkpoint parity harness
(VERDICT r2 #5): synthesize reference-key-scheme torch checkpoints and
validate them through the real conversion + activation-diff path."""

import os
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import validate_checkpoints as vc  # noqa: E402


def test_local_prior_parity(tmp_path):
    path = str(tmp_path / "local_prior.pt")
    vc.make_synthetic_local_prior(path)
    rep = vc.validate_local_prior(path)
    assert rep.ok, [r for r in rep.rows if not r[2]]
    assert len(rep.rows) == 7  # 5 linears + T + e2e


def test_local_prior_detects_converter_bug(tmp_path, monkeypatch):
    """The harness validates the CONVERTER (both sides read the same state
    dict, so corrupting the checkpoint changes both identically) — inject a
    classic converter bug (missing weight transpose) and require a FAIL."""
    path = str(tmp_path / "local_prior.pt")
    vc.make_synthetic_local_prior(path)

    from spurfies_tpu.convert import torch2jax

    real = torch2jax.convert_local_prior

    def buggy(state):
        frozen = real(state)
        frozen["F_geometry"][2]["w"] = frozen["F_geometry"][2]["w"].T
        return frozen

    # validate_local_prior imports the symbol locally; patch at source
    monkeypatch.setattr(torch2jax, "convert_local_prior", buggy)
    rep = vc.validate_local_prior(path)
    assert not rep.ok
    bad = [name for name, _, ok in rep.rows if not ok]
    assert "F_geometry.2" in bad


@pytest.mark.skipif(not os.path.isdir(vc.REFERENCE_DIR),
                    reason="reference dir unavailable")
def test_vismvsnet_parity(tmp_path):
    path = str(tmp_path / "vismvsnet.pt")
    vc.make_synthetic_vismvsnet(path)
    rep = vc.validate_vismvsnet(path, hw=(32, 48))
    assert rep.ok, [r for r in rep.rows if not r[2]]
    names = [r[0] for r in rep.rows]
    assert {"init", "enc0", "dec1", "f3"} <= set(names)


def test_dust3r_structural(tmp_path):
    import dataclasses

    path = str(tmp_path / "dust3r.pth")
    cfg = vc.make_synthetic_dust3r(path)
    state = torch.load(path, weights_only=False)["model"]
    tracked = vc._TrackedState(state)
    from spurfies_tpu.prep.dust3r_net import convert_dust3r
    convert_dust3r(tracked, dataclasses.replace(cfg, img_size=(64, 96)))
    assert set(state) == tracked.accessed  # full key coverage both ways
