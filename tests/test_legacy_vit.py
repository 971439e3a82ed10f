"""Golden parity: models/legacy_vit.LegacyTransformer vs the reference's
legacy competition-era ViT (envtest/ros/network.py — dead code in the
reference, rebuilt for §2 inventory completeness).  Same oracle pattern as
test_model_parity: build the torch module, port its state_dict, compare."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from evfly_tpu.models import port
from evfly_tpu.models.legacy_vit import LegacyTransformer

from conftest import REFERENCE_ROOT, has_reference

pytestmark = pytest.mark.reference

if has_reference():
    sys.path.insert(0, str(REFERENCE_ROOT / "envtest" / "ros"))
    import torch

    import network as ref_network  # noqa: E402


def _make_pair(img_size=(60, 90), patch=6, in_chans=1, embed=96, layers=3,
               heads=4, expansion=4, seed=0):
    torch.manual_seed(seed)
    tmodel = ref_network.Transformer(
        img_size=img_size, patch_size=patch, in_chans=in_chans,
        embed_size=embed, num_layers=layers, heads=heads,
        device="cpu", forward_expansion=expansion, dropout=0.0,
    ).eval()
    # zero-init cls/pos match already; perturb them so the test is not
    # trivially comparing zeros
    with torch.no_grad():
        tmodel.cls_token.normal_(0, 0.02)
        tmodel.pos_embed.normal_(0, 0.02)
    jmodel = LegacyTransformer(
        img_size=img_size, patch_size=patch, in_chans=in_chans,
        embed_size=embed, num_layers=layers, heads=heads,
        forward_expansion=expansion,
    )
    params = port.to_params(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    )
    return tmodel, jmodel, params


def test_state_dict_keys_match():
    tmodel, jmodel, params = _make_pair()
    jkeys = set(jmodel.init(__import__("jax").random.PRNGKey(0)).keys())
    tkeys = set(tmodel.state_dict().keys())
    assert jkeys == tkeys


@pytest.mark.parametrize("seed", [0, 3])
def test_forward_parity(seed):
    tmodel, jmodel, params = _make_pair(seed=seed)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, 1, 60, 90)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), None).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape == (3,)  # reference returns out[0] only
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_forward_parity_other_geometry():
    """Non-default geometry: rectangular image, 2 channels, 2 heads."""
    tmodel, jmodel, params = _make_pair(
        img_size=(48, 72), patch=8, in_chans=2, embed=64, layers=2, heads=2,
        expansion=2, seed=7,
    )
    rng = np.random.default_rng(7)
    x = rng.standard_normal((3, 2, 48, 72)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), None).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4)
