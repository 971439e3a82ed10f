"""Gradient parity vs the reference PyTorch models.

The forward-parity suite (test_model_parity.py) proves the JAX forward
matches torch; this proves the BACKWARD does too — same ported weights, same
batch, same loss (velocity MSE with the z-prediction zeroed exactly as the
reference training loop does at learner.py:1066,1074), gradients compared
per parameter.

Motivated by the round-4 dodge diagnosis: every trained policy emitted a
near-constant lateral velocity, which would be explained by a broken/detached
gradient path through the ViTLSTM velocity head.  If these tests pass, the
training math is sound and the failure is data/optimization, not the
framework.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evfly_tpu.models import port
from evfly_tpu.models import vitfly as jvitfly
from evfly_tpu.train.stepfn import apply_for_loss

from conftest import REFERENCE_ROOT, has_reference

pytestmark = pytest.mark.reference

if has_reference():
    sys.path.insert(0, str(REFERENCE_ROOT / "learner"))
    import torch

    import vitfly_models as ref_vitfly  # noqa: E402


def _port_sd(model):
    return port.to_params({k: v.detach().numpy() for k, v in model.state_dict().items()})


def test_vitlstm_velocity_grad_parity():
    """LSTMNetVIT: d(vel MSE)/d(params) matches torch within 1e-4 rel."""
    torch.manual_seed(0)
    tm = ref_vitfly.LSTMNetVIT()
    tm.eval()  # eval-mode grads: no dropout/BN-update stochasticity
    params = _port_sd(tm)

    rng = np.random.default_rng(42)
    N = 6
    x = rng.uniform(0.0, 1.0, (N, 1, 60, 90)).astype(np.float32)
    dv = np.full((N, 1), 0.4, np.float32)
    gt = rng.normal(0.0, 0.3, (N, 3)).astype(np.float32)
    gt[:, 2] = 0.0

    # ---- torch ----
    tx = torch.tensor(x, requires_grad=False)
    tdv = torch.tensor(dv)
    tgt = torch.tensor(gt)
    pred, _h = tm([tx, tdv, None, None])
    pred = pred.clone()
    pred[:, 2] = 0.0  # reference learner.py:1066 (in-place on a non-leaf)
    loss_t = torch.nn.functional.mse_loss(tgt, pred)
    loss_t.backward()
    tgrads = {k: p.grad.detach().numpy() for k, p in tm.named_parameters() if p.grad is not None}

    # ---- jax ----
    jm = jvitfly.LSTMNetVIT()

    def loss_fn(p):
        vel, _vision, _updates = apply_for_loss(
            jm, "vitfly", p, jnp.asarray(x), jnp.asarray(dv), False, None
        )
        return jnp.mean(jnp.square(jnp.asarray(gt) - vel))

    loss_j, jgrads = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_j), float(loss_t.item()), rtol=1e-4)

    checked = 0
    worst = (0.0, None)
    for k, tg in tgrads.items():
        jg = np.asarray(jgrads[k])
        assert jg.shape == tg.shape, k
        denom = max(np.abs(tg).max(), 1e-6)
        rel = np.abs(jg - tg).max() / denom
        if rel > worst[0]:
            worst = (rel, k)
        checked += 1
    assert checked > 20, "expected grads for every torch parameter"
    assert worst[0] < 1e-3, f"grad mismatch: {worst[1]} rel={worst[0]:.2e}"

    # the probe's failure mode: gradients through the IMAGE branch must be
    # alive (a dead/detached visual path would zero conv grads while the
    # LSTM biases still move)
    g_conv = np.abs(np.asarray(jgrads["encoder_blocks.0.patchMerge.cn1.weight"])).max()
    assert g_conv > 0.0, "image-branch gradient is exactly zero (detached path)"


def test_vitlstm_grads_nonzero_through_time():
    """Velocity loss on the LAST frame only still reaches the conv weights
    (recurrence carries gradient back through the scan)."""
    torch.manual_seed(0)
    tm = ref_vitfly.LSTMNetVIT()
    params = _port_sd(tm)
    jm = jvitfly.LSTMNetVIT()

    rng = np.random.default_rng(1)
    x = rng.uniform(0.0, 1.0, (8, 1, 60, 90)).astype(np.float32)
    dv = np.full((8, 1), 0.4, np.float32)

    def loss_fn(p):
        vel, _vision, _ = apply_for_loss(
            jm, "vitfly", p, jnp.asarray(x), jnp.asarray(dv), False, None
        )
        return jnp.sum(jnp.square(vel[-1, :2]))

    g = jax.grad(loss_fn)(params)
    gmax = np.abs(np.asarray(g["encoder_blocks.0.patchMerge.cn1.weight"])).max()
    assert gmax > 0.0
