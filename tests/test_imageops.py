"""Parity tests: evfly_tpu.ops.imageops vs torch (CPU oracle).

torch here is used ONLY as the numerical oracle; the compute path under test
is pure JAX.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from evfly_tpu import ops

TOL = 1e-5


def _np(x):
    return np.asarray(x)


def test_conv2d_valid_odd_shapes(rng):
    x = rng.standard_normal((2, 3, 29, 37)).astype(np.float32)
    w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    ours = ops.conv2d(jnp.array(x), jnp.array(w), jnp.array(b), stride=1, padding=0)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b))
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=TOL, rtol=1e-4)


def test_conv2d_stride_padding(rng):
    x = rng.standard_normal((1, 4, 33, 45)).astype(np.float32)
    w = rng.standard_normal((6, 4, 5, 5)).astype(np.float32)
    ours = ops.conv2d(jnp.array(x), jnp.array(w), None, stride=2, padding=1)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1)
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=TOL, rtol=1e-4)


def test_conv2d_same_depthwise(rng):
    # MixFFN depthwise conv: padding='same', groups=channels (ViTsubmodules.py:92)
    c = 16
    x = rng.standard_normal((2, c, 15, 23)).astype(np.float32)
    w = rng.standard_normal((c, 1, 3, 3)).astype(np.float32)
    ours = ops.conv2d(jnp.array(x), jnp.array(w), None, padding="same", groups=c)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding="same", groups=c)
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=TOL, rtol=1e-4)


@pytest.mark.parametrize("stride,pad,k", [(2, 0, 2), (3, 0, 5), (2, 1, 3), (5, 0, 7)])
def test_conv_transpose2d(rng, stride, pad, k):
    x = rng.standard_normal((2, 6, 11, 14)).astype(np.float32)
    w = rng.standard_normal((6, 4, k, k)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    ours = ops.conv_transpose2d(jnp.array(x), jnp.array(w), jnp.array(b), stride=stride, padding=pad)
    ref = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=stride, padding=pad
    )
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=TOL, rtol=1e-4)


@pytest.mark.parametrize("k,s,shape", [(2, 2, (33, 45)), (3, 1, (17, 25)), (2, 3, (60, 90)), (2, 1, (19, 19))])
def test_max_pool2d_floor_semantics(rng, k, s, shape):
    x = rng.standard_normal((2, 3, *shape)).astype(np.float32)
    ours = ops.max_pool2d(jnp.array(x), k, s)
    ref = F.max_pool2d(torch.from_numpy(x), k, s)
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=TOL)


@pytest.mark.parametrize("k,s", [(3, 1), (2, 1), (2, 2)])
def test_avg_pool2d(rng, k, s):
    x = rng.standard_normal((2, 3, 21, 29)).astype(np.float32)
    ours = ops.avg_pool2d(jnp.array(x), k, s)
    ref = F.avg_pool2d(torch.from_numpy(x), k, s)
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=TOL)


@pytest.mark.parametrize(
    "in_hw,out_hw,align",
    [
        ((68, 148), (260, 346), False),  # OrigUNet form_output upsample
        ((260, 346), (60, 90), False),  # refine_inputs downsample
        ((15, 23), (16, 24), True),  # LSTMNetVIT nn.Upsample align_corners=True
        ((64, 86), (24, 44), False),
        ((5, 7), (5, 7), False),  # identity
    ],
)
def test_interpolate_bilinear(rng, in_hw, out_hw, align):
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    ours = ops.interpolate_bilinear(jnp.array(x), out_hw, align_corners=align)
    ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align)
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=1e-4, rtol=1e-4)


def test_pixel_shuffle(rng):
    x = rng.standard_normal((2, 48, 8, 12)).astype(np.float32)
    ours = ops.pixel_shuffle(jnp.array(x), 2)
    ref = F.pixel_shuffle(torch.from_numpy(x), 2)
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=TOL)


def test_layer_norm(rng):
    x = rng.standard_normal((2, 17, 32)).astype(np.float32)
    w = rng.standard_normal((32,)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    ours = ops.layer_norm(jnp.array(x), jnp.array(w), jnp.array(b))
    ref = F.layer_norm(torch.from_numpy(x), (32,), torch.from_numpy(w), torch.from_numpy(b))
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=1e-5, rtol=1e-4)


def test_batch_norm2d_eval_and_train(rng):
    x = rng.standard_normal((4, 5, 9, 11)).astype(np.float32)
    w = rng.standard_normal((5,)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    rm = rng.standard_normal((5,)).astype(np.float32)
    rv = rng.random((5,)).astype(np.float32) + 0.5

    ours_eval, _, _ = ops.batch_norm2d(
        jnp.array(x), jnp.array(w), jnp.array(b), jnp.array(rm), jnp.array(rv), training=False
    )
    ref_eval = F.batch_norm(
        torch.from_numpy(x), torch.from_numpy(rm), torch.from_numpy(rv),
        torch.from_numpy(w), torch.from_numpy(b), training=False,
    )
    np.testing.assert_allclose(_np(ours_eval), ref_eval.numpy(), atol=1e-5, rtol=1e-4)

    ours_tr, new_m, new_v = ops.batch_norm2d(
        jnp.array(x), jnp.array(w), jnp.array(b), jnp.array(rm), jnp.array(rv), training=True
    )
    rm_t, rv_t = torch.from_numpy(rm.copy()), torch.from_numpy(rv.copy())
    ref_tr = F.batch_norm(
        torch.from_numpy(x), rm_t, rv_t, torch.from_numpy(w), torch.from_numpy(b),
        training=True, momentum=0.1,
    )
    np.testing.assert_allclose(_np(ours_tr), ref_tr.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(_np(new_m), rm_t.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(_np(new_v), rv_t.numpy(), atol=1e-5, rtol=1e-4)


def test_spectral_linear_matches_torch_eval(rng):
    torch.manual_seed(3)
    lin = torch.nn.utils.spectral_norm(torch.nn.Linear(13, 7))
    lin.eval()
    x = rng.standard_normal((5, 13)).astype(np.float32)
    with torch.no_grad():
        ref = lin(torch.from_numpy(x))
    sd = lin.state_dict()
    ours = ops.spectral_linear(
        jnp.array(x),
        jnp.array(sd["weight_orig"].numpy()),
        jnp.array(sd["weight_u"].numpy()),
        jnp.array(sd["weight_v"].numpy()),
        jnp.array(sd["bias"].numpy()),
    )
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=1e-5, rtol=1e-4)


def test_spectral_power_iteration_matches_torch_train(rng):
    torch.manual_seed(4)
    lin = torch.nn.utils.spectral_norm(torch.nn.Linear(11, 9))
    sd0 = {k: v.clone() for k, v in lin.state_dict().items()}
    x = torch.from_numpy(rng.standard_normal((3, 11)).astype(np.float32))
    lin.train()
    with torch.no_grad():
        ref = lin(x)  # performs one power iteration then applies W/sigma
    u, v = ops.spectral_norm_power_iteration(
        jnp.array(sd0["weight_orig"].numpy()),
        jnp.array(sd0["weight_u"].numpy()),
        jnp.array(sd0["weight_v"].numpy()),
    )
    ours = ops.spectral_linear(
        jnp.array(x.numpy()), jnp.array(sd0["weight_orig"].numpy()), u, v,
        jnp.array(sd0["bias"].numpy()),
    )
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=1e-4, rtol=1e-4)
    # updated u must match torch's stored u after the train-mode forward
    np.testing.assert_allclose(_np(u), lin.state_dict()["weight_u"].numpy(), atol=1e-5)


def test_gelu_exact_vs_torch(rng):
    x = rng.standard_normal((100,)).astype(np.float32) * 3
    ours = ops.gelu_exact(jnp.array(x))
    ref = F.gelu(torch.from_numpy(x))  # default erf form
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=1e-6)


def test_leaky_relu_default_slope(rng):
    x = rng.standard_normal((64,)).astype(np.float32)
    np.testing.assert_allclose(
        _np(ops.leaky_relu(jnp.array(x))),
        F.leaky_relu(torch.from_numpy(x)).numpy(),
        atol=1e-7,
    )
