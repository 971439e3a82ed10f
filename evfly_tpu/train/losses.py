"""Loss semantics parity with the reference training loop (learner.py:1101-1144).

Per-term weighted MSE with the reference's optional-loss-param behaviors:

* term 0 (velocity), optional_loss_param[0] != 0: elementwise MSE up-weighted
  by optional_loss_param[0] on frames where the GT y or z command is nonzero
  (:1105-1113).  The *logged* value is the unweighted mean; the *backprop*
  term is the scaled mean.
* term 1 (vision), optional_loss_param[1] != 0: elementwise MSE; if the param
  is < 0, scaled by 1/(gt + 0.1) (inverse-depth weighting, :1121-1124); if
  exactly -2.0, additionally masked to gt < 0.99 (:1126-1128).
* otherwise plain MSE.

Velocity ground truth is normalized by desired velocity (gt/desvel,
learner.py:1026) before reaching these functions.

All functions accept a frame-validity mask so padded chunk tails (our static-
shape batching of the reference's ragged final chunks) contribute zero and
means divide by the true element counts — bitwise-identical math to the
reference's unpadded ``.mean()``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid frames only. mask: (N,) broadcast over trailing dims."""
    m = mask.reshape((-1,) + (1,) * (x.ndim - 1))
    num = jnp.sum(x * m)
    per_frame = 1
    for d in x.shape[1:]:
        per_frame *= d
    den = jnp.sum(mask) * per_frame
    return num / jnp.maximum(den, 1.0)


def velocity_loss(
    gt_norm: jnp.ndarray,   # (N, 3) velcmd / desvel
    pred: jnp.ndarray,      # (N, 3)
    mask: jnp.ndarray,      # (N,)
    optional_param: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (backprop_term, logged_value)."""
    err = jnp.square(gt_norm - pred)
    value = _masked_mean(err, mask)
    if optional_param == 0.0:
        return value, value
    nonzero_yz = (jnp.abs(gt_norm[:, 1]) > 0.0) | (jnp.abs(gt_norm[:, 2]) > 0.0)
    scaler = jnp.where(nonzero_yz, optional_param, 1.0)[:, None]
    term = _masked_mean(err * scaler, mask)
    return term, value


def vision_loss(
    gt_norm: jnp.ndarray,   # (N, 1, H, W)
    pred: jnp.ndarray,      # (N, 1, H, W)
    mask: jnp.ndarray,      # (N,)
    optional_param: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    err = jnp.square(gt_norm - pred)
    value = _masked_mean(err, mask)
    if optional_param == 0.0:
        return value, value
    scaled = err
    if optional_param < 0:
        scaled = scaled * (1.0 / (gt_norm + 0.1))
    if optional_param == -2.0:
        scaled = scaled * (gt_norm < 0.99).astype(scaled.dtype)
    term = _masked_mean(scaled, mask)
    return term, value


def combined_loss(
    gt_norms: Sequence[jnp.ndarray],
    preds: Sequence[jnp.ndarray],
    mask: jnp.ndarray,
    loss_weights: Optional[Sequence[float]],
    optional_loss_param: Optional[Sequence[float]],
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Weighted sum of loss terms -> (batch_loss, [logged_values])."""
    if loss_weights is None:
        weights = [1.0] * len(gt_norms)
    else:
        weights = list(loss_weights)
    olp = list(optional_loss_param) if optional_loss_param is not None else [0.0, 0.0]
    while len(olp) < len(gt_norms):
        olp.append(0.0)

    total = 0.0
    values = []
    for i, (gt, pred) in enumerate(zip(gt_norms, preds)):
        if i == 0:
            term, value = velocity_loss(gt, pred, mask, olp[0])
        elif i == 1:
            term, value = vision_loss(gt, pred, mask, olp[1])
        else:
            value = _masked_mean(jnp.square(gt - pred), mask)
            term = value
        total = total + weights[i] * term
        values.append(value)
    return total, values
