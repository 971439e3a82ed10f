"""PyTorch ``.pth`` checkpoint porting + reference checkpoint semantics.

Because our param pytrees are keyed exactly like the reference state_dicts
and keep torch tensor layouts, porting is a cast — no transposes, no gate
reordering.  torch is used strictly for (de)serialization of the zipfile
``.pth`` format; no torch compute happens here.

Also reproduces the reference's checkpoint-surgery semantics
(SURVEY.md §5.4):
* ``combine_state_dicts`` with first-dict precedence and per-model name
  prefixes (learner.py:435-454),
* ``strict=False``-style partial loads (learner.py:485),
* epoch parsing from filename chars [-10:-4] (learner.py:465).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .common import Params


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth state_dict into numpy arrays (host-side)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def save_state_dict(params: Params, path: str) -> None:
    """Write params as a torch-loadable .pth state_dict (round-trippable)."""
    import torch

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}
    torch.save(sd, path)


def to_params(state_dict: Dict[str, np.ndarray], dtype=jnp.float32) -> Params:
    """numpy state_dict -> jnp param pytree (keys/layouts unchanged)."""
    out: Params = {}
    for k, v in state_dict.items():
        arr = jnp.asarray(v)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(dtype)
        out[k] = arr
    return out


def combine_state_dicts(
    state_dicts: Sequence[Dict[str, np.ndarray]],
    model_names: Optional[Sequence[str]] = None,
) -> Dict[str, np.ndarray]:
    """Merge multiple state dicts; first dict wins on key conflicts
    (learner.py:435-454)."""
    combined: Dict[str, np.ndarray] = {}
    for sd_i, sd in enumerate(state_dicts):
        for key, value in sd.items():
            if model_names is not None:
                key = f"{model_names[sd_i]}.{key}"
            if key not in combined:
                combined[key] = value
    return combined


def load_into(
    params: Params,
    state_dict: Dict[str, np.ndarray],
    strict: bool = False,
    prefix: str = "",
) -> Params:
    """Load state_dict values into an existing param pytree.

    strict=False keeps existing values for missing keys and ignores
    unexpected ones, mirroring torch's ``load_state_dict(strict=False)``.
    """
    new = dict(params)
    missing = []
    for k in params:
        sk = k[len(prefix):] if prefix and k.startswith(prefix) else k
        if sk in state_dict:
            v = jnp.asarray(state_dict[sk])
            if jnp.issubdtype(v.dtype, jnp.floating):
                v = v.astype(params[k].dtype)
            if v.shape != params[k].shape:
                raise ValueError(f"shape mismatch for {k}: {v.shape} vs {params[k].shape}")
            new[k] = v
        else:
            missing.append(k)
    if strict:
        unexpected = [k for k in state_dict if prefix + k not in params]
        if missing or unexpected:
            raise KeyError(f"missing={missing[:5]}... unexpected={unexpected[:5]}...")
    return new


def parse_epoch_from_path(checkpoint_path: str) -> int:
    """Epoch count from filename chars [-10:-4] (learner.py:464-468)."""
    try:
        return int(checkpoint_path[-10:-4])
    except (ValueError, TypeError):
        return 0
