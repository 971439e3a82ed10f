"""Dataset-level event generation CLI — utils/to_events.py parity, TPU-native.

The reference converts rollout image sequences to event frames via
SuperSloMo upsampling + CUDA esim_torch, then windowed histogram2d
accumulation, writing ``evs_frames.npy`` (and a ``evs_frames_difflog.npy``
approximation) (to_events.py:146-456).  Here both representations come from
jitted scans over the image sequences already stored in the h5 dataset:

* ``esim``: the ESIM contrast model with carried per-pixel reference levels
  (ops/esim.py) — the Vid2E replacement (linear-in-log interpolation instead
  of learned frame interpolation; documented divergence),
* ``esim_flow``: ESIM on a flow-upsampled frame sequence (ops/upsample.py —
  the full Vid2E analog, with the renderer's exact optical flow standing in
  for SuperSloMo's estimate); requires a per-trajectory ``flows`` dataset in
  the h5 (datagen --record-flow),
* ``difflog``: the per-frame-pair quantized difflog (ops/voxelizer.py),
  matching to_events.py:419-439 exactly.

Usage:
  python -m evfly_tpu.data.to_events --dataset path/to/dataset \
      [--scheme esim|esim_flow|difflog] [--thresh 0.2] [--output_suffix name]

Writes the per-trajectory event frames back into the h5 under ``evs`` (the
training input schema slot) or as a sibling object-array .npy matching the
reference's output format.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def generate_events_for_dataset(
    h5_path: str,
    scheme: str = "esim",
    thresh: float = 0.2,
    write_npy: bool = True,
    write_h5: bool = True,
    out_name: str = "evs_frames",
):
    import h5py
    import jax.numpy as jnp

    from ..ops.esim import esim_event_frames, esim_event_frames_upsampled
    from ..ops.voxelizer import difflog_events

    all_frames = []
    with h5py.File(h5_path, "r+" if write_h5 else "r") as f:
        for name in list(f.keys()):
            ims = np.asarray(f[name]["ims"][()], np.float32)
            if scheme == "esim":
                ev = np.asarray(esim_event_frames(jnp.asarray(ims), thresh, thresh))
            elif scheme == "esim_flow":
                if "flows" not in f[name]:
                    raise ValueError(
                        f"scheme=esim_flow needs a 'flows' dataset in trajectory "
                        f"{name!r} — regenerate with `python tools/datagen.py "
                        f"--record-flow` (or use scheme=esim)"
                    )
                flows = np.asarray(f[name]["flows"][()], np.float32)
                ts = np.asarray(f[name]["data"][()], np.float32)[:, 1]
                ev = esim_event_frames_upsampled(ims, flows, ts, thresh, thresh)
            elif scheme == "difflog":
                ev = np.stack(
                    [
                        np.asarray(difflog_events(jnp.asarray(ims[i]), jnp.asarray(ims[i - 1]), thresh, thresh))
                        for i in range(1, len(ims))
                    ]
                )
            else:
                raise ValueError(scheme)
            all_frames.append(ev)
            if write_h5:
                if "evs" in f[name]:
                    del f[name]["evs"]
                f[name].create_dataset("evs", data=ev)

    if write_npy:
        out = os.path.join(
            os.path.dirname(h5_path),
            f"{out_name}{'_difflog' if scheme == 'difflog' else ''}.npy",
        )
        obj = np.empty(len(all_frames), dtype=object)
        for i, fr in enumerate(all_frames):
            obj[i] = fr
        np.save(out, obj)
        print(f"Saved {len(all_frames)} trajectories of evframes to {out}")
    return all_frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, required=True, help="dataset path (with or without .h5)")
    ap.add_argument(
        "--scheme", type=str, default="esim", choices=["esim", "esim_flow", "difflog"]
    )
    ap.add_argument("--thresh", type=float, default=0.2)
    ap.add_argument("--no_h5", action="store_true", help="do not write evs back into the h5")
    args = ap.parse_args()
    h5_path = args.dataset if args.dataset.endswith(".h5") else args.dataset + ".h5"
    generate_events_for_dataset(h5_path, args.scheme, args.thresh, write_h5=not args.no_h5)


if __name__ == "__main__":
    main()
