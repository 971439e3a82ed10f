"""CLI: package sim rollouts into the h5 dataset schema / inspect an h5.

Replaces utils/to_h5.py (convert/view tasks).  Usage:

  python -m evfly_tpu.data.package_h5 <dataset_path> view
  (conversion from trajectory folders happens through
   sim.closed_loop.rollout_to_trajectory + write_h5_dataset; the reference's
   folder-of-pngs input format requires the original sim assets)
"""

from __future__ import annotations

import sys

import h5py


def h5dump(path: str, group: str = "/"):
    def descend(obj, sep="\t"):
        if isinstance(obj, (h5py.Group, h5py.File)):
            for key in obj.keys():
                print(f"{sep}- {key}: {obj[key]}")
                descend(obj[key], sep + "\t")

    with h5py.File(path, "r") as f:
        descend(f[group])


def main():
    if len(sys.argv) < 3:
        print("Usage: python -m evfly_tpu.data.package_h5 <dataset> <task:view>")
        sys.exit(1)
    dataset, task = sys.argv[1], sys.argv[2]
    path = dataset if dataset.endswith(".h5") else dataset + ".h5"
    if task == "view":
        h5dump(path)
    else:
        print(f"Unknown task {task}")
        sys.exit(1)


if __name__ == "__main__":
    main()
