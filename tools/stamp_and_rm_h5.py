#!/usr/bin/env python
"""Stamp a dataset h5's identity and delete the h5 to reclaim disk.

The preprocessed-tensor cache keys on (path, mtime_ns, size) of the source
h5 (evfly_tpu/data/dataloading.py probe); writing those to a sidecar
``<name>.h5.stat.json`` preserves cache hits after the multi-GB h5 is
deleted.  Disk is the scarce resource on this host (the round-4 datasets
alone are ~60 GB of h5 + ~60 GB of preprocessed cache on a 252 GB root).

Refuses to delete unless the dataset has at least one preprocessed cache
entry — a stamped-but-uncached dataset would be unloadable.

Usage: python tools/stamp_and_rm_h5.py <dataset-path-or-h5> [...]
"""

import json
import os
import sys


def stamp_and_rm(path: str) -> bool:
    src = path if path.endswith(".h5") else path + ".h5"
    if not os.path.exists(src):
        print(f"[STAMP] {src}: missing, skipping")
        return False
    cdir = src[:-3] + "_cache"
    entries = (
        [d for d in os.listdir(cdir) if os.path.isdir(os.path.join(cdir, d))]
        if os.path.isdir(cdir)
        else []
    )
    if not entries:
        print(f"[STAMP] {src}: NO cache entries under {cdir}, refusing to delete")
        return False
    st = os.stat(src)
    with open(src + ".stat.json", "w") as fh:
        json.dump({"mtime_ns": st.st_mtime_ns, "size": st.st_size}, fh)
    os.remove(src)
    print(
        f"[STAMP] {src}: stamped + removed "
        f"({st.st_size / 1e9:.1f} GB freed, {len(entries)} cache entries kept)"
    )
    return True


if __name__ == "__main__":
    ok = True
    for p in sys.argv[1:]:
        ok = stamp_and_rm(p) and ok
    sys.exit(0 if ok else 1)
