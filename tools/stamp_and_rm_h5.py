#!/usr/bin/env python
"""Stamp a dataset h5's identity and delete the h5 to reclaim disk.

The preprocessed-tensor cache keys on (path, mtime_ns, size) of the source
h5 (evfly_tpu/data/dataloading.py probe); writing those to a sidecar
``<name>.h5.stat.json`` preserves cache hits after the multi-GB h5 is
deleted.  Disk is the scarce resource on this host (the round-4 datasets
alone are ~60 GB of h5 + ~60 GB of preprocessed cache on a 252 GB root).

Refuses to delete unless the dataset has at least one preprocessed cache
entry whose recorded ``cache_key.json`` matches the h5's CURRENT
(mtime_ns, size) — a cache built from an older generation of the h5 would
never hit again once the file is gone (the key embeds the stat), so the
dataset would be irrecoverably lost despite caches existing (advisor r4).
``--force`` accepts any cache entry (for caches written before
cache_key.json existed — verify loadability yourself first).

Usage: python tools/stamp_and_rm_h5.py [--force] <dataset-path-or-h5> [...]
"""

import json
import os
import sys


def _entry_matches(cdir: str, entry: str, st) -> bool:
    p = os.path.join(cdir, entry, "cache_key.json")
    try:
        with open(p) as fh:
            key = json.load(fh)
        return int(key["mtime"]) == st.st_mtime_ns and int(key["size"]) == st.st_size
    except (OSError, ValueError, KeyError):
        return False


def stamp_and_rm(path: str, force: bool = False) -> bool:
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
    matching = [e for e in entries if _entry_matches(cdir, e, st)]
    if not matching and not force:
        print(
            f"[STAMP] {src}: {len(entries)} cache entries but NONE was built "
            f"from the current h5 (mtime_ns={st.st_mtime_ns}, size={st.st_size}) "
            "— stale caches would never hit after deletion; refusing "
            "(--force to override for pre-cache_key entries)"
        )
        return False
    with open(src + ".stat.json", "w") as fh:
        json.dump({"mtime_ns": st.st_mtime_ns, "size": st.st_size}, fh)
    os.remove(src)
    print(
        f"[STAMP] {src}: stamped + removed "
        f"({st.st_size / 1e9:.1f} GB freed, {len(entries)} cache entries kept, "
        f"{len(matching)} verified against the current h5)"
    )
    return True


if __name__ == "__main__":
    args = sys.argv[1:]
    force = "--force" in args
    ok = True
    for p in (a for a in args if a != "--force"):
        ok = stamp_and_rm(p, force=force) and ok
    sys.exit(0 if ok else 1)
