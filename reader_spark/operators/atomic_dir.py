"""Pointer-file dataset publication: crash-safe full-rewrite swaps.

The naive swap — ``rename(path, old); rename(staging, path)`` — has a
window where readers see NO dataset at all, and a crash between the
two renames strands the live data in the ``.old`` dir. The pointer
flip removes both failure modes: data lives in dot-prefixed version
directories under ``path`` and ``path/_CURRENT`` (a one-line text
file naming the live version) is replaced with ``os.replace`` — a
single atomic filesystem operation — so a reader that calls
``resolve(path)`` always lands on a complete dataset, before, during
and after a publish, and a crash at ANY point leaves the previous
version live.

This is the commit shape the table formats use (Delta/Iceberg flip a
manifest) reduced to a filesystem primitive; on an object store the
pointer file becomes the manifest object (S3 PUT is atomic per key).
Dot/underscore-prefixed children are invisible to Spark's file
listing, so a bare legacy directory that gains version dirs is still
readable as-is until its first pointer flip.

Single-writer per dataset (same assumption the rename swap made);
readers need no coordination.
"""

from __future__ import annotations

import os
import shutil
import uuid

CURRENT = "_CURRENT"


def resolve(path: str) -> str:
    """Data root for reading: the live version dir if `path` is
    pointer-published, else `path` itself (bare legacy layout)."""
    ptr = os.path.join(path, CURRENT)
    if os.path.isfile(ptr):
        with open(ptr) as f:
            name = f.read().strip()
        if name:
            return os.path.join(path, name)
    return path


def publish(path: str, write_fn) -> str:
    """Publish a full rewrite of the dataset at `path`.

    `write_fn(version_dir)` must write a COMPLETE dataset into the
    (not yet existing) version dir; the pointer then flips atomically.
    The displaced version is kept for one publish (in-flight readers
    that resolved just before the flip), older versions, stale
    pointer tmp files and — once the layout has flipped twice — any
    bare legacy root files are garbage-collected. Returns the new
    data root."""
    os.makedirs(path, exist_ok=True)
    prev = None
    ptr = os.path.join(path, CURRENT)
    had_pointer = os.path.isfile(ptr)
    if had_pointer:
        with open(ptr) as f:
            prev = f.read().strip() or None

    vname = ".v-" + uuid.uuid4().hex[:12]
    write_fn(os.path.join(path, vname))

    tmp = os.path.join(path, "." + CURRENT + ".tmp-" + uuid.uuid4().hex[:8])
    with open(tmp, "w") as f:
        f.write(vname)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ptr)  # the commit point

    # -- GC (best-effort; failures leave garbage, never break readers)
    keep = {vname, prev, CURRENT}
    for entry in os.listdir(path):
        if entry in keep:
            continue
        full = os.path.join(path, entry)
        if entry.startswith(".v-") or entry.startswith("." + CURRENT):
            # superseded versions / stale pointer tmps
            (shutil.rmtree if os.path.isdir(full) else os.remove)(full)
        elif had_pointer:
            # bare legacy data (files or bucket=* dirs) is >= 2
            # publishes old once a pointer predates this publish —
            # no reader can still hold it
            try:
                (shutil.rmtree if os.path.isdir(full) else os.remove)(full)
            except OSError:
                pass
    return os.path.join(path, vname)
