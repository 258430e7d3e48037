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

Version dirs carry a monotone sequence number
(``.v-<seq:08d>-<hex>``), which buys TIME TRAVEL for free:
``publish(..., keep=N)`` retains the N most recent displaced
versions and ``resolve(path, version=seq)`` reads a historical
snapshot — the reproducible point-in-time dataset a training run
pins itself to.

Single-writer per dataset (same assumption the rename swap made);
readers need no coordination.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

CURRENT = "_CURRENT"

_V_RE = re.compile(r"^\.v-(\d{8})-[0-9a-f]+$")


def _seq_of(name: str) -> int | None:
    m = _V_RE.match(name)
    return int(m.group(1)) if m else None


def versions(path: str) -> list[int]:
    """Sequence numbers of the version dirs present on disk (oldest
    first). The live one is `current_version(path)`; older entries
    are readable via `resolve(path, version=seq)` until their
    retention (publish keep=N) expires."""
    if not os.path.isdir(path):
        return []
    out = []
    for entry in os.listdir(path):
        s = _seq_of(entry)
        if s is not None and os.path.isdir(os.path.join(path, entry)):
            out.append(s)
    return sorted(out)


def current_version(path: str) -> int | None:
    """Sequence number of the live version; None for a bare layout
    (or a legacy unsequenced version name)."""
    ptr = os.path.join(path, CURRENT)
    if os.path.isfile(ptr):
        with open(ptr) as f:
            return _seq_of(f.read().strip())
    return None


def resolve(path: str, version: int | None = None) -> str:
    """Data root for reading: the live version dir if `path` is
    pointer-published, else `path` itself (bare legacy layout).
    `version` time-travels to a retained historical snapshot
    (raises FileNotFoundError if it has been GC'd)."""
    if version is not None:
        for entry in os.listdir(path):
            if _seq_of(entry) == version and os.path.isdir(
                os.path.join(path, entry)
            ):
                return os.path.join(path, entry)
        raise FileNotFoundError(
            f"version {version} of {path} not present "
            f"(retained: {versions(path)})"
        )
    ptr = os.path.join(path, CURRENT)
    if os.path.isfile(ptr):
        with open(ptr) as f:
            name = f.read().strip()
        if name:
            return os.path.join(path, name)
    return path


def publish(path: str, write_fn, keep: int = 1) -> str:
    """Publish a full rewrite of the dataset at `path`.

    `write_fn(version_dir)` must write a COMPLETE dataset into the
    (not yet existing) version dir; the pointer then flips atomically.
    The `keep` most recent displaced versions are retained (in-flight
    readers that resolved just before a flip, plus time travel via
    `resolve(path, version=...)`); everything older, stale pointer
    tmp files and — once the layout has flipped twice — any bare
    legacy root files are garbage-collected. Returns the new data
    root."""
    os.makedirs(path, exist_ok=True)
    prev = None
    ptr = os.path.join(path, CURRENT)
    had_pointer = os.path.isfile(ptr)
    if had_pointer:
        with open(ptr) as f:
            prev = f.read().strip() or None

    existing = versions(path)
    next_seq = (existing[-1] + 1) if existing else 0
    vname = f".v-{next_seq:08d}-" + uuid.uuid4().hex[:8]
    write_fn(os.path.join(path, vname))

    tmp = os.path.join(path, "." + CURRENT + ".tmp-" + uuid.uuid4().hex[:8])
    with open(tmp, "w") as f:
        f.write(vname)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ptr)  # the commit point

    # -- GC (best-effort; failures leave garbage, never break readers)
    # retained: the new version, the displaced pointer target, and
    # the `keep` highest-sequenced other versions. Unsequenced
    # (crash-orphaned or legacy-named) version dirs are not retained.
    others = sorted(
        (
            e
            for e in os.listdir(path)
            if _seq_of(e) is not None and e != vname
        ),
        key=_seq_of,
        reverse=True,
    )
    retain = {vname, prev, CURRENT, *others[: max(0, keep)]}
    for entry in os.listdir(path):
        if entry in retain:
            continue
        full = os.path.join(path, entry)
        if entry.startswith(".v-") or entry.startswith("." + CURRENT):
            # superseded versions / stale pointer tmps
            (shutil.rmtree if os.path.isdir(full) else os.remove)(full)
        elif had_pointer:
            # bare legacy data (files or bucket=* dirs) is >= 2
            # publishes old once a pointer predates this publish —
            # no reader can still hold it. A directory that is itself
            # a pointer-published dataset (own _CURRENT, or a version
            # dir from a mid-publish crash) is an independent NESTED
            # artifact (e.g. <index>/health), not legacy residue of
            # THIS dataset — never GC it.
            if os.path.isdir(full) and _is_published_dataset(full):
                continue
            try:
                (shutil.rmtree if os.path.isdir(full) else os.remove)(full)
            except OSError:
                pass
    return os.path.join(path, vname)


def _is_published_dataset(path: str) -> bool:
    """True if `path` carries pointer-publication state of its own —
    a `_CURRENT` pointer file or any `.v-*` version dir (the latter
    covers a nested publish that crashed before its first flip)."""
    try:
        entries = os.listdir(path)
    except OSError:
        return False
    return any(e == CURRENT or _seq_of(e) is not None for e in entries)
