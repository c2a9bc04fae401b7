"""Cache-lifetime ownership for operators that persist intermediates.

Several operators persist a shared subplan (it feeds both sides of a
self-join, or a verify tier plus a size table) and return a LAZY
result, so the operator body has no post-action point at which to
unpersist — through round 5 the release was the CALLER's burden
(``spark.catalog.clearCache()`` between composite queries), which
leaks executor storage in any long-lived session that forgets.

:func:`own_cache` closes that contract: the persisted intermediates
are tied to the lifetime of the RETURNED frame with a weakref
finalizer.  When the consumer drops the result (rebinds the variable,
leaves scope, finishes the request), CPython refcounting fires the
finalizer and the cache blocks are released — no caller discipline,
no ``clearCache``.  While the result object is alive, re-running
actions on it still hits the cache, which is the correct lifetime: a
held handle means "I may execute this again".

Composites transfer ownership instead of leaking it: an operator that
builds on another operator's (cache-owning) result passes that frame
via ``absorb`` so the release point moves OUT to the composite's own
result.  Operators that consume an owning frame EAGERLY (collect a
report, run an iterative loop over checkpoints) need nothing — the
owning frame dies at function exit, which is exactly when its cache
stops being useful.

Release uses non-blocking ``unpersist`` (the CacheManager entry is
dropped synchronously; block deletion proceeds in the background) and
swallows errors from a stopped session / half-torn-down JVM at
interpreter exit.
"""

from __future__ import annotations

import weakref
from typing import Iterable

from pyspark.sql import DataFrame

#: Attribute stashed on an owning DataFrame: (list-of-cached-frames,
#: finalizer).  Kept public-ish for tests; not part of the operator API.
_OWNED_ATTR = "_spark_graft_owned_caches"


def _release(frames: list[DataFrame]) -> None:
    for f in frames:
        try:
            f.unpersist(blocking=False)
        except Exception:
            # Session stopped or JVM gone (interpreter shutdown):
            # nothing left to release.
            pass


def own_cache(
    owner: DataFrame,
    *cached: DataFrame,
    absorb: Iterable[DataFrame] = (),
) -> DataFrame:
    """Tie persisted ``cached`` frames to ``owner``'s lifetime, and
    transfer any caches already owned by the ``absorb`` frames.

    Returns ``owner`` (same object) so call sites read
    ``return own_cache(result, sh)``.
    """
    frames: list[DataFrame] = list(cached)
    for src in absorb:
        owned = getattr(src, _OWNED_ATTR, None)
        if owned is None:
            continue
        src_frames, fin = owned
        fin.detach()
        try:
            delattr(src, _OWNED_ATTR)
        except AttributeError:
            pass
        for f in src_frames:
            if f not in frames:
                frames.append(f)
    if not frames:
        return owner
    prior = getattr(owner, _OWNED_ATTR, None)
    if prior is not None:
        prior_frames, prior_fin = prior
        prior_fin.detach()
        frames = [f for f in prior_frames if f not in frames] + frames
    fin = weakref.finalize(owner, _release, frames)
    setattr(owner, _OWNED_ATTR, (frames, fin))
    return owner


def release_caches(df: DataFrame) -> None:
    """Release ``df``'s owned caches NOW (idempotent).  For callers
    that want deterministic release without dropping the handle."""
    owned = getattr(df, _OWNED_ATTR, None)
    if owned is None:
        return
    frames, fin = owned
    fin.detach()
    try:
        delattr(df, _OWNED_ATTR)
    except AttributeError:
        pass
    _release(frames)
