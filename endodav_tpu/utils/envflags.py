"""Boolean env-flag parsing shared by every ENDODAV_* switch.

The A/B switches in this tree are driven as `FLAG=1 cmd` vs `FLAG=0 cmd`
(or unset); a bare ``bool(os.environ.get(name))`` treats the string "0"
as enabled, so the FLAG=0 leg of an A/B silently re-runs the FLAG=1 mode
and the recorded numbers compare a mode against itself.  Every boolean
ENDODAV_* flag must route through :func:`env_on` instead.

Leaf module on purpose: imported from ``endodav_tpu/__init__`` before
jax config is touched, so it must not import jax or anything heavy.
"""

from __future__ import annotations

import os

__all__ = ["env_on", "env_auto"]

_FALSY = ("", "0", "false", "off", "no")


def env_on(name: str) -> bool:
    """Truthiness for opt-in/opt-out env flags: falsy spellings ("0",
    "false", "off", "no", "") count as disabled."""
    return os.environ.get(name, "").strip().lower() not in _FALSY


def env_auto(name: str, default: bool) -> bool:
    """Config-aware flag default: an EXPLICITLY SET env var wins (with
    env_on's spelling rules, so FLAG=0 still forces off), an unset one
    falls back to ``default``.  Used for per-encoder serving defaults —
    e.g. vitl auto-selects the scan trunk / split compile that its
    compile wall requires (PERFORMANCE.md "vitl") without the user
    having to know the flags."""
    if name in os.environ:
        return env_on(name)
    return default
