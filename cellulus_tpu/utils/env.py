"""Shared env-var flag parsing for the perf-knob resolvers.

Every boolean knob resolves the same way: the TOML config field wins when
set; otherwise the env var is consulted, and ``NAME=0`` / ``NAME=false``
disable exactly like ``NAME=1`` enables (a bare truthy-string check would
read ``=0`` as *on*).
"""

from __future__ import annotations

import os
from typing import Optional

_FALSY = {"", "0", "false", "no", "off"}


def env_flag(name: str) -> bool:
    """True when env var ``name`` holds a truthy string.

    Unset, empty, ``0``, ``false``, ``no`` and ``off`` (any case) read as
    False.
    """
    return os.environ.get(name, "").strip().lower() not in _FALSY


def resolve_flag(config_value: Optional[bool], env_name: str) -> bool:
    """Config field wins when set (not None); else fall back to the env var."""
    if config_value is not None:
        return bool(config_value)
    return env_flag(env_name)
