"""Environment/config utilities (T8) — the reference's env plumbing.

Reference: ``lambda/subirDB.py:18-56`` — alias-coalesce across env var
names (``first()``), unresolved ``${VAR}`` placeholder detection, strip,
and port int cast with validation.  Config glue, not plan operators —
kept at the edge exactly as the reference does.
"""

from __future__ import annotations

import os
import re

_PLACEHOLDER = re.compile(r"^\$\{[^}]*\}$")


def first_env(*names: str, env: dict[str, str] | None = None) -> str | None:
    """First non-empty, non-placeholder value among env var aliases
    (reference ``_first`` helper)."""
    src = os.environ if env is None else env
    for name in names:
        v = src.get(name)
        if v is None:
            continue
        v = v.strip()
        if not v or _PLACEHOLDER.match(v):
            continue
        return v
    return None


def require_env(*names: str, env: dict[str, str] | None = None) -> str:
    v = first_env(*names, env=env)
    if v is None:
        raise ValueError(
            f"missing required configuration: none of {names} is set "
            "(empty and ${placeholder} values are rejected)"
        )
    return v


def env_port(*names: str, default: int = 3306, env: dict[str, str] | None = None) -> int:
    """Port with int validation (reference casts DB_PORT, rejecting
    non-numeric values)."""
    v = first_env(*names, env=env)
    if v is None:
        return default
    try:
        port = int(v)
    except ValueError as e:
        raise ValueError(f"invalid port {v!r} for {names}") from e
    if not (0 < port < 65536):
        raise ValueError(f"port {port} out of range for {names}")
    return port
