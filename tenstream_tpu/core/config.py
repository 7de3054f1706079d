"""Hierarchical runtime options with per-subsolver prefixes.

Parity: the reference routes every knob through the PETSc options database
(CLI strings / `~/.petscrc` / per-test `tenstream.options` files) with a
homegrown clone when PETSc is absent (`src/options_database.F90:66-305`,
`src/tenstream_options.F90`).  The key concept kept here is the option
*prefix*: each solver instance / subsolve scope (e.g. ``solar_dir_``,
``solar_diff_``, ``thermal_diff_``, built at `src/pprts.F90:2695-2696`)
gets its own namespaced view on a shared option store, with fallback to
the unprefixed option.

Usage::

    opts = Options({"twostr_ratio": 3.0, "solar_dir_ksp_max_it": 50})
    opts.get("twostr_ratio", 2.0)          # -> 3.0
    sub = opts.scoped("solar_dir_")
    sub.get("ksp_max_it", 1000)            # -> 50   (prefixed hit)
    sub.get("ksp_rtol", 1e-5)              # -> 1e-5 (fallback to default)

Options may also be seeded from a CLI-ish string (``-key value -flag``)
mirroring the PETSc syntax, and from the environment variable
``TENSTREAM_TPU_OPTIONS``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterator, Mapping, Optional


def _parse_option_string(s: str) -> Dict[str, Any]:
    """Parse ``-key value -flag -other 1.5`` into a dict (PETSc-like)."""
    out: Dict[str, Any] = {}
    toks = s.split()
    i = 0
    while i < len(toks):
        tok = toks[i]
        if not tok.startswith("-"):
            i += 1
            continue
        key = tok.lstrip("-")
        if i + 1 < len(toks) and not toks[i + 1].startswith("-"):
            out[key] = _coerce(toks[i + 1])
            i += 2
        else:
            out[key] = True
            i += 1
    return out


def _coerce(v: str) -> Any:
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    low = v.lower()
    if low in ("yes", "true", "on"):
        return True
    if low in ("no", "false", "off"):
        return False
    return v


class Options:
    """A flat key-value store with prefix-scoped views."""

    def __init__(
        self,
        values: Optional[Mapping[str, Any]] = None,
        option_string: Optional[str] = None,
        read_env: bool = True,
    ):
        self._store: Dict[str, Any] = {}
        if read_env:
            env = os.environ.get("TENSTREAM_TPU_OPTIONS", "")
            if env:
                self._store.update(_parse_option_string(env))
        if option_string:
            self._store.update(_parse_option_string(option_string))
        if values:
            self._store.update(dict(values))
        self._prefix = ""

    # -- dict-ish interface ------------------------------------------------
    def __contains__(self, key: str) -> bool:
        return (self._prefix + key) in self._store or key in self._store

    def __iter__(self) -> Iterator[str]:
        return iter(self._store)

    def set(self, key: str, value: Any) -> None:
        self._store[self._prefix + key] = value

    def get(self, key: str, default: Any = None) -> Any:
        """Prefixed lookup with fallback to the unprefixed key."""
        pk = self._prefix + key
        if pk in self._store:
            return self._store[pk]
        if key in self._store:
            return self._store[key]
        return default

    def get_bool(self, key: str, default: bool = False) -> bool:
        return bool(self.get(key, default))

    def get_float(self, key: str, default: float) -> float:
        return float(self.get(key, default))

    def get_int(self, key: str, default: int) -> int:
        return int(self.get(key, default))

    def scoped(self, prefix: str) -> "Options":
        """A view whose lookups try ``prefix+key`` first, then ``key``."""
        view = Options.__new__(Options)
        view._store = self._store  # shared store
        view._prefix = self._prefix + prefix
        return view

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._store)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Options(prefix={self._prefix!r}, store={self._store!r})"
