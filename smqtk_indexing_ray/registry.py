"""Runtime-discoverable kernel registry.

Analog of the reference's entry-point plugin surface: impls are
registered by name under ``smqtk_plugins`` and resolved at runtime via
``Pluggable`` (/root/reference/pyproject.toml:72-84,
/root/reference/smqtk_indexing/interfaces/lsh_functor.py:8-11), so a
config string picks the implementation.  Here the same contract is a
plain ``(kind, name) -> factory`` dict populated by a decorator — no
setuptools metadata, no import-time scanning, and identical behavior in
every Ray worker (resolution happens at pipeline-BUILD time on the
driver; the resolved callable ships to workers via the task closure, so
even test-local kernels work).

Kinds used by the dedup pipeline (resolved from ``DedupConfig`` strings):

* ``"signature"`` — callable class for the signing actor pool
  (``__init__(cfg)``, ``__call__(pa.Table) -> pa.Table`` with the
  signature-table schema).
* ``"verify"`` — edge-keep predicate ``f(est_jaccard, hamming, cfg) ->
  bool mask`` applied in the verification score stage.
* ``"select"`` — representative-selection strategy building the final
  ``keep``-flagged output from the labeled skeleton.
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[tuple[str, str], Callable] = {}

KINDS = ("signature", "verify", "select")


def register_kernel(kind: str, name: str) -> Callable:
    """Decorator: register ``fn`` as the ``kind`` kernel named ``name``.

    Re-registering a name overwrites (last wins) — deliberate, so a user
    package can shadow a built-in without touching library code.
    """
    if kind not in KINDS:
        raise ValueError(f"unknown kernel kind {kind!r}; kinds: {KINDS}")

    def deco(fn: Callable) -> Callable:
        _REGISTRY[(kind, name)] = fn
        return fn

    return deco


def _ensure_builtins() -> None:
    """Import the modules that register the built-in kernels (idempotent —
    Python caches modules).  Keeps ``resolve_kernel`` correct regardless of
    which library entry point the user imported first."""
    import smqtk_indexing_ray.stages.signatures  # noqa: F401  signature
    import smqtk_indexing_ray.stages.verify      # noqa: F401  verify
    import smqtk_indexing_ray.pipelines.dedup    # noqa: F401  select


def resolve_kernel(kind: str, name: str) -> Callable:
    """Look up a kernel; raises with the available names on a miss."""
    _ensure_builtins()
    try:
        return _REGISTRY[(kind, name)]
    except KeyError:
        raise KeyError(
            f"no {kind!r} kernel named {name!r}; available: "
            f"{available_kernels(kind)}") from None


def available_kernels(kind: str | None = None):
    """Registered names for ``kind`` (or a kind -> names dict)."""
    _ensure_builtins()
    if kind is not None:
        return sorted(n for k, n in _REGISTRY if k == kind)
    return {k: sorted(n for kk, n in _REGISTRY if kk == k) for k in KINDS}
