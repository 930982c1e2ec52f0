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

Third-party discovery: packages that cannot rely on being imported
first declare setuptools entry points under the
``smqtk_indexing_ray.kernels`` group (the direct analog of the
reference's ``smqtk_plugins`` group, /root/reference/pyproject.toml:
72-84).  Each entry point is loaded once on first resolution; a
module-valued entry registers through its own ``@register_kernel``
decorators at import, and a callable-valued entry named ``kind:name``
is registered directly (never overriding an existing name — shadowing
a built-in stays an explicit, import-time decorator act).
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[tuple[str, str], Callable] = {}

KINDS = ("signature", "verify", "select")

#: Setuptools entry-point group scanned for third-party kernels.
ENTRY_POINT_GROUP = "smqtk_indexing_ray.kernels"

_EP_SCANNED = False


def _iter_entry_points():
    """Installed entry points of :data:`ENTRY_POINT_GROUP` (seam for
    tests: monkeypatch this to inject synthetic entries)."""
    from importlib.metadata import entry_points
    try:
        return list(entry_points(group=ENTRY_POINT_GROUP))
    except TypeError:                     # pragma: no cover (py<3.10 API)
        return list(entry_points().get(ENTRY_POINT_GROUP, []))


def _scan_entry_points() -> None:
    """Load third-party kernel entry points once (idempotent).

    A failing entry point warns and is skipped — one broken plugin
    must not take down resolution of the built-ins."""
    global _EP_SCANNED
    if _EP_SCANNED:
        return
    _EP_SCANNED = True
    try:
        eps = _iter_entry_points()
    except Exception:                     # pragma: no cover
        return
    for ep in eps:
        try:
            obj = ep.load()
        except Exception as exc:
            import warnings
            warnings.warn(
                f"smqtk_indexing_ray kernel entry point {ep.name!r} "
                f"failed to load: {exc!r}")
            continue
        if callable(obj) and ":" in ep.name:
            kind, _, name = ep.name.partition(":")
            if kind in KINDS and (kind, name) not in _REGISTRY:
                _REGISTRY[(kind, name)] = obj


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
    _scan_entry_points()


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
