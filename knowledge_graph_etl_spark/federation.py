"""SPARQL 1.1 Federated Query (SERVICE) — local-store federation.

The reference delegates all execution to one Stardog endpoint and never
federates; this engine completes the query surface with ``SERVICE <iri>
{ ... }`` resolved against a registry of named stores (quad-store
DataFrames in the SAME SparkSession — e.g. two Engine instances over
different warehouses). The inner group compiles against the remote
store's dataset with the ordinary group compiler and joins into the
outer solutions on shared variables — which is exactly the SPARQL
federation semantics (§18.6 evaluation of Service is Join with the
remote solution sequence), and on Spark it means the "remote" scan
participates in Catalyst planning (pushdown, broadcast) instead of being
a row-at-a-time HTTP fetch.

**Registry scoping**: each :class:`..engine.Engine` owns a
:class:`ServiceRegistry`; ``Engine.register_service`` affects only that
engine's queries (the registry is activated per compile on the compiling
thread). The module-level :func:`register_service` is the
process-global fallback — visible to EVERY engine, checked after the
engine-scoped registry — kept for driver scripts that build the serving
engine in one place and query elsewhere; prefer the engine-scoped API.

**Resolver contract** (what a network endpoint would implement): a
``target`` may be a zero-arg callable returning a quads DataFrame. An
HTTP SPARQL-protocol resolver slots in as exactly that callable — fetch
the remote data (or accept a pushed-down query), return it as a quads
DataFrame; ``tests/test_federation.py::test_http_shaped_resolver_contract``
proves a resolver speaking the W3C SPARQL-protocol surface (query string
in, W3C results-JSON out, parsed back to quads) drops in without any
engine change. Not shipped as a real client — no network in this
environment, and a row-fetching endpoint is the anti-pattern at 100 TB.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager


class ServiceRegistry:
    """Named SERVICE targets for one scope (an Engine, or the process).

    ``target``: a :class:`..store.GraphStore`, an :class:`..engine.Engine`
    (its store is used), or a zero-arg callable returning a quads
    DataFrame (the escape hatch for custom resolvers, including
    HTTP-protocol clients)."""

    def __init__(self) -> None:
        self._services: dict[str, object] = {}

    def register(self, iri: str, target) -> None:
        self._services[iri] = target

    def unregister(self, iri: str) -> None:
        self._services.pop(iri, None)

    def __contains__(self, iri: str) -> bool:
        return iri in self._services

    def get(self, iri: str):
        return self._services[iri]


#: process-global fallback registry (module-level register_service)
_GLOBAL = ServiceRegistry()

_ACTIVE = threading.local()


@contextmanager
def active_registry(registry: ServiceRegistry | None):
    """Activate an engine-scoped registry for compiles on this thread
    (entered by ``Engine._compile_ctx`` around every parse/compile)."""
    prev = getattr(_ACTIVE, "reg", None)
    _ACTIVE.reg = registry
    try:
        yield
    finally:
        _ACTIVE.reg = prev


def register_service(iri: str, target) -> None:
    """Register ``target`` behind ``SERVICE <iri>`` in the PROCESS-GLOBAL
    registry — resolves in every engine's queries (after the querying
    engine's own registry). Prefer ``Engine.register_service`` for
    engine-scoped registrations."""
    _GLOBAL.register(iri, target)


def unregister_service(iri: str) -> None:
    _GLOBAL.unregister(iri)


def _to_quads(target):
    store = getattr(target, "store", target)  # Engine → its GraphStore
    quads = getattr(store, "quads", None)
    if callable(quads):
        return quads()
    return target()  # custom resolver callable


def resolve_service(iri: str):
    """→ quads DataFrame for the service endpoint: the compiling engine's
    registry first, then the process-global fallback; KeyError if neither
    knows the IRI (the compiler maps that to an error, or to the unit
    solution under ``SERVICE SILENT`` per SPARQL 1.1 Federated Query
    §2.2)."""
    reg = getattr(_ACTIVE, "reg", None)
    if reg is not None and iri in reg:
        return _to_quads(reg.get(iri))
    if iri in _GLOBAL:
        return _to_quads(_GLOBAL.get(iri))
    raise KeyError(
        f"no service registered for <{iri}>; call "
        "Engine.register_service(iri, other_engine) first"
    )
