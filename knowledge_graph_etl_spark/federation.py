"""SPARQL 1.1 Federated Query (SERVICE) — local-store federation.

The reference delegates all execution to one Stardog endpoint and never
federates; this engine completes the query surface with ``SERVICE <iri>
{ ... }`` resolved against a process-level registry of named stores
(quad-store DataFrames in the SAME SparkSession — e.g. two Engine
instances over different warehouses). The inner group compiles against
the remote store's dataset with the ordinary group compiler and joins
into the outer solutions on shared variables — which is exactly the
SPARQL federation semantics (§18.6 evaluation of Service is Join with
the remote solution sequence), and on Spark it means the "remote" scan
participates in Catalyst planning (pushdown, broadcast) instead of being
a row-at-a-time HTTP fetch.

An HTTP SPARQL-protocol resolver would slot in here as an alternative
``register_service`` target (callable returning a solutions DataFrame);
not shipped — no network in this environment, and a row-fetching
endpoint is the anti-pattern at 100 TB anyway.
"""

from __future__ import annotations

_SERVICES: dict[str, object] = {}


def register_service(iri: str, target) -> None:
    """Register ``target`` as the store behind ``SERVICE <iri>``.

    ``target``: a :class:`..store.GraphStore`, an :class:`..engine.Engine`
    (its store is used), or a zero-arg callable returning a quads
    DataFrame (the escape hatch for custom resolvers)."""
    _SERVICES[iri] = target


def unregister_service(iri: str) -> None:
    _SERVICES.pop(iri, None)


def resolve_service(iri: str):
    """→ quads DataFrame for the service endpoint; KeyError if unknown
    (the compiler maps that to an error, or to the unit solution under
    ``SERVICE SILENT`` per SPARQL 1.1 Federated Query §2.2)."""
    try:
        target = _SERVICES[iri]
    except KeyError:
        raise KeyError(
            f"no service registered for <{iri}>; call "
            "Engine.register_service(iri, other_engine) first"
        ) from None
    store = getattr(target, "store", target)  # Engine → its GraphStore
    quads = getattr(store, "quads", None)
    if callable(quads):
        return quads()
    return target()  # custom resolver callable
