"""Pipeline runner: the reference DAG's lifecycle as a plain-Python program.

Replicates load_knowledge_graph.py:677-696 (SURVEY.md §3 entry point 3):

    clear staging → extract JSON → clear target → 16 mapping queries
    → provenance → drop staging → optimize

The 13 ``.sparql`` mapping files are the *user's queries* — the engine
runs their text verbatim through the SPARQL-Update front end; pass the
directory that holds them (e.g. the reference checkout's
``airflow_files/dags/sparql``). The three inline queries (provenance,
add_logo, add_ldap_logo — reference load_knowledge_graph.py:514-611) are
generated here with the same parameter substitution the reference does
with Jinja (constants per run, SURVEY.md §2 op 37).

Upstream HTTP sync triggering/polling (reference
load_knowledge_graph.py:206-267) is an orchestration concern, not a Spark
operator — it is provided here as the driver-side helper
:func:`trigger_and_wait` (sensor → POST full_sync → sensor), to be called
before :func:`run_pipeline`.
"""

from __future__ import annotations

import json as _json
import os
import time
import urllib.request
from urllib.parse import quote_plus

from ..engine import GRAPH_NS, SOURCE_NS, Engine

STAGING_GRAPHS = [
    "ldap_organizations",
    "tl_users",
    "tl_companies",
    "tl_custom_fields",
    "mediahaven_tenants",
]

# the 13 file queries (reference DAG tasks m1-m13,
# load_knowledge_graph.py:386-533)
MAPPING_FILES = [
    "ldap_mapping_org.sparql",
    "ldap_mapping_unit.sparql",
    "ldap_mapping_school.sparql",
    "ldap_mapping_eduorg.sparql",
    "ldap_mapping_cp.sparql",
    "ldap_mapping_sp.sparql",
    "ldap_mapping_sc.sparql",
    "tl_users_mapping.sparql",
    "tl_companies_mapping_org.sparql",
    "tl_companies_mapping_contactpoint.sparql",
    "tl_companies_mapping_cp.sparql",
    "tl_companies_mapping_classification.sparql",
    "tl_companies_mapping_overlay.sparql",
    "map_mam_tenants.sparql",
]


def provenance_update(run_id: str, ts: str, sources: list[str], result: str, graph: str) -> str:
    """The add_provenance INSERT DATA (reference load_knowledge_graph.py:514-545):
    PROV-O activity record with run id, sources, and start time."""
    nt_sources = ", ".join(f"<{u}>" for u in sources)
    rid = quote_plus(run_id)
    return f"""
    PREFIX prov: <http://www.w3.org/ns/prov#>
    PREFIX xsd:  <http://www.w3.org/2001/XMLSchema#>
    PREFIX : <https://data.hetarchief.be/id/etl/>
    PREFIX etl: <https://data.hetarchief.be/ns/etl/>

    INSERT DATA
    {{
        GRAPH <{graph}> {{
            <{result}> prov:wasDerivedFrom {nt_sources};
                       prov:wasGeneratedBy :{rid}.

            :{rid} a prov:Activity, etl:AirflowRun;
                prov:generated <{result}>;
                prov:used etl:ApacheAirflow;
                prov:startedAtTime "{ts}"^^xsd:dateTime.
        }}
    }}
    """


def logo_update(using_clause: str, where_pattern: str, asset_prefix: str) -> str:
    """Shared shape of add_logo / add_ldap_logo
    (reference load_knowledge_graph.py:551-611)."""
    return f"""
    PREFIX org:    <http://www.w3.org/ns/org#>
    PREFIX schema: <https://schema.org/>
    PREFIX graphs: <{GRAPH_NS}>
    PREFIX source: <{SOURCE_NS}>

    WITH graphs:organizations
    INSERT {{
        ?org a org:Organization;
             schema:logo ?logo.
    }}
    {using_clause}
    WHERE {{
        {where_pattern}
        BIND (URI(CONCAT('https://data.hetarchief.be/id/organization/', ?orid)) AS ?org)
        BIND (URI(CONCAT('{asset_prefix}', ?orid)) AS ?logo)
    }}
    """


def asset_prefix(env: str) -> str:
    # reference load_knowledge_graph.py:580-582
    if env == "prd":
        return "https://assets.viaa.be/images/"
    return f"https://assets-{env}.viaa.be/images/"


def add_logo_update(env: str) -> str:
    return logo_update(
        "USING graphs:tl_companies\n    USING graphs:tl_custom_fields",
        """
        ?cf_orid source:id ?cf_orid_id; source:label "5.1 - OR-ID" .
        ?o source:custom_fields [
            source:value ?orid;
            source:definition [ source:id ?cf_orid_id ]
        ] .
        """,
        asset_prefix(env),
    )


def add_ldap_logo_update(env: str) -> str:
    return logo_update(
        "USING graphs:ldap_organizations",
        """
        ?o source:objectClass "organization";
           source:o ?orid.
        """,
        asset_prefix(env),
    )


def _get_json(url: str, timeout: float) -> dict:
    req = urllib.request.Request(url, headers={"Accept": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return _json.loads(resp.read().decode("utf-8"))


def wait_until_idle(
    url: str,
    poke_interval: float = 5.0,
    timeout: float = 300.0,
    _sleep=time.sleep,
) -> dict:
    """Poll ``url`` (GET) until the JSON body reports ``job_running`` false.

    The HttpSensor half of the reference's upstream-sync tasks
    (load_knowledge_graph.py:206-214 h0 / :232-240 h2 — ``response_check =
    not response.json()["job_running"]``, ``poke_interval=5``). Returns the
    final (idle) JSON body; raises TimeoutError past ``timeout`` seconds.
    """
    deadline = time.monotonic() + timeout
    while True:
        # per-request timeout is independent of the poll cadence: a
        # healthy-but-slow service (answering in, say, 8 s) must not
        # crash a 5 s-cadence sensor that has minutes of budget left
        body = _get_json(url, timeout=min(30.0, max(timeout, 1.0)))
        if not body.get("job_running"):
            return body
        if time.monotonic() >= deadline:
            raise TimeoutError(f"sync job at {url} still running after {timeout}s")
        _sleep(poke_interval)


def trigger_sync(url: str, full_sync: bool = True, timeout: float = 30.0) -> dict:
    """POST ``{"full_sync": <bool>}`` to start an upstream *2db sync job.

    The SimpleHttpOperator half (load_knowledge_graph.py:216-230 h1):
    JSON POST, and the reference's ``sync_response_check`` — HTTP 200 with
    the body echoing ``full_sync`` — enforced here by raising ValueError
    on a mismatched echo (urllib already raises on non-2xx status).
    """
    req = urllib.request.Request(
        url,
        data=_json.dumps({"full_sync": full_sync}).encode("utf-8"),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = _json.loads(resp.read().decode("utf-8"))
    if body.get("full_sync") != bool(full_sync):
        raise ValueError(f"sync trigger at {url} did not echo full_sync={full_sync}: {body}")
    return body


def trigger_and_wait(
    url: str,
    full_sync: bool = True,
    poke_interval: float = 5.0,
    timeout: float = 300.0,
    _sleep=time.sleep,
) -> dict:
    """Idle-check → trigger → completion-poll for one upstream sync service.

    The h0→h1→h2 / h3→h4→h5 chains of the reference DAG
    (load_knowledge_graph.py:206-267): wait for the service to be idle,
    POST the full_sync trigger, then poll until the job finishes. Returns
    the final idle JSON body. Pure driver-side orchestration — no Spark
    involvement, by design (SURVEY.md §2 op 9).
    """
    wait_until_idle(url, poke_interval=poke_interval, timeout=timeout, _sleep=_sleep)
    trigger_sync(url, full_sync=full_sync, timeout=max(poke_interval, 30.0))
    return wait_until_idle(url, poke_interval=poke_interval, timeout=timeout, _sleep=_sleep)


def run_pipeline(
    engine: Engine,
    documents: dict[str, list[tuple[str, str]]],
    sparql_dir: str,
    run_id: str = "manual__local",
    ts: str = "2024-01-01T00:00:00+00:00",
    env: str = "qas",
    optimize: bool = True,
) -> None:
    """Full-refresh run (CLEAR → load → map → provenance → DROP → optimize).

    ``documents``: source name → [(doc_id, json_text)] (see
    :mod:`.fixtures`) OR an already-distributed DataFrame of
    ``(doc_id, json)`` (see :func:`.fixtures.volume_documents` — at
    volume the corpus must never pass through the driver).
    ``sparql_dir``: directory containing the 13 mapping files
    (:data:`MAPPING_FILES`).
    """
    from pyspark.sql import DataFrame

    spark = engine.spark

    # c1-c4 (+ the target clear c): full-refresh staging
    # (reference load_knowledge_graph.py:337-383)
    for g in STAGING_GRAPHS:
        engine.update(f"CLEAR SILENT GRAPH <{GRAPH_NS}{g}>")

    # e1-e5: extract & insert (reference load_knowledge_graph.py:269-334)
    for source, docs in documents.items():
        df = (
            docs
            if isinstance(docs, DataFrame)
            else spark.createDataFrame(docs, "doc_id string, json string")
        )
        engine.load_json(df, f"{GRAPH_NS}{source}", namespace=SOURCE_NS)

    engine.update(f"CLEAR SILENT GRAPH <{GRAPH_NS}organizations>")

    # m1-m13 + mt: the mapping workload (reference load_knowledge_graph.py:386-533)
    for fname in MAPPING_FILES:
        engine.update(os.path.join(sparql_dir, fname))

    # mp: provenance (reference load_knowledge_graph.py:514-545)
    engine.update(
        provenance_update(
            run_id,
            ts,
            sources=[
                f"{GRAPH_NS}tl_companies",
                f"{GRAPH_NS}tl_users",
                f"{GRAPH_NS}ldap_organizations",
            ],
            result=f"{GRAPH_NS}organizations",
            graph=f"{GRAPH_NS}provenance",
        )
    )

    # ml, tl_ml: logos (reference load_knowledge_graph.py:547-611)
    engine.update(add_logo_update(env))
    engine.update(add_ldap_logo_update(env))

    # d1-d5: drop staging (reference load_knowledge_graph.py:619-667)
    for g in STAGING_GRAPHS:
        engine.update(f"DROP SILENT GRAPH <{GRAPH_NS}{g}>")

    # opt (reference load_knowledge_graph.py:669-675)
    if optimize:
        engine.store.optimize()
