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
load_knowledge_graph.py:206-267) is an orchestration concern outside the
engine; callers do it before invoking the pipeline.
"""

from __future__ import annotations

import os
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
    :mod:`.fixtures`). ``sparql_dir``: directory containing the 13 mapping
    files (:data:`MAPPING_FILES`).
    """
    spark = engine.spark

    # c1-c4 (+ the target clear c): full-refresh staging
    # (reference load_knowledge_graph.py:337-383)
    for g in STAGING_GRAPHS:
        engine.update(f"CLEAR SILENT GRAPH <{GRAPH_NS}{g}>")

    # e1-e5: extract & insert (reference load_knowledge_graph.py:269-334)
    for source, docs in documents.items():
        df = spark.createDataFrame(docs, "doc_id string, json string")
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
