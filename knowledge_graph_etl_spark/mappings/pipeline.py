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


# ---------------------------------------------------------------------------
# Incremental pipeline maintenance (beyond-reference; the reference is
# full-refresh by design — load_knowledge_graph.py:677-696)
# ---------------------------------------------------------------------------

#: the sources whose documents drive mapping derivations at corpus scale;
#: tl_custom_fields is a bounded lookup (change → full-refresh fallback),
#: mediahaven_tenants a single whole-file doc (always processed fully —
#: its unchanged derivation deletes and reinserts identically, a no-op
#: under set semantics)
DELTA_SOURCES = ["ldap_organizations", "tl_users", "tl_companies"]


def _docs_df(spark, docs):
    from pyspark.sql import DataFrame

    if isinstance(docs, DataFrame):
        return docs
    return spark.createDataFrame(docs, "doc_id string, json string")


def _orid_def_id(spark, cf_docs) -> str | None:
    """The tl custom-field definition id labelled '5.1 - OR-ID' (bounded
    lookup — one collect of a ≤dozens-row table)."""
    from pyspark.sql import functions as F

    rows = (
        _docs_df(spark, cf_docs)
        .select(F.from_json("json", "id string, label string").alias("d"))
        .where(F.col("d.label") == "5.1 - OR-ID")
        .select("d.id")
        .collect()
    )
    return rows[0]["id"] if rows else None


def _orids(spark, source: str, docs, cf_def_id: str | None):
    """(doc_id, orid) for every document of a driving source that carries
    an OR-ID — the shared key through which different sources derive
    quads about the SAME organization subject. Pure JSON projection, one
    scan, no shuffle."""
    from pyspark.sql import functions as F

    df = _docs_df(spark, docs)
    if source == "ldap_organizations":
        return df.select(
            "doc_id",
            F.get_json_object("json", "$.attributes.o").alias("orid"),
        ).where(F.col("orid").isNotNull())
    if source == "tl_companies":
        if cf_def_id is None:
            return df.select("doc_id", F.lit(None).cast("string").alias("orid")).where(F.lit(False))
        cf_schema = (
            "custom_fields array<struct<value:string,"
            "definition:struct<id:string>>>"
        )
        cf = F.from_json("json", cf_schema)["custom_fields"]
        # try_element_at: a company without an OR-ID custom field has an
        # empty filtered array (ANSI element_at would throw) — it simply
        # carries no org key and needs no closure
        orid = F.try_element_at(
            F.filter(cf, lambda f: f["definition"]["id"] == F.lit(cf_def_id)),
            F.lit(1),
        )["value"]
        return df.select("doc_id", orid.alias("orid")).where(
            F.col("orid").isNotNull()
        )
    # tl_users: no organization key — user-subject quads are derived from
    # the user document alone (id-keyed), so the delta needs no closure
    return df.select(
        "doc_id", F.lit(None).cast("string").alias("orid")
    ).where(F.lit(False))


def incremental_update_queries(env: str) -> list[str]:
    """Every update whose derivation must be maintained incrementally:
    the 14 mapping files' names plus the two logo updates (which read
    STAGING, not the target graph — pipeline.py logo_update) as inline
    text. Provenance is additive per-run and excluded."""
    return MAPPING_FILES + [add_logo_update(env), add_ldap_logo_update(env)]


def run_pipeline_incremental(
    engine: Engine,
    old_documents: dict,
    new_documents: dict,
    sparql_dir: str,
    run_id: str = "manual__incremental",
    ts: str = "2024-01-01T00:00:00+00:00",
    env: str = "qas",
) -> dict:
    """Incremental maintenance of the organizations graph: given the
    previous and the current staging snapshots, recompute ONLY the
    derived quads of changed documents instead of the reference's
    CLEAR → full remap (the full-refresh anti-pattern at 100 TB).

    Algorithm (delete-and-rederive with delta CLOSURE over the shared
    organization key):

    1. diff each driving source's documents (md5 of the json);
    2. close the delta over OR-IDs — different sources derive quads
       about the SAME org subject (ldap org + tl company + logos), so
       when any document of an organization changes, every document of
       that organization (old and new side) joins the re-map set; this
       is what makes delete-then-rederive exact when e.g. a company doc
       is removed but its ldap twin still derives the shared
       ``a org:Organization`` triple;
    3. build two throwaway in-memory staging stores — old-closure docs
       and new-closure docs, plus the full (bounded) lookup sources —
       and compile every mapping + logo update against each with
       ``engine.plan`` (the INSERT..WHERE output quads WITHOUT the
       side effect);
    4. set-delete the old derivations, set-insert the new ones, record
       provenance for this run.

    Full-refresh equivalence (the oracle): after this call the
    organizations graph equals what ``run_pipeline`` over the new
    snapshot would produce — pytest-pinned at fixture scale (every
    delta class incl. the cross-source removal case) and at volume.
    Falls back to a documented error if the custom-field definitions
    changed (they parameterize every company mapping — a full refresh
    is the correct response).

    Contract: within one source, document ids identify documents and
    OR-IDs / user ids are unique per document — the reference pipeline
    assumes the same (its mappings would silently merge subjects
    otherwise).

    Scale shape: the diffs are one full-outer join per source on the
    doc id; orid extraction is a JSON projection (no shuffle); the
    mapping recompute runs over CLOSURE-sized staging (∝ delta, not
    corpus); the only corpus-sized terms are the delete/insert
    rewrites of the one target graph — partition-granular copy-on-write,
    the same cost every UPDATE pays. Returns counters for observability.
    """
    from pyspark.sql import functions as F

    from ..extensions.changelog import snapshot_diff

    spark = engine.spark
    old_cf = old_documents.get("tl_custom_fields", [])
    new_cf = new_documents.get("tl_custom_fields", [])
    cf_diff = snapshot_diff(
        _docs_df(spark, old_cf), _docs_df(spark, new_cf), "doc_id", "json"
    )
    if cf_diff.where(F.col("status") != "unchanged").limit(1).count() > 0:
        raise ValueError(
            "custom-field definitions changed between snapshots — they "
            "parameterize every company mapping; run the full refresh "
            "(run_pipeline) instead"
        )
    cf_def_id = _orid_def_id(spark, new_cf)

    # 1. per-source diffs
    diffs = {}
    for source in DELTA_SOURCES:
        o = _docs_df(spark, old_documents.get(source, []))
        n = _docs_df(spark, new_documents.get(source, []))
        diffs[source] = (o, n, snapshot_diff(o, n, "doc_id", "json"))

    # 2. delta closure over orids
    affected = None
    for source in ("ldap_organizations", "tl_companies"):
        o, n, d = diffs[source]
        delta_ids = d.where(F.col("status") != "unchanged").select("doc_id")
        for side in (o, n):
            orids = (
                _orids(spark, source, side, cf_def_id)
                .join(F.broadcast(delta_ids), "doc_id", "left_semi")
                .select("orid")
            )
            affected = orids if affected is None else affected.unionByName(orids)
    affected = affected.distinct().localCheckpoint(eager=True)

    def closure_docs(source, docs, d, statuses):
        base = d.where(F.col("status").isin(*statuses)).select("doc_id")
        if source in ("ldap_organizations", "tl_companies"):
            by_orid = (
                _orids(spark, source, docs, cf_def_id)
                .join(F.broadcast(affected), "orid", "left_semi")
                .select("doc_id")
            )
            base = base.unionByName(by_orid).distinct()
        return _docs_df(spark, docs).join(F.broadcast(base), "doc_id", "left_semi")

    # 3. two throwaway staging stores: old-closure and new-closure
    counters = {}
    stale = fresh = None
    for label, side_docs, statuses in (
        ("stale", 0, ["changed", "removed"]),
        ("fresh", 1, ["changed", "added"]),
    ):
        scratch = Engine(spark)
        for source in DELTA_SOURCES:
            o, n, d = diffs[source]
            docs = (o, n)[side_docs]
            cdocs = closure_docs(source, docs, d, statuses)
            counters[f"{label}_{source}_docs"] = cdocs.count()
            scratch.load_json(cdocs, f"{GRAPH_NS}{source}", namespace=SOURCE_NS)
        # bounded full sources (see DELTA_SOURCES note)
        scratch.load_json(
            _docs_df(spark, (old_documents, new_documents)[side_docs].get(
                "mediahaven_tenants", []
            )),
            f"{GRAPH_NS}mediahaven_tenants",
            namespace=SOURCE_NS,
        )
        scratch.load_json(
            _docs_df(spark, (old_cf, new_cf)[side_docs]),
            f"{GRAPH_NS}tl_custom_fields",
            namespace=SOURCE_NS,
        )
        quads = None
        for q in incremental_update_queries(env):
            path = os.path.join(sparql_dir, q) if q.endswith(".sparql") else q
            # flatten EACH mapping's plan before the union: 16 compiled
            # SPARQL-update trees over in-memory quad unions blow up
            # analysis (DeduplicateRelations walks the product of the
            # subtree relations — measured driver OOM); each checkpoint
            # is a delta-sized job, and the union of flat scans is cheap
            df = scratch.plan(path, materialize=True).localCheckpoint(
                eager=True
            )
            quads = df if quads is None else quads.unionByName(df)
        quads = quads.distinct().localCheckpoint(eager=True)
        counters[f"{label}_quads"] = quads.count()
        if label == "stale":
            stale = quads
        else:
            fresh = quads

    # 4. apply to the maintained store + provenance for this run
    engine.store.delete(stale, target_graphs=[f"{GRAPH_NS}organizations"])
    engine.store.insert(fresh, target_graphs=[f"{GRAPH_NS}organizations"])
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
    return counters
