"""Deterministic JSON fixtures for the mapping-query workload.

Shapes inferred from exactly the predicates/structures the reference's 16
mapping queries match (FIXTURES.md §A2-A6, with file:line cites there).
Edge rows deliberately included: org with every OPTIONAL absent, org
without units, company without an OR-ID custom field (must map to
nothing), CP status "nee", classification value without the ``' - '``
separator (STRAFTER → ``''``), email type without a matching telephone
type, user without function/telephones.
"""

from __future__ import annotations

import json

# custom-field definition ids (tl_custom_fields lookup side,
# reference sparql/tl_companies_mapping_org.sparql:39)
CF = {
    "5.1 - OR-ID": "cf-orid-uuid",
    "2.2 - CP status": "cf-status-uuid",
    "1.1 - Type organisatie": "cf-class-uuid",
    "4.2 - Watermerk": "cf-overlay-uuid",
    "4.1 - Bezoekertool": "cf-bzt-uuid",
    "CP - Omschrijving (200 tek.)": "cf-omsch-uuid",
    "E-mail Ontsluiting": "cf-eo-uuid",
    "Telefoon Ontsluiting": "cf-to-uuid",
    "E-mail Facturatie": "cf-ef-uuid",
    "CP - Link aanvraagformulier": "cf-form-uuid",
    "Unused decoy label": "cf-decoy-uuid",
}


def _ldap_org(orid, name, category, sector=None, address=None, extra_classes=(), units=()):
    attrs = {
        "objectClass": ["top", "organization", *extra_classes],
        "o": orid,
        "description": name,
    }
    if category is not None:
        attrs["businessCategory"] = category
    if sector is not None:
        attrs["x-be-viaa-sector"] = sector
    if address:
        attrs.update(address)
    doc = {"attributes": attrs}
    if units:
        doc["units"] = [{"attributes": u} for u in units]
    return doc


def ldap_organizations() -> list[dict]:
    full_addr = {"street": "Teststraat 1", "postalCode": "9000", "l": "Gent", "st": "Oost-Vlaanderen"}
    return [
        _ldap_org(
            "OR-abc123x", "Archief Gent", "Content Partner", sector="Cultuur",
            address=full_addr,
            units=[
                {
                    "objectClass": ["organizationalUnit"],
                    "ou": "OR-abc123x-unit1",
                    "description": "Unit Een",
                    "street": "Unitstraat 5",
                    "postalCode": "9050",
                    "l": "Gentbrugge",
                    "st": "Oost-Vlaanderen",
                    "x-be-viaa-sector": "Cultuur",
                },
                {
                    "objectClass": ["organizationalUnit"],
                    "ou": "OR-abc123x-unit2",
                    "description": "Unit Twee (kaal)",
                },
            ],
        ),
        _ldap_org("OR-school1", "School Eén", "School"),
        _ldap_org("OR-sp001aa", "Dienstverlener BV", "Service Provider", sector="Media"),
        _ldap_org("OR-cust01a", "Klant NV", "Customer"),
        _ldap_org(
            "OR-edu001a", "Edu-org", "School",
            extra_classes=["x-be-viaa-educationalOrganization"],
        ),
        # every OPTIONAL absent, no businessCategory
        _ldap_org("OR-kaal001", "Kale Organisatie", None),
    ]


def tl_users() -> list[dict]:
    return [
        {
            "id": "user-uuid-1",
            "first_name": "An",
            "last_name": "Peeters",
            "email": "an@meemoo.be",
            "function": "Account manager archieven",  # spaces → ENCODE_FOR_URI
            "telephones": [{"type": "mobile", "number": "+32470000001"}],
        },
        {
            # no function, no telephones (OPTIONALs unbound)
            "id": "user-uuid-2",
            "first_name": "Bert",
            "last_name": "Claes",
            "email": "bert@meemoo.be",
        },
    ]


def _cf(value, def_id):
    return {"value": value, "definition": {"id": def_id}}


def tl_companies() -> list[dict]:
    return [
        {
            "name": "Archief Gent VZW",
            "website": "www.archiefgent.be",  # STRSTARTS 'www' branch
            "addresses": [
                {
                    "type": "primary",
                    "address": {
                        "line_1": "Teststraat 1",
                        "postal_code": "9000",
                        "city": "Gent",
                        "country": "BE",
                    },
                }
            ],
            "emails": [
                {"type": "primary", "email": "info@archiefgent.be"},
                {"type": "support", "email": "help@archiefgent.be"},
            ],
            "telephones": [{"type": "primary", "number": "+3291234567"}],
            "responsible_user": {"id": "user-uuid-1"},
            "custom_fields": [
                _cf("OR-abc123x", CF["5.1 - OR-ID"]),
                _cf("ja", CF["2.2 - CP status"]),
                _cf("1 - Cultuur organisatie", CF["1.1 - Type organisatie"]),
                _cf(True, CF["4.2 - Watermerk"]),
                # overlay query requires BOTH 4.2 and 4.1 chains
                # (reference sparql/tl_companies_mapping_overlay.sparql:24-46)
                _cf(False, CF["4.1 - Bezoekertool"]),
                _cf("Beschrijving van de contentpartner", CF["CP - Omschrijving (200 tek.)"]),
                _cf("ontsluiting@archiefgent.be", CF["E-mail Ontsluiting"]),
                _cf("+329000000", CF["Telefoon Ontsluiting"]),
                _cf("facturatie@archiefgent.be", CF["E-mail Facturatie"]),
                _cf("https://forms.archiefgent.be/aanvraag", CF["CP - Link aanvraagformulier"]),
            ],
        },
        {
            "name": "Dienstverlener BV",
            "website": "https://dienstverlener.be",  # non-www branch
            "emails": [{"type": "primary", "email": "info@dienstverlener.be"}],
            # no telephones: correlated nested OPTIONAL unbound
            "custom_fields": [
                _cf("OR-sp001aa", CF["5.1 - OR-ID"]),
                _cf("nee", CF["2.2 - CP status"]),  # semi-join must exclude
                _cf("Zonder separator", CF["1.1 - Type organisatie"]),  # STRAFTER → ''
                _cf(False, CF["4.1 - Bezoekertool"]),
            ],
        },
        {
            # no OR-ID custom field: must produce NOTHING in any tl mapping
            "name": "Geen Orid NV",
            "custom_fields": [_cf("ja", CF["2.2 - CP status"])],
        },
    ]


def tl_custom_fields() -> list[dict]:
    return [{"id": def_id, "label": label} for label, def_id in CF.items()]


def mediahaven_tenants() -> list[dict]:
    # file source (reference load_knowledge_graph.py:325-334); the whole
    # file is ONE document (an array of tenants)
    return [
        {"Name": "Tenant Archief Gent", "ExternalId": "OR-abc123x"},
        {"Name": "Tenant School", "ExternalId": "OR-school1"},
    ]


def fixture_documents() -> dict[str, list[tuple[str, str]]]:
    """source name → [(doc_id, json_text)] for every staging source."""
    out: dict[str, list[tuple[str, str]]] = {}
    for name, docs in [
        ("ldap_organizations", ldap_organizations()),
        ("tl_users", tl_users()),
        ("tl_companies", tl_companies()),
        ("tl_custom_fields", tl_custom_fields()),
    ]:
        out[name] = [(f"{name}-{i}", json.dumps(d)) for i, d in enumerate(docs)]
    # mam tenants: a single whole-file JSON document
    out["mediahaven_tenants"] = [
        ("mediahaven_tenants-0", json.dumps(mediahaven_tenants()))
    ]
    return out


# ---------------------------------------------------------------------------
# Volume corpus: the same document shapes at parametric scale
# ---------------------------------------------------------------------------


def _volume_company(i: int, n_users: int) -> dict:
    """One tl_companies doc shaped exactly like the fixtures (same field
    paths the 13 mappings match), parameterized: ~10% CP-status 'nee'
    (semi-join excluded), alternating www/https website branches,
    alternating watermark booleans."""
    orid = f"OR-vol{i:06d}"
    status = "nee" if i % 10 == 9 else "ja"
    website = (
        f"www.volumeorg{i}.be" if i % 2 == 0 else f"https://volumeorg{i}.be"
    )
    return {
        "name": f"Volume Organisatie {i}",
        "website": website,
        "addresses": [
            {
                "type": "primary",
                "address": {
                    "line_1": f"Volumestraat {i % 97 + 1}",
                    "postal_code": f"{9000 + i % 800}",
                    "city": "Gent" if i % 3 else "Antwerpen",
                    "country": "BE",
                },
            }
        ],
        "emails": [
            {"type": "primary", "email": f"info{i}@volumeorg.be"},
            {"type": "support", "email": f"help{i}@volumeorg.be"},
        ],
        "telephones": [{"type": "primary", "number": f"+329{i:07d}"}],
        "responsible_user": {"id": f"vol-user-{i % max(n_users, 1)}"},
        "custom_fields": [
            _cf(orid, CF["5.1 - OR-ID"]),
            _cf(status, CF["2.2 - CP status"]),
            _cf("1 - Cultuur organisatie", CF["1.1 - Type organisatie"]),
            _cf(i % 2 == 0, CF["4.2 - Watermerk"]),
            _cf(i % 4 == 0, CF["4.1 - Bezoekertool"]),
            _cf(f"Beschrijving volume organisatie {i}", CF["CP - Omschrijving (200 tek.)"]),
            _cf(f"ontsluiting{i}@volumeorg.be", CF["E-mail Ontsluiting"]),
            _cf(f"+328{i:07d}", CF["Telefoon Ontsluiting"]),
            _cf(f"facturatie{i}@volumeorg.be", CF["E-mail Facturatie"]),
            _cf(f"https://forms.volumeorg.be/{i}", CF["CP - Link aanvraagformulier"]),
        ],
    }


#: businessCategory cycle for volume ldap orgs, keyed on i % 12: every
#: classifier mapping (cp / sc / school / sp) gets a proportional slice
#: so ALL SEVEN ldap mappings carry a data-dependent term at volume
#: (r09 verdict stretch 8), with Content Partner still the bulk — the
#: reference corpus shape.
_VOLUME_LDAP_CATEGORIES = (
    "Customer",            # i % 12 == 0  → ldap_mapping_sc
    "Content Partner",     # 1
    "Content Partner",     # 2
    "School",              # 3           → ldap_mapping_school
    "Content Partner",     # 4
    "Content Partner",     # 5
    "Service Provider",    # 6           → ldap_mapping_sp
    "Content Partner",     # 7
    "Content Partner",     # 8
    "Customer",            # 9
    "Content Partner",     # 10
    "Content Partner",     # 11
)


def _volume_ldap(i: int) -> dict:
    """One ldap_organizations doc for every SECOND company's OR-ID (the
    cross-graph join in the org mappings must hit and miss); every 10th
    org carries two organizational units; businessCategory cycles
    through all four classifier mappings' categories
    (_VOLUME_LDAP_CATEGORIES) and every 12th-with-remainder-3 org is
    additionally an x-be-viaa-educationalOrganization — so each of the
    seven ldap mappings derives volume rows."""
    orid = f"OR-vol{2 * i:06d}"
    units = ()
    if i % 10 == 0:
        units = (
            {
                "objectClass": ["organizationalUnit"],
                "ou": f"{orid}-unit1",
                "description": f"Volume Unit {i}",
                "street": f"Unitstraat {i % 50 + 1}",
                "postalCode": "9050",
                "l": "Gentbrugge",
                "st": "Oost-Vlaanderen",
                "x-be-viaa-sector": "Cultuur",
            },
        )
    return _ldap_org(
        orid,
        f"Volume Organisatie {2 * i}",
        _VOLUME_LDAP_CATEGORIES[i % 12],
        sector="Cultuur" if i % 2 else "Media",
        address={
            "street": f"Ldapstraat {i % 80 + 1}",
            "postalCode": "9000",
            "l": "Gent",
            "st": "Oost-Vlaanderen",
        },
        extra_classes=(
            ("x-be-viaa-educationalOrganization",) if i % 12 == 3 else ()
        ),
        units=units,
    )


def _volume_user(i: int) -> dict:
    u = {
        "id": f"vol-user-{i}",
        "first_name": f"Voornaam{i}",
        "last_name": f"Achternaam{i}",
        "email": f"user{i}@meemoo.be",
    }
    if i % 3:
        u["function"] = f"Account manager {i}"
        u["telephones"] = [{"type": "mobile", "number": f"+3247{i:07d}"}]
    return u


def volume_documents(spark, n_companies: int = 30000):
    """Generated staging corpus at parametric volume: source name →
    DataFrame of (doc_id, json), document shapes identical to the
    fixtures but scaled — n companies, n/2 ldap orgs, n/6 users, the
    11-row custom-field lookup, and one whole-file tenants doc per 100
    companies. Generation is DISTRIBUTED (mapInPandas over spark.range;
    the driver never holds the corpus) so the pipeline's data-dependent
    cost — not corpus materialization — is what a caller times.

    The custom-field definitions stay a bounded lookup while companies
    scale, which is exactly the shape that makes the mapping's
    definition-id join broadcastable at any corpus size (SURVEY.md §2
    op 17; asserted in tests/test_pipeline.py)."""
    import pandas as pd

    n_users = max(n_companies // 6, 1)
    n_ldap = max(n_companies // 2, 1)

    def gen(builder, prefix):
        def run(batches):
            for pdf in batches:
                ids, docs = [], []
                for i in pdf["id"]:
                    ids.append(f"{prefix}-{i}")
                    docs.append(json.dumps(builder(int(i))))
                yield pd.DataFrame({"doc_id": ids, "json": docs})

        return run

    schema = "doc_id string, json string"
    companies = spark.range(n_companies).mapInPandas(
        gen(lambda i: _volume_company(i, n_users), "tl_companies"), schema
    )
    ldap = spark.range(n_ldap).mapInPandas(
        gen(_volume_ldap, "ldap_organizations"), schema
    )
    users = spark.range(n_users).mapInPandas(
        gen(_volume_user, "tl_users"), schema
    )
    cfs = spark.createDataFrame(
        [
            (f"tl_custom_fields-{i}", json.dumps(d))
            for i, d in enumerate(tl_custom_fields())
        ],
        schema,
    )
    tenants = spark.createDataFrame(
        [
            (
                "mediahaven_tenants-0",
                json.dumps(
                    [
                        {
                            "Name": f"Tenant Volume {i}",
                            "ExternalId": f"OR-vol{i:06d}",
                        }
                        for i in range(0, n_companies, 100)
                    ]
                ),
            )
        ],
        schema,
    )
    return {
        "ldap_organizations": ldap,
        "tl_users": users,
        "tl_companies": companies,
        "tl_custom_fields": cfs,
        "mediahaven_tenants": tenants,
    }
