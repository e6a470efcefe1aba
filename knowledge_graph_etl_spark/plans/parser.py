"""SPARQL Update parser — the reference workload's exact subset.

Parses the update forms the reference submits to its store
(reference sparql_update.py:92-106 POSTs these verbatim):

  * ``PREFIX`` prologue
  * ``[WITH <g>] INSERT { template } [USING <g>]* WHERE { group }``
    (all 13 sparql/ files + 3 inline queries, SURVEY.md §2.3), including
    the ``GRAPH <g> { ... }`` template form
    (reference sparql/tl_users_mapping.sparql:12)
  * ``INSERT DATA { GRAPH <g> { constant triples } }``
    (reference load_knowledge_graph.py:520-532)
  * ``CLEAR [SILENT] GRAPH <g>`` / ``DROP [SILENT] GRAPH <g>``
    (reference load_knowledge_graph.py:341,623-665)

Grammar features exercised by those queries: ``;`` predicate lists, ``,``
object lists, ``[ ... ]`` blank-node property lists (desugared to fresh
non-exported variables, reference sparql/tl_companies_mapping_org.sparql:40-46),
``a`` = rdf:type, OPTIONAL (incl. nested + correlated,
sparql/tl_companies_mapping_contactpoint.sparql:44-54), BIND (incl. inside
OPTIONAL, sparql/tl_companies_mapping_classification.sparql:38), FILTER
(for completeness — the reference workload has none, SURVEY.md §2.5),
typed literals ``"..."^^xsd:T``, lang tags, and the scalar-function set
of SURVEY.md §2.4.

The output is a small algebra (dataclasses below); compilation to
DataFrame plans lives in :mod:`.compiler`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..terms import RDF_TYPE

# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class VarT:
    """Variable term ``?name``. Desugared bnodes get ``__b{n}`` names."""

    name: str


@dataclass(frozen=True)
class IriT:
    value: str


@dataclass(frozen=True)
class LitT:
    value: str
    datatype: str | None = None
    lang: str | None = None


@dataclass(frozen=True)
class BNodeT:
    """Concrete blank node (INSERT DATA only — the reference's hook
    string-builds INSERT DATA containing rdflib BNode ``_:`` labels,
    sparql_update.py:108-122)."""

    value: str


@dataclass(frozen=True)
class TriplePattern:
    s: object
    p: object
    o: object


@dataclass
class OptionalGroup:
    group: "Group"


@dataclass(frozen=True)
class BindExpr:
    expr: object
    var: str


@dataclass(frozen=True)
class FilterExpr:
    expr: object


@dataclass(frozen=True)
class CmpExpr:
    """Comparison ``l op r`` with op in = != < > <= >= (SPARQL §17.3:
    numeric comparison when both operands are numeric, else term/codepoint
    comparison)."""

    op: str
    left: object
    right: object


@dataclass(frozen=True)
class BoolExpr:
    """``&&`` / ``||`` chain (op in 'and'/'or')."""

    op: str
    parts: tuple


@dataclass(frozen=True)
class NotExpr:
    expr: object


@dataclass(frozen=True)
class ArithExpr:
    """Numeric arithmetic ``l op r`` with op in + - * / (SPARQL §17.3
    operator mapping, left-associative; unary minus desugars to
    ``0 - x``). Operands evaluate numerically (try_cast) — a non-numeric
    operand is a type error → unbound."""

    op: str
    left: object
    right: object


@dataclass(frozen=True)
class FuncCall:
    name: str
    args: tuple


@dataclass
class Group:
    elements: list = field(default_factory=list)


@dataclass
class GraphGroup:
    """``GRAPH <g> { ... }`` / ``GRAPH ?g { ... }`` in a WHERE clause.

    Constant form: the subgroup matches only quads of that graph (within
    the named-graph dataset). Variable form (``var`` set, ``graph`` None):
    the subgroup matches per named graph and binds the graph IRI to the
    variable — compiled by exporting the quad's ``g`` column as an
    ordinary variable from every pattern in the block, so same-graph
    matching is just the BGP's shared-variable join."""

    graph: str | None
    group: "Group"
    var: str | None = None


@dataclass
class ServiceGroup:
    """``SERVICE [SILENT] <iri> { ... }`` (SPARQL 1.1 Federated Query):
    the subgroup evaluates against the registered remote store's dataset
    and joins the outer solutions on shared variables. ``silent``: an
    unresolvable endpoint yields the unit solution instead of an error
    (§2.2). Variable endpoints are rejected at parse time."""

    endpoint: str
    group: "Group"
    silent: bool = False


@dataclass
class SubSelect:
    """``{ SELECT ... }`` nested query (SPARQL 1.1 §12): evaluated against
    the enclosing dataset (FROM is not allowed inside), its projected
    solutions join the outer group on shared variables."""

    query: "SelectQuery"


@dataclass
class UnionGroup:
    """``{ g1 } UNION { g2 } ...`` (GroupOrUnionGraphPattern): solution
    union with unshared variables unbound — a bare braced subgroup parses
    as a one-element union."""

    groups: list


@dataclass
class ValuesClause:
    """``VALUES ?v { ... }`` / ``VALUES (?a ?b) { (..) (..) }`` inline
    data; rows hold IriT/LitT terms or None for UNDEF."""

    variables: list  # [str]
    rows: list  # [[term|None, ...]]


@dataclass
class ExistsFilter:
    """``FILTER EXISTS { g }`` / ``FILTER NOT EXISTS { g }`` — a semi/anti
    join against the group's solutions on shared variables (SPARQL 1.1
    §8.1). With NO shared variables the subgroup acts as a global gate:
    non-empty ⇒ all solutions pass (EXISTS) / none do (NOT EXISTS)."""

    group: "Group"
    negated: bool


@dataclass
class MinusGroup:
    """``MINUS { g }`` (SPARQL 1.1 §8.3): remove solutions that have a
    COMPATIBLE solution in g sharing at least one variable — with no
    shared variables MINUS removes nothing (the spec's
    disjoint-domain rule, the observable difference vs NOT EXISTS)."""

    group: "Group"


@dataclass
class InsertWhere:
    template: list  # [(graph | None, TriplePattern)]
    target_graph: str | None  # WITH <g>
    using: list  # graph IRIs
    where: Group
    #: ``USING NAMED <g>`` graphs — the named-graph dataset GRAPH blocks
    #: match against (SPARQL 1.1 Update §3.1.3)
    using_named: list = field(default_factory=list)


@dataclass
class InsertData:
    quads: list  # [(graph, TriplePattern with constant terms)]


@dataclass
class DeleteData:
    quads: list  # [(graph, TriplePattern with constant terms, no bnodes)]


@dataclass
class DeleteWhere:
    """``[WITH <g>] DELETE { t } [INSERT { t }] USING* WHERE { g }`` and the
    ``DELETE WHERE { p }`` shortcut (template = pattern). SPARQL 1.1 Update
    Modify operation — the dual of :class:`InsertWhere`: the delete template
    instantiates against the WHERE solutions and the resulting quads are
    removed (set semantics); the optional insert template instantiates
    against the SAME pre-modification solutions."""

    delete_template: list  # [(graph | None, TriplePattern)]
    insert_template: list | None
    target_graph: str | None  # WITH <g>
    using: list
    where: Group
    using_named: list = field(default_factory=list)


@dataclass
class GraphDDL:
    verb: str  # 'clear' | 'drop'
    graph: str | None  # None when scope != 'graph'
    silent: bool
    #: 'graph' (CLEAR GRAPH <g>) | 'named' | 'all'. In a named-graph-
    #: partitioned store there is no default graph, so NAMED ≡ ALL here;
    #: DEFAULT is rejected at parse time with a pointer to GRAPH <g>.
    scope: str = "graph"


@dataclass(frozen=True)
class GraphCopy:
    """``ADD/MOVE/COPY [SILENT] GRAPH <src> TO GRAPH <dst>`` (SPARQL 1.1
    Update §3.2.5-7). ADD unions src into dst; COPY replaces dst with src;
    MOVE is COPY followed by DROP src. DEFAULT operands are rejected (no
    default graph in this store model)."""

    verb: str  # 'add' | 'move' | 'copy'
    src: str
    dst: str
    silent: bool


@dataclass(frozen=True)
class LoadGraph:
    """``LOAD [SILENT] <source> INTO GRAPH <g>`` (SPARQL 1.1 Update §3.1.2):
    source is a file path / file:// IRI read via the format-autodetecting
    RDF source (sources.read_rdf — N-Triples / Turtle / RDF/XML, mirroring
    the reference's rdflib parse autodetect, sparql_update.py:124-133).
    ``INTO GRAPH`` is required — there is no default graph to load into."""

    source: str
    graph: str
    silent: bool


@dataclass(frozen=True)
class AggCall:
    """Aggregate in a SELECT projection: ``name`` in COUNT/SUM/MIN/MAX/
    AVG/SAMPLE/GROUP_CONCAT; ``arg`` is an expression AST or None for
    ``COUNT(*)``; ``distinct`` only with COUNT; ``separator`` only with
    GROUP_CONCAT (default space per SPARQL)."""

    name: str
    arg: object | None
    distinct: bool = False
    separator: str = " "


@dataclass
class SelectQuery:
    """Read-side ``SELECT`` over the same algebra the updates compile
    through. ``variables`` is None for ``SELECT *``, else a list of
    ``(name, expr_or_None)`` — expr set for ``(expr AS ?v)`` projections."""

    variables: list | None
    distinct: bool
    from_graphs: list
    where: Group
    order_by: list  # [(expr_ast, desc: bool)]
    limit: int | None
    offset: int | None
    group_by: list = None  # [var name] or None
    having: object = None  # expression over projected aggregate aliases
    from_named: list = field(default_factory=list)  # FROM NAMED <g>


@dataclass
class AskQuery:
    from_graphs: list
    where: Group
    from_named: list = field(default_factory=list)


@dataclass
class PathT:
    """Property-path expression (SPARQL 1.1 §9 subset): ``op`` in
    ``seq`` / ``alt`` (parts = operand list), ``inv`` / ``plus`` /
    ``star`` (parts = [child]). Leaves are ``IriT``. Only valid in WHERE
    patterns — templates reject paths at parse time."""

    op: str
    parts: list


@dataclass
class DescribeQuery:
    """``DESCRIBE <iri>|?var ... [FROM <g>] [WHERE { ... }]`` — returns
    every quad whose SUBJECT is a described resource (outgoing-arcs
    description; the spec leaves the description form to the service)."""

    terms: list  # [IriT | VarT]
    from_graphs: list
    where: object | None  # Group
    from_named: list = field(default_factory=list)


@dataclass
class ConstructQuery:
    """Read-side ``CONSTRUCT { template } [FROM <g>...] WHERE { ... }`` —
    the query form of the INSERT template machinery: instantiates the
    template against the solutions and RETURNS the triples instead of
    inserting them."""

    template: list  # [(graph | None, TriplePattern)]
    from_graphs: list
    where: Group
    from_named: list = field(default_factory=list)


# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+)
    | (?P<COMMENT>\#[^\n]*)
    | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
    | (?P<LONGSTRING>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<STRING>"(?:[^"\n\\]|\\.)*"|'(?:[^'\n\\]|\\.)*')
    | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
    | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<DTYPE>\^\^)
    | (?P<PNAME>(?:[A-Za-z_][\w-]*)?:
        (?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2}|\\[-_~.!$&'()*+,;=/?\#@%])
        (?:[\w-]|%[0-9A-Fa-f]{2}|\\[-_~.!$&'()*+,;=/?\#@%]|\.(?=[\w%\\-]))* )
    | (?P<PNAME_NS>(?:[A-Za-z_][\w-]*)?:)
    | (?P<NUMBER>[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<NAME>[A-Za-z_][\w-]*)
    | (?P<PUNCT>[{}\[\]();,.*+\-/^|<>=!&?])
    """,
    re.VERBOSE,
)

_STR_ESCAPES = {
    "t": "\t",
    "n": "\n",
    "r": "\r",
    "b": "\b",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            out.append(_STR_ESCAPES.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


@dataclass(frozen=True)
class Token:
    kind: str
    text: str
    pos: int


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SyntaxError(f"unexpected character {text[pos]!r} at offset {pos}")
        kind = m.lastgroup or ""
        if kind not in ("WS", "COMMENT"):
            tokens.append(Token(kind, m.group(), pos))
        pos = m.end()
    return tokens


# --------------------------------------------------------------------------
# Parser
# --------------------------------------------------------------------------

_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

AGG_FUNCS = {"COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT"}


def _number_lit(text: str) -> "LitT":
    """SPARQL numeric literal → typed literal (same rule everywhere a
    number can appear: pattern objects, VALUES rows)."""
    if "e" in text.lower():
        return LitT(text, "http://www.w3.org/2001/XMLSchema#double")
    if "." in text:
        return LitT(text, "http://www.w3.org/2001/XMLSchema#decimal")
    return LitT(text, "http://www.w3.org/2001/XMLSchema#integer")

FUNCTIONS = {
    "CONCAT",
    "MD5",
    "URI",
    "IRI",
    "IF",
    "BOUND",
    "STRSTARTS",
    "STRLANG",
    "LCASE",
    "UCASE",
    "REPLACE",
    "STRAFTER",
    "STRBEFORE",
    "ENCODE_FOR_URI",
    "STR",
    # SPARQL 1.1 §17.4 builtins beyond the reference workload (the read
    # side of the engine exposes the full common set)
    "STRLEN",
    "SUBSTR",
    "CONTAINS",
    "STRENDS",
    "REGEX",
    "COALESCE",
    "ABS",
    "CEIL",
    "FLOOR",
    "ROUND",
    "LANG",
    "DATATYPE",
    "LANGMATCHES",
    "ISIRI",
    "ISURI",
    "ISBLANK",
    "ISLITERAL",
    "ISNUMERIC",
    "SAMETERM",
    "SHA1",
    "SHA256",
    "SHA384",
    "SHA512",
    "STRDT",
    "YEAR",
    "MONTH",
    "DAY",
    "HOURS",
    "MINUTES",
    "SECONDS",
    "TZ",
    "NOW",
    "UUID",
    "STRUUID",
}


class _Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self._bnode_n = 0
        # property paths are WHERE-only: parse_group flips this on, so a
        # path in an INSERT/DELETE/CONSTRUCT template fails loudly
        self._allow_paths = False
        # NOW() instant, stamped at first use — one constant per query
        self._now: str | None = None

    # -- token helpers ----------------------------------------------------

    def peek(self, k: int = 0) -> Token | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> Token:
        t = self.peek()
        if t is None:
            raise SyntaxError("unexpected end of input")
        self.i += 1
        return t

    def at_name(self, *names: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "NAME" and t.text.upper() in names

    def expect_name(self, name: str) -> None:
        t = self.next()
        if t.kind != "NAME" or t.text.upper() != name:
            raise SyntaxError(f"expected {name}, got {t.text!r} at {t.pos}")

    def at_punct(self, ch: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "PUNCT" and t.text == ch

    def expect_punct(self, ch: str) -> None:
        t = self.next()
        if t.kind != "PUNCT" or t.text != ch:
            raise SyntaxError(f"expected {ch!r}, got {t.text!r} at {t.pos}")

    # -- terms ------------------------------------------------------------

    def resolve_pname(self, text: str) -> str:
        ns, _, local = text.partition(":")
        if ns not in self.prefixes:
            raise SyntaxError(f"undefined prefix {ns!r}:")
        # PLX: %XX percent-escapes stay verbatim in the IRI; \-escapes drop
        # the backslash (SPARQL PN_LOCAL — needed because the reference mints
        # ':{quote_plus(run_id)}' local names, load_knowledge_graph.py:524)
        return self.prefixes[ns] + re.sub(r"\\(.)", r"\1", local)

    def parse_iri(self) -> str:
        t = self.next()
        if t.kind == "IRIREF":
            return t.text[1:-1]
        if t.kind in ("PNAME", "PNAME_NS"):
            return self.resolve_pname(t.text)
        raise SyntaxError(f"expected IRI, got {t.text!r} at {t.pos}")

    def parse_literal(self) -> LitT:
        t = self.next()
        raw = t.text[3:-3] if t.kind == "LONGSTRING" else t.text[1:-1]
        value = _unescape(raw)
        nxt = self.peek()
        if nxt is not None and nxt.kind == "DTYPE":
            self.next()
            dt = self.parse_iri()
            # RDF 1.1: "..."^^xsd:string IS the plain string literal
            return LitT(value, None if dt == _XSD_STRING else dt)
        if nxt is not None and nxt.kind == "LANGTAG":
            self.next()
            return LitT(value, None, nxt.text[1:])
        return LitT(value)

    def _user_var(self, t) -> VarT:
        """Validate a user variable token: '__' is the engine's companion-
        column delimiter and '_anon_' the bnode-desugaring namespace — a
        user variable in either would silently confuse the join logic, so
        reject at parse time."""
        name = t.text[1:]
        if "__" in name or name.startswith("_anon_"):
            raise SyntaxError(f"variable name ?{name} is reserved at {t.pos}")
        return VarT(name)

    def fresh_bnode_var(self) -> VarT:
        # NOTE: no double underscore — columns containing "__" are term
        # companion columns in the compiled solution mapping (bgp.py), so a
        # "__bN" name would be invisible to shared-variable join detection
        self._bnode_n += 1
        return VarT(f"_anon_{self._bnode_n}")

    # -- entry ------------------------------------------------------------

    def parse_update(self):
        self.parse_prologue()
        if self.at_name("CLEAR", "DROP"):
            return self.parse_ddl()
        if self.at_name("ADD", "MOVE", "COPY"):
            return self.parse_graph_copy()
        if self.at_name("LOAD"):
            return self.parse_load()
        if self.at_name("INSERT"):
            self.next()
            if self.at_name("DATA"):
                self.next()
                return self.parse_insert_data()
            return self.parse_insert_where(target=None, insert_consumed=True)
        if self.at_name("DELETE"):
            self.next()
            return self.parse_delete(target=None)
        if self.at_name("WITH"):
            self.next()
            target = self.parse_iri()
            if self.at_name("DELETE"):
                self.next()
                return self.parse_delete(target=target)
            self.expect_name("INSERT")
            return self.parse_insert_where(target=target, insert_consumed=True)
        t = self.peek()
        raise SyntaxError(f"expected update form, got {t.text if t else 'EOF'!r}")

    def parse_query(self):
        self.parse_prologue()
        if self.at_name("SELECT"):
            self.next()
            return self.parse_select()
        if self.at_name("ASK"):
            self.next()
            from_graphs, from_named = self.parse_from_clauses()
            if self.at_name("WHERE"):
                self.next()
            return AskQuery(from_graphs, self.parse_group(), from_named)
        if self.at_name("DESCRIBE"):
            self.next()
            terms = []
            while True:
                t = self.peek()
                if t is not None and t.kind == "VAR":
                    self.next()
                    terms.append(self._user_var(t))
                elif t is not None and t.kind in ("IRIREF", "PNAME", "PNAME_NS"):
                    terms.append(IriT(self.parse_iri()))
                else:
                    break
            if not terms:
                raise SyntaxError("DESCRIBE needs at least one IRI or variable")
            from_graphs, from_named = self.parse_from_clauses()
            where = None
            if self.at_name("WHERE") or self.at_punct("{"):
                if self.at_name("WHERE"):
                    self.next()
                where = self.parse_group()
            return DescribeQuery(terms, from_graphs, where, from_named)
        if self.at_name("CONSTRUCT"):
            self.next()
            if not self.at_punct("{"):
                # CONSTRUCT [FROM ...] WHERE { triples } shorthand (SPARQL
                # 1.1 §10.2.2): the pattern IS the template. Bnode sugar
                # desugars to shared _anon_ vars, so the constructed
                # triples reuse the WHERE bindings rather than minting.
                from_graphs, from_named = self.parse_from_clauses()
                self.expect_name("WHERE")
                prev = self._allow_paths  # plain triples only — no paths
                self._allow_paths = False
                try:
                    template = self.parse_template_block()
                finally:
                    self._allow_paths = prev
                if any(g is not None for g, _ in template):
                    raise SyntaxError(
                        "GRAPH blocks are not allowed in the CONSTRUCT "
                        "WHERE shorthand; use the full CONSTRUCT form"
                    )
                where = Group(elements=[tp for _, tp in template])
                return ConstructQuery(template, from_graphs, where, from_named)
            template = self.parse_template_block()
            from_graphs, from_named = self.parse_from_clauses()
            if self.at_name("WHERE"):
                self.next()
            return ConstructQuery(
                template, from_graphs, self.parse_group(), from_named
            )
        t = self.peek()
        raise SyntaxError(f"expected query form, got {t.text if t else 'EOF'!r}")

    def parse_prologue(self) -> None:
        while self.at_name("PREFIX"):
            self.next()
            t = self.next()
            if t.kind not in ("PNAME_NS",):
                raise SyntaxError(f"expected prefix declaration at {t.pos}")
            ns = t.text[:-1]
            iri_t = self.next()
            if iri_t.kind != "IRIREF":
                raise SyntaxError(f"expected IRI in PREFIX at {iri_t.pos}")
            self.prefixes[ns] = iri_t.text[1:-1]

    def parse_ddl(self) -> GraphDDL:
        verb = self.next().text.lower()
        silent = False
        if self.at_name("SILENT"):
            silent = True
            self.next()
        if self.at_name("NAMED", "ALL"):
            scope = self.next().text.lower()
            return GraphDDL(verb, None, silent, "named" if scope == "named" else "all")
        if self.at_name("DEFAULT"):
            raise SyntaxError(
                f"{verb.upper()} DEFAULT is not supported — this store has no "
                "default graph (every quad lives in a named graph); use "
                f"{verb.upper()} GRAPH <g>"
            )
        self.expect_name("GRAPH")
        graph = self.parse_iri()
        return GraphDDL(verb, graph, silent)

    def _graph_operand(self, verb: str) -> str:
        """``[GRAPH] <iri>`` operand of ADD/MOVE/COPY; DEFAULT rejected."""
        if self.at_name("DEFAULT"):
            raise SyntaxError(
                f"{verb} DEFAULT is not supported — this store has no default "
                f"graph; use {verb} GRAPH <g> TO GRAPH <g>"
            )
        if self.at_name("GRAPH"):
            self.next()
        return self.parse_iri()

    def parse_graph_copy(self) -> GraphCopy:
        verb = self.next().text.lower()
        silent = False
        if self.at_name("SILENT"):
            silent = True
            self.next()
        src = self._graph_operand(verb.upper())
        self.expect_name("TO")
        dst = self._graph_operand(verb.upper())
        return GraphCopy(verb, src, dst, silent)

    def parse_load(self) -> LoadGraph:
        self.next()  # LOAD
        silent = False
        if self.at_name("SILENT"):
            silent = True
            self.next()
        source = self.parse_iri()
        if not self.at_name("INTO"):
            raise SyntaxError(
                "LOAD without INTO GRAPH is not supported — this store has "
                "no default graph to load into; use LOAD <src> INTO GRAPH <g>"
            )
        self.next()
        self.expect_name("GRAPH")
        graph = self.parse_iri()
        return LoadGraph(source, graph, silent)

    # -- INSERT DATA ------------------------------------------------------

    def parse_insert_data(self) -> InsertData:
        self.expect_punct("{")
        quads: list[tuple[str | None, TriplePattern]] = []
        while not self.at_punct("}"):
            if self.at_name("GRAPH"):
                self.next()
                g = self.parse_iri()
                self.expect_punct("{")
                while not self.at_punct("}"):
                    for tp in self.parse_triples_block(allow_vars=False):
                        quads.append((g, tp))
                self.expect_punct("}")
            else:
                for tp in self.parse_triples_block(allow_vars=False):
                    quads.append((None, tp))
        self.expect_punct("}")
        return InsertData(quads)

    # -- INSERT ... WHERE -------------------------------------------------

    def parse_template_block(self) -> list:
        """``{ triples | GRAPH <g>|?g { triples } ... }`` → [(g|None, tp)];
        a variable graph (``GRAPH ?g`` — SPARQL 1.1 quad template routing)
        carries the VarT and reads its binding per solution row."""
        self.expect_punct("{")
        template: list[tuple[object, TriplePattern]] = []
        while not self.at_punct("}"):
            if self.at_name("GRAPH"):
                self.next()
                t = self.peek()
                if t is not None and t.kind == "VAR":
                    self.next()
                    g: object = self._user_var(t)
                else:
                    g = self.parse_iri()
                self.expect_punct("{")
                while not self.at_punct("}"):
                    for tp in self.parse_triples_block(allow_vars=True):
                        template.append((g, tp))
                self.expect_punct("}")
            else:
                for tp in self.parse_triples_block(allow_vars=True):
                    template.append((None, tp))
        self.expect_punct("}")
        return template

    def parse_insert_where(self, target: str | None, insert_consumed: bool) -> InsertWhere:
        if not insert_consumed:
            self.expect_name("INSERT")
        template = self.parse_template_block()
        using, using_named = self._parse_using_clauses()
        self.expect_name("WHERE")
        where = self.parse_group()
        return InsertWhere(template, target, using, where, using_named)

    def _parse_using_clauses(self) -> tuple[list[str], list[str]]:
        """``USING <g>`` (default matching dataset) and ``USING NAMED <g>``
        (the named-graph set GRAPH blocks match against) — the update-side
        duals of FROM / FROM NAMED (SPARQL 1.1 Update §3.1.3)."""
        using: list[str] = []
        named: list[str] = []
        while self.at_name("USING"):
            self.next()
            if self.at_name("NAMED"):
                self.next()
                named.append(self.parse_iri())
            else:
                using.append(self.parse_iri())
        return using, named

    # -- DELETE forms -----------------------------------------------------

    def parse_delete(self, target: str | None):
        """After the DELETE keyword: ``DATA { quads }``, the
        ``DELETE WHERE { pattern }`` shortcut, or the Modify form
        ``DELETE { t } [INSERT { t }] USING* WHERE { group }``."""
        if self.at_name("DATA"):
            if target is not None:
                raise SyntaxError("WITH is not allowed with DELETE DATA")
            self.next()
            data = self.parse_insert_data()
            for g, tp in data.quads:
                for t in (tp.s, tp.p, tp.o):
                    if isinstance(t, BNodeT):
                        raise SyntaxError(
                            "blank nodes are not allowed in DELETE DATA"
                        )
            return DeleteData(data.quads)
        if self.at_name("WHERE"):
            # DELETE WHERE { p }: the pattern IS the template. GRAPH blocks
            # scope both matching and deletion to that graph (constant, or
            # variable — ``DELETE WHERE { GRAPH ?g { p } }`` matches per
            # named graph and deletes in place); allow at most one
            # distinct GRAPH.
            self.next()
            template = self.parse_template_block()
            graphs = {g for g, _ in template if g is not None}
            if len(graphs) > 1:
                raise SyntaxError(
                    "DELETE WHERE with multiple GRAPH blocks is not supported"
                )
            self._check_no_template_bnodes(template, "DELETE WHERE")
            g = next(iter(graphs), None)
            if isinstance(g, VarT):
                # wrap the WHERE side so matching is per named graph and
                # binds the var the delete template routes on
                where = Group(
                    elements=[
                        GraphGroup(
                            None,
                            Group(elements=[tp for _, tp in template]),
                            var=g.name,
                        )
                    ]
                )
                return DeleteWhere(template, None, target, [], where)
            where = Group(elements=[tp for _, tp in template])
            return DeleteWhere(
                template, None, target, [g] if g else [], where
            )
        template = self.parse_template_block()
        self._check_no_template_bnodes(template, "DELETE")
        insert_template = None
        if self.at_name("INSERT"):
            self.next()
            insert_template = self.parse_template_block()
        using, using_named = self._parse_using_clauses()
        self.expect_name("WHERE")
        where = self.parse_group()
        return DeleteWhere(
            template, insert_template, target, using, where, using_named
        )

    def _check_no_template_bnodes(self, template: list, form: str) -> None:
        """SPARQL 1.1 Update: blank nodes (incl. ``[...]`` sugar, which the
        parser desugars to ``_anon_*`` vars) are illegal in delete
        templates — a fresh bnode can never match anything to delete."""
        for _, tp in template:
            for t in (tp.s, tp.p, tp.o):
                if isinstance(t, BNodeT) or (
                    isinstance(t, VarT) and t.name.startswith("_anon_")
                ):
                    raise SyntaxError(
                        f"blank nodes are not allowed in a {form} template"
                    )

    # -- SELECT / ASK -----------------------------------------------------

    def parse_from_clauses(self) -> tuple[list[str], list[str]]:
        """``FROM <g>`` (default dataset) and ``FROM NAMED <g>`` (the
        named-graph set GRAPH blocks match against)."""
        graphs: list[str] = []
        named: list[str] = []
        while self.at_name("FROM"):
            self.next()
            if self.at_name("NAMED"):
                self.next()
                named.append(self.parse_iri())
            else:
                graphs.append(self.parse_iri())
        return graphs, named

    def parse_select(self) -> SelectQuery:
        distinct = False
        if self.at_name("DISTINCT"):
            distinct = True
            self.next()
        elif self.at_name("REDUCED"):
            # REDUCED permits (but does not require) duplicate elimination —
            # emitting the duplicates verbatim is conformant
            self.next()
        variables: list | None = None
        if self.at_punct("*"):
            self.next()
        else:
            variables = []
            while True:
                t = self.peek()
                if t is None:
                    raise SyntaxError("unexpected end of input in SELECT")
                if t.kind == "VAR":
                    self.next()
                    variables.append((self._user_var(t).name, None))
                elif t.kind == "PUNCT" and t.text == "(":
                    self.next()
                    expr = self.parse_expr()
                    self.expect_name("AS")
                    var = self.next()
                    if var.kind != "VAR":
                        raise SyntaxError(
                            f"expected variable after AS at {var.pos}"
                        )
                    self.expect_punct(")")
                    variables.append((self._user_var(var).name, expr))
                else:
                    break
            if not variables:
                raise SyntaxError("SELECT needs a projection (vars or *)")
        from_graphs, from_named = self.parse_from_clauses()
        if self.at_name("WHERE"):
            self.next()
        where = self.parse_group()
        order_by: list = []
        limit: int | None = None
        offset: int | None = None
        group_by: list = []
        having = None
        while True:
            if self.at_name("ORDER"):
                self.next()
                self.expect_name("BY")
                while True:
                    t = self.peek()
                    if t is None:
                        break
                    if self.at_name("ASC", "DESC"):
                        desc = self.next().text.upper() == "DESC"
                        self.expect_punct("(")
                        expr = self.parse_expr()
                        self.expect_punct(")")
                        order_by.append((expr, desc))
                    elif t.kind == "VAR":
                        self.next()
                        order_by.append((self._user_var(t), False))
                    elif t.kind == "NAME" and t.text.upper() in FUNCTIONS:
                        order_by.append((self.parse_expr(), False))
                    else:
                        break
                if not order_by:
                    raise SyntaxError("ORDER BY needs at least one condition")
            elif self.at_name("GROUP"):
                self.next()
                self.expect_name("BY")
                group_by = []
                while True:
                    t = self.peek()
                    if t is None or t.kind != "VAR":
                        break
                    self.next()
                    group_by.append(self._user_var(t).name)
                if not group_by:
                    raise SyntaxError("GROUP BY needs at least one variable")
            elif self.at_name("HAVING"):
                self.next()
                self.expect_punct("(")
                having = self.parse_expr()
                self.expect_punct(")")
            elif self.at_name("LIMIT"):
                self.next()
                t = self.next()
                if t.kind != "NUMBER" or not t.text.isdigit():
                    raise SyntaxError(f"LIMIT needs an integer at {t.pos}")
                limit = int(t.text)
            elif self.at_name("OFFSET"):
                self.next()
                t = self.next()
                if t.kind != "NUMBER" or not t.text.isdigit():
                    raise SyntaxError(f"OFFSET needs an integer at {t.pos}")
                offset = int(t.text)
            elif self.at_name("VALUES"):
                # trailing ValuesClause (SPARQL §16.2.2): joins the query's
                # solutions — compiled by appending to the WHERE group,
                # which is exact for the modifier-free/aggregate-free case;
                # under GROUP BY the join point would be ambiguous, so
                # reject rather than guess
                self.next()
                if group_by:
                    raise SyntaxError(
                        "trailing VALUES with GROUP BY is not supported; "
                        "put the VALUES inside the WHERE group"
                    )
                where.elements.append(self.parse_values())
            else:
                break
        return SelectQuery(
            variables, distinct, from_graphs, where, order_by, limit, offset,
            group_by, having, from_named,
        )

    # -- groups -----------------------------------------------------------

    def parse_group(self) -> Group:
        prev_paths = self._allow_paths
        self._allow_paths = True
        try:
            return self._parse_group_body()
        finally:
            self._allow_paths = prev_paths

    def _parse_group_body(self) -> Group:
        self.expect_punct("{")
        g = Group()
        while not self.at_punct("}"):
            if self.at_name("OPTIONAL"):
                self.next()
                g.elements.append(OptionalGroup(self.parse_group()))
            elif self.at_name("BIND"):
                self.next()
                self.expect_punct("(")
                expr = self.parse_expr()
                self.expect_name("AS")
                var = self.next()
                if var.kind != "VAR":
                    raise SyntaxError(f"expected variable after AS at {var.pos}")
                self.expect_punct(")")
                g.elements.append(BindExpr(expr, self._user_var(var).name))
            elif self.at_name("FILTER"):
                self.next()
                if self.at_name("EXISTS"):
                    self.next()
                    g.elements.append(ExistsFilter(self.parse_group(), False))
                elif self.at_name("NOT"):
                    self.next()
                    self.expect_name("EXISTS")
                    g.elements.append(ExistsFilter(self.parse_group(), True))
                else:
                    self.expect_punct("(")
                    expr = self.parse_expr()
                    self.expect_punct(")")
                    g.elements.append(FilterExpr(expr))
            elif self.at_name("MINUS"):
                self.next()
                g.elements.append(MinusGroup(self.parse_group()))
            elif self.at_name("GRAPH"):
                self.next()
                t = self.peek()
                if t is not None and t.kind == "VAR":
                    self.next()
                    v = self._user_var(t)
                    g.elements.append(
                        GraphGroup(None, self.parse_group(), var=v.name)
                    )
                else:
                    graph_iri = self.parse_iri()
                    g.elements.append(GraphGroup(graph_iri, self.parse_group()))
            elif self.at_name("SERVICE"):
                self.next()
                silent = False
                if self.at_name("SILENT"):
                    self.next()
                    silent = True
                t = self.peek()
                if t is not None and t.kind == "VAR":
                    raise SyntaxError(
                        "SERVICE with a variable endpoint is not supported; "
                        f"use a constant service IRI (at {t.pos})"
                    )
                endpoint = self.parse_iri()
                g.elements.append(
                    ServiceGroup(endpoint, self.parse_group(), silent)
                )
            elif self.at_name("VALUES"):
                self.next()
                g.elements.append(self.parse_values())
            elif self.at_punct("{"):
                parts = [self._parse_group_or_subselect()]
                while self.at_name("UNION"):
                    self.next()
                    parts.append(self._parse_group_or_subselect())
                g.elements.append(UnionGroup(parts))
            else:
                for tp in self.parse_triples_block(allow_vars=True):
                    g.elements.append(tp)
        self.expect_punct("}")
        return g

    def _parse_group_or_subselect(self):
        """At a ``{``: either a nested group pattern or a subquery."""
        save = self.i
        self.expect_punct("{")
        if self.at_name("SELECT"):
            self.next()
            sub = self.parse_select()
            if sub.from_graphs or sub.from_named:
                raise SyntaxError(
                    "FROM is not allowed in a subquery (it inherits the "
                    "enclosing dataset)"
                )
            self.expect_punct("}")
            return SubSelect(sub)
        self.i = save
        return self.parse_group()

    def parse_values(self) -> ValuesClause:
        def _var_token():
            t = self.next()
            if t.kind != "VAR":
                raise SyntaxError(
                    f"VALUES needs variables, got {t.text!r} at {t.pos}"
                )
            return self._user_var(t).name

        if self.at_punct("("):
            self.next()
            names = []
            while not self.at_punct(")"):
                names.append(_var_token())
            self.expect_punct(")")
        else:
            names = [_var_token()]
        self.expect_punct("{")
        rows = []
        while not self.at_punct("}"):
            if self.at_punct("("):
                self.next()
                row = []
                while not self.at_punct(")"):
                    row.append(self._values_term())
                self.expect_punct(")")
            else:
                row = [self._values_term()]
            if len(row) != len(names):
                raise SyntaxError(
                    f"VALUES row width {len(row)} != variable count {len(names)}"
                )
            rows.append(row)
        self.expect_punct("}")
        return ValuesClause(names, rows)

    def _values_term(self):
        t = self.peek()
        if t is not None and t.kind == "NAME" and t.text == "UNDEF":
            self.next()
            return None
        if t is not None and t.kind in ("STRING", "LONGSTRING", "NUMBER"):
            if t.kind == "NUMBER":
                # SAME datatype rule as pattern objects — an untyped "5"
                # here could never term-join data stored as
                # "5"^^xsd:integer by a numeric triple
                self.next()
                return _number_lit(t.text)
            return self.parse_literal()
        return IriT(self.parse_iri())

    # -- triples ----------------------------------------------------------

    def parse_triples_block(self, allow_vars: bool) -> list[TriplePattern]:
        """One ``triplesSameSubject`` chain (incl. trailing ``.``); returns
        the desugared flat pattern list."""
        out: list[TriplePattern] = []
        subj = self.parse_term_or_bnode(out, allow_vars)
        # `[ props ] .` — a blank-node property list may stand alone with an
        # empty outer property list (SPARQL TriplesNode PropertyList)
        if not (out and (self.at_punct(".") or self.at_punct("}"))):
            self.parse_property_list(subj, out, allow_vars)
        if self.at_punct("."):
            self.next()
        return out

    def parse_property_list(self, subj, out: list, allow_vars: bool) -> None:
        first = True
        while True:
            if not first:
                if not self.at_punct(";"):
                    break
                while self.at_punct(";"):
                    self.next()
                # dangling ';' before '.', '}' or ']'
                if self.at_punct(".") or self.at_punct("}") or self.at_punct("]"):
                    break
            first = False
            pred = self.parse_verb()
            while True:
                obj = self.parse_term_or_bnode(out, allow_vars)
                out.append(TriplePattern(subj, pred, obj))
                if self.at_punct(","):
                    self.next()
                    continue
                break
            if not self.at_punct(";"):
                break

    def parse_verb(self):
        t = self.peek()
        if t is not None and t.kind == "VAR":
            # variable predicate ?p — valid in patterns and templates;
            # SPARQL 1.1 forbids variables inside property paths, so no
            # path modifiers apply
            self.next()
            return self._user_var(t)
        if self._allow_paths:
            return self.parse_path()
        return self.parse_verb_primary()

    def parse_verb_primary(self):
        t = self.peek()
        if t is not None and t.kind == "NAME" and t.text == "a":
            self.next()
            return IriT(RDF_TYPE)
        return IriT(self.parse_iri())

    # -- property paths (SPARQL 1.1 §9 subset: / ^ | + *) ------------------

    def parse_path(self):
        node = self.parse_path_seq()
        while self.at_punct("|"):
            self.next()
            alt = self.parse_path_seq()
            if isinstance(node, PathT) and node.op == "alt":
                node.parts.append(alt)
            else:
                node = PathT("alt", [node, alt])
        return node

    def parse_path_seq(self):
        parts = [self.parse_path_elt()]
        while self.at_punct("/"):
            self.next()
            parts.append(self.parse_path_elt())
        return parts[0] if len(parts) == 1 else PathT("seq", parts)

    def _nps_member(self):
        """PathOneInPropertySet := iri | '^' iri → (iri, inverted)."""
        if self.at_punct("^"):
            self.next()
            return (self.parse_verb_primary().value, True)
        return (self.parse_verb_primary().value, False)

    def parse_path_elt(self):
        inv = False
        if self.at_punct("^"):
            self.next()
            inv = True
        if self.at_punct("!"):
            # negated property set: !iri, !^iri, or !(iri|^iri|...) —
            # members are (iri, inverted) pairs (SPARQL 1.1 §9.1
            # PathOneInPropertySet); falls through to the +/*/? modifiers
            self.next()
            banned = []
            if self.at_punct("("):
                self.next()
                banned.append(self._nps_member())
                while self.at_punct("|"):
                    self.next()
                    banned.append(self._nps_member())
                self.expect_punct(")")
            else:
                banned.append(self._nps_member())
            prim = PathT("nps", banned)
        elif self.at_punct("("):
            self.next()
            prim = self.parse_path()
            self.expect_punct(")")
        else:
            prim = self.parse_verb_primary()
        if self.at_punct("+"):
            self.next()
            prim = PathT("plus", [prim])
        elif self.at_punct("*"):
            self.next()
            prim = PathT("star", [prim])
        elif self.at_punct("?"):
            self.next()
            prim = PathT("opt", [prim])
        if inv:
            prim = PathT("inv", [prim])
        return prim

    def parse_term_or_bnode(self, out: list, allow_vars: bool):
        t = self.peek()
        if t is None:
            raise SyntaxError("unexpected end of input in triples block")
        if t.kind == "PUNCT" and t.text == "[":
            # blank-node property list → fresh non-exported variable in
            # patterns (reference sparql/tl_companies_mapping_org.sparql:40-46);
            # in INSERT DATA it's a concrete fresh bnode
            self.next()
            if allow_vars:
                node = self.fresh_bnode_var()
            else:
                self._bnode_n += 1
                node = BNodeT(f"b{self._bnode_n}")
            if not self.at_punct("]"):
                self.parse_property_list(node, out, allow_vars)
            self.expect_punct("]")
            return node
        if t.kind == "PNAME" and t.text.startswith("_:"):
            # explicit bnode label (the reference hook emits rdflib _:N3
            # labels inside INSERT DATA, sparql_update.py:115-120)
            self.next()
            if allow_vars:
                # bnode labels in patterns scope like non-exported variables
                return VarT(f"_anon_label_{t.text[2:]}")
            return BNodeT(t.text[2:])
        if t.kind == "VAR":
            if not allow_vars:
                raise SyntaxError(f"variable not allowed here at {t.pos}")
            self.next()
            return self._user_var(t)
        if t.kind in ("STRING", "LONGSTRING"):
            return self.parse_literal()
        if t.kind == "NUMBER":
            self.next()
            return _number_lit(t.text)
        return IriT(self.parse_iri())

    # -- expressions ------------------------------------------------------

    def parse_expr(self):
        return self.parse_or_expr()

    def _at_two_puncts(self, a: str, b: str) -> bool:
        t1, t2 = self.peek(), (
            self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
        )
        return (
            t1 is not None and t1.kind == "PUNCT" and t1.text == a
            and t2 is not None and t2.kind == "PUNCT" and t2.text == b
        )

    def parse_or_expr(self):
        parts = [self.parse_and_expr()]
        while self._at_two_puncts("|", "|"):
            self.next(); self.next()
            parts.append(self.parse_and_expr())
        return parts[0] if len(parts) == 1 else BoolExpr("or", tuple(parts))

    def parse_and_expr(self):
        parts = [self.parse_not_expr()]
        while self._at_two_puncts("&", "&"):
            self.next(); self.next()
            parts.append(self.parse_not_expr())
        return parts[0] if len(parts) == 1 else BoolExpr("and", tuple(parts))

    def parse_not_expr(self):
        if self.at_punct("!") and not self._at_two_puncts("!", "="):
            self.next()
            return NotExpr(self.parse_not_expr())
        return self.parse_cmp_expr()

    def parse_cmp_expr(self):
        left = self.parse_additive_expr()
        # IN / NOT IN (SPARQL §17.4.1.9-10): desugar to an =-chain — spec
        # defines them as shortcuts for || of = / && of !=, so the engine's
        # comparison semantics (numeric promotion, term equality, error
        # propagation) carry over for free
        if self.at_name("IN") or (
            self.at_name("NOT")
            and self.peek(1) is not None
            and self.peek(1).kind == "NAME"
            and self.peek(1).text.upper() == "IN"
        ):
            negated = self.at_name("NOT")
            self.next()
            if negated:
                self.next()
            self.expect_punct("(")
            items = []
            if not self.at_punct(")"):
                items.append(self.parse_additive_expr())
                while self.at_punct(","):
                    self.next()
                    items.append(self.parse_additive_expr())
            self.expect_punct(")")
            if not items:
                # IN () is false, NOT IN () true for any bound operand —
                # self-(in)equality expresses exactly that, and an unbound
                # operand still errors (NULL) as the spec requires
                return CmpExpr("=" if negated else "!=", left, left)
            if negated:
                parts = tuple(CmpExpr("!=", left, it) for it in items)
                return parts[0] if len(parts) == 1 else BoolExpr("and", parts)
            parts = tuple(CmpExpr("=", left, it) for it in items)
            return parts[0] if len(parts) == 1 else BoolExpr("or", parts)
        op = None
        if self._at_two_puncts("!", "="):
            self.next(); self.next(); op = "!="
        elif self._at_two_puncts("<", "="):
            self.next(); self.next(); op = "<="
        elif self._at_two_puncts(">", "="):
            self.next(); self.next(); op = ">="
        elif self.at_punct("="):
            self.next(); op = "="
        elif self.at_punct("<"):
            self.next(); op = "<"
        elif self.at_punct(">"):
            self.next(); op = ">"
        if op is None:
            return left
        return CmpExpr(op, left, self.parse_additive_expr())

    def parse_additive_expr(self):
        node = self.parse_mult_expr()
        while True:
            if self.at_punct("+") or self.at_punct("-"):
                op = self.next().text
                node = ArithExpr(op, node, self.parse_mult_expr())
                continue
            # SPARQL AdditiveExpression's signed-literal rule: the
            # tokenizer folds the sign into the NUMBER (``?x -2``), which
            # means "node + (-2)"
            t = self.peek()
            if t is not None and t.kind == "NUMBER" and t.text[0] in "+-":
                self.next()
                node = ArithExpr("+", node, _number_lit(t.text))
                continue
            return node

    def parse_mult_expr(self):
        node = self.parse_unary_arith()
        while self.at_punct("*") or self.at_punct("/"):
            op = self.next().text
            node = ArithExpr(op, node, self.parse_unary_arith())
        return node

    def parse_unary_arith(self):
        if self.at_punct("-"):
            self.next()
            return ArithExpr("-", LitT("0"), self.parse_unary_arith())
        if self.at_punct("+"):
            self.next()
            return self.parse_unary_arith()
        return self.parse_primary_expr()

    def parse_primary_expr(self):
        if self.at_punct("("):
            self.next()
            e = self.parse_expr()
            self.expect_punct(")")
            return e
        t = self.peek()
        if t is None:
            raise SyntaxError("unexpected end of input in expression")
        if t.kind == "VAR":
            self.next()
            return self._user_var(t)
        if t.kind in ("STRING", "LONGSTRING"):
            return self.parse_literal()
        if t.kind == "NUMBER":
            self.next()
            return LitT(t.text)
        if t.kind == "NAME" and t.text.upper() in AGG_FUNCS:
            fname = self.next().text.upper()
            self.expect_punct("(")
            distinct = False
            if self.at_name("DISTINCT"):
                distinct = True
                self.next()
            if self.at_punct("*"):
                if fname != "COUNT":
                    raise SyntaxError(f"{fname}(*) is not valid")
                self.next()
                arg = None
            else:
                arg = self.parse_expr()
            sep = " "
            if self.at_punct(";"):
                if fname != "GROUP_CONCAT":
                    raise SyntaxError(
                        f"SEPARATOR is only valid in GROUP_CONCAT, not {fname}"
                    )
                self.next()
                self.expect_name("SEPARATOR")
                self.expect_punct("=")
                t2 = self.next()
                if t2.kind not in ("STRING", "LONGSTRING"):
                    raise SyntaxError(f"SEPARATOR needs a string at {t2.pos}")
                raw = t2.text[3:-3] if t2.kind == "LONGSTRING" else t2.text[1:-1]
                sep = _unescape(raw)
            self.expect_punct(")")
            if distinct and fname != "COUNT":
                raise SyntaxError("DISTINCT is only supported inside COUNT")
            return AggCall(fname, arg, distinct, sep)
        if t.kind == "NAME" and t.text.upper() in FUNCTIONS:
            fname = self.next().text.upper()
            self.expect_punct("(")
            args = []
            if not self.at_punct(")"):
                args.append(self.parse_expr())
                while self.at_punct(","):
                    self.next()
                    args.append(self.parse_expr())
            self.expect_punct(")")
            # canonical aliases: IRI≡URI, isURI≡isIRI (SPARQL 1.1 §17.4)
            fname = {"IRI": "URI", "ISURI": "ISIRI"}.get(fname, fname)
            if fname == "NOW" and not args:
                # §17.4.5.1: the SAME instant for every NOW() occurrence in
                # one query — stamp ONCE PER PARSE (two occurrences in one
                # query must compare equal; a per-compile clock would not)
                if self._now is None:
                    import datetime as _dt

                    self._now = (
                        _dt.datetime.now(_dt.timezone.utc).strftime(
                            "%Y-%m-%dT%H:%M:%S.%f"
                        )[:-3]
                        + "Z"
                    )
                return LitT(
                    self._now, "http://www.w3.org/2001/XMLSchema#dateTime"
                )
            return FuncCall(fname, tuple(args))
        if t.kind in ("IRIREF", "PNAME", "PNAME_NS"):
            return IriT(self.parse_iri())
        raise SyntaxError(f"unexpected token {t.text!r} in expression at {t.pos}")


def _finish(p: "_Parser", node):
    if p.at_punct(";"):  # trailing separator
        p.next()
    if p.peek() is not None:
        t = p.peek()
        raise SyntaxError(f"trailing input at {t.pos}: {t.text!r}")
    return node


def parse_update(text: str):
    """Parse one SPARQL Update request → InsertWhere | InsertData |
    DeleteWhere | DeleteData | GraphDDL."""
    p = _Parser(text)
    return _finish(p, p.parse_update())


def parse_query(text: str):
    """Parse one SPARQL read query → SelectQuery | AskQuery."""
    p = _Parser(text)
    return _finish(p, p.parse_query())
