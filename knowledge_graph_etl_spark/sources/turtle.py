"""Turtle source (SURVEY.md §2 op 3 — the reference reads RDF files with
rdflib ``Graph().parse()`` format-autodetect, sparql_update.py:124-133, so a
user loading an existing ``.ttl`` export must not hit a wall).

Spark shape: Turtle is NOT line-splittable (statements span lines via
``;``/``,`` continuations, ``[...]`` property lists, multi-line long
strings), so — exactly like Spark's own ``multiLine`` JSON reader — the
file is the unit of parallelism: ``spark.read.text(..., wholetext=True)``
yields one row per file and a pure-Python subset parser runs per file
inside ``mapInPandas`` (Arrow-batched; many files → many tasks). For
100 TB-scale RDF, shred to N-Triples (one triple per line, splittable —
``read_ntriples``) — this reader is for the reference's
config/bootstrap-file use case, not the bulk path.

Grammar subset (Turtle 1.1): ``@prefix``/``@base`` + SPARQL-style
``PREFIX``/``BASE`` directives, ``a``, ``;``/``,`` predicate/object lists,
``[...]`` anonymous blank nodes, ``_:label`` blank nodes, collections
``( ... )`` (rdf:first/rest/nil), quoted + long-quoted literals with
``@lang``/``^^datatype``, numeric (integer/decimal/double) and boolean
abbreviations, relative-IRI resolution against the base.

Blank-node labels are rewritten per file (``_:t<md5(file)[:8]>_<label>``)
so loading several Turtle files into one graph can never collide labels —
the same guarantee rdflib gives by minting fresh BNode ids per parse.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession

from ..plans.parser import BNodeT, IriT, LitT, Token, _unescape, tokenize
from ..terms import BNODE, IRI, LITERAL, QUAD_SCHEMA

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
_XSD = "http://www.w3.org/2001/XMLSchema#"


class _TurtleParser:
    """Recursive-descent Turtle-subset parser over the shared SPARQL
    tokenizer (plans/parser.py — the two grammars share IRIs, PNames,
    literals, and ``;``/``,``/``[]`` triples syntax)."""

    def __init__(self, text: str, bnode_scope: str = ""):
        self.toks: list[Token] = tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.scope = bnode_scope
        self._anon = 0
        self.triples: list[tuple] = []

    # -- token helpers ----------------------------------------------------

    def peek(self, k: int = 0) -> Token | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> Token:
        t = self.peek()
        if t is None:
            raise SyntaxError("unexpected end of Turtle input")
        self.i += 1
        return t

    def at_punct(self, ch: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "PUNCT" and t.text == ch

    def expect_punct(self, ch: str) -> None:
        t = self.next()
        if t.kind != "PUNCT" or t.text != ch:
            raise SyntaxError(f"expected {ch!r}, got {t.text!r} at {t.pos}")

    # -- terms ------------------------------------------------------------

    def _resolve_iri(self, raw: str) -> str:
        iri = raw[1:-1]
        if self.base and "://" not in iri and not iri.startswith("urn:"):
            return urljoin(self.base, iri)
        return iri

    def _resolve_pname(self, text: str) -> str:
        import re as _re

        ns, _, local = text.partition(":")
        if ns not in self.prefixes:
            raise SyntaxError(f"undefined prefix {ns!r}:")
        return self.prefixes[ns] + _re.sub(r"\\(.)", r"\1", local)

    def _bnode(self, label: str) -> BNodeT:
        # "u" namespaces user labels away from anonymous ones: without it,
        # an explicit `_:a1` and the first `[...]` node (fresh label a1)
        # would collide and silently merge two distinct RDF nodes
        return BNodeT(f"t{self.scope}_u{label}" if self.scope else f"u{label}")

    def _fresh_bnode(self) -> BNodeT:
        self._anon += 1
        label = f"a{self._anon}"
        return BNodeT(f"t{self.scope}_{label}" if self.scope else label)

    def parse_term(self, as_subject: bool = False):
        t = self.peek()
        if t is None:
            raise SyntaxError("unexpected end of input in term position")
        if t.kind == "IRIREF":
            self.next()
            return IriT(self._resolve_iri(t.text))
        if t.kind == "PNAME" and t.text.startswith("_:"):
            self.next()
            return self._bnode(t.text[2:])
        if t.kind in ("PNAME", "PNAME_NS"):
            self.next()
            return IriT(self._resolve_pname(t.text))
        if t.kind == "PUNCT" and t.text == "[":
            self.next()
            node = self._fresh_bnode()
            if not self.at_punct("]"):
                self.parse_predicate_object_list(node)
            self.expect_punct("]")
            return node
        if t.kind == "PUNCT" and t.text == "(":
            return self.parse_collection()
        if as_subject:
            raise SyntaxError(f"invalid subject {t.text!r} at {t.pos}")
        if t.kind in ("STRING", "LONGSTRING"):
            return self.parse_literal()
        if t.kind == "NUMBER":
            self.next()
            if "e" in t.text.lower():
                return LitT(t.text, _XSD + "double")
            if "." in t.text:
                return LitT(t.text, _XSD + "decimal")
            return LitT(t.text, _XSD + "integer")
        if t.kind == "NAME" and t.text in ("true", "false"):
            self.next()
            return LitT(t.text, _XSD + "boolean")
        raise SyntaxError(f"unexpected token {t.text!r} at {t.pos}")

    def parse_literal(self) -> LitT:
        t = self.next()
        raw = t.text[3:-3] if t.kind == "LONGSTRING" else t.text[1:-1]
        value = _unescape(raw)
        nxt = self.peek()
        if nxt is not None and nxt.kind == "DTYPE":
            self.next()
            dt_tok = self.next()
            if dt_tok.kind == "IRIREF":
                dt = self._resolve_iri(dt_tok.text)
            elif dt_tok.kind in ("PNAME", "PNAME_NS"):
                dt = self._resolve_pname(dt_tok.text)
            else:
                raise SyntaxError(f"expected datatype IRI at {dt_tok.pos}")
            # RDF 1.1: "..."^^xsd:string IS the plain string literal
            return LitT(value, None if dt == _XSD + "string" else dt)
        if nxt is not None and nxt.kind == "LANGTAG":
            self.next()
            return LitT(value, None, nxt.text[1:])
        return LitT(value)

    def parse_collection(self):
        """``( e1 e2 ... )`` → rdf:first/rest chain; ``()`` → rdf:nil."""
        self.expect_punct("(")
        if self.at_punct(")"):
            self.next()
            return IriT(RDF_NIL)
        head = self._fresh_bnode()
        node = head
        first = True
        while not self.at_punct(")"):
            if not first:
                nxt = self._fresh_bnode()
                self.emit(node, IriT(RDF_REST), nxt)
                node = nxt
            first = False
            self.emit(node, IriT(RDF_FIRST), self.parse_term())
        self.next()
        self.emit(node, IriT(RDF_REST), IriT(RDF_NIL))
        return head

    # -- statements -------------------------------------------------------

    def emit(self, s, p, o) -> None:
        if isinstance(s, IriT):
            s_val, s_type = s.value, IRI
        else:
            s_val, s_type = s.value, BNODE
        if isinstance(o, IriT):
            row = (s_val, s_type, p.value, o.value, IRI, None, None)
        elif isinstance(o, BNodeT):
            row = (s_val, s_type, p.value, o.value, BNODE, None, None)
        else:
            row = (s_val, s_type, p.value, o.value, LITERAL, o.datatype, o.lang)
        self.triples.append(row)

    def parse_verb(self) -> IriT:
        t = self.peek()
        if t is not None and t.kind == "NAME" and t.text == "a":
            self.next()
            return IriT(RDF_TYPE)
        t = self.next()
        if t.kind == "IRIREF":
            return IriT(self._resolve_iri(t.text))
        if t.kind in ("PNAME", "PNAME_NS"):
            return IriT(self._resolve_pname(t.text))
        raise SyntaxError(f"expected predicate, got {t.text!r} at {t.pos}")

    def parse_predicate_object_list(self, subj) -> None:
        while True:
            verb = self.parse_verb()
            while True:
                self.emit(subj, verb, self.parse_term())
                if self.at_punct(","):
                    self.next()
                    continue
                break
            if self.at_punct(";"):
                # consume any run of ';' (trailing semicolons are legal)
                while self.at_punct(";"):
                    self.next()
                if self.at_punct(".") or self.at_punct("]"):
                    return
                continue
            return

    def parse_directive(self) -> bool:
        t = self.peek()
        if t is None:
            return False
        # '@prefix' tokenizes as LANGTAG '@prefix'; '@base' as LANGTAG '@base'
        if t.kind == "LANGTAG" and t.text.lower() in ("@prefix", "@base"):
            self.next()
            if t.text.lower() == "@prefix":
                ns_tok = self.next()
                if ns_tok.kind not in ("PNAME_NS", "PNAME"):
                    raise SyntaxError(f"expected prefix name at {ns_tok.pos}")
                iri_tok = self.next()
                if iri_tok.kind != "IRIREF":
                    raise SyntaxError(f"expected IRI at {iri_tok.pos}")
                self.prefixes[ns_tok.text.rstrip(":")] = self._resolve_iri(iri_tok.text)
            else:
                iri_tok = self.next()
                self.base = self._resolve_iri(iri_tok.text)
            self.expect_punct(".")
            return True
        if t.kind == "NAME" and t.text.upper() in ("PREFIX", "BASE"):
            # SPARQL-style directive, no trailing dot (Turtle 1.1)
            self.next()
            if t.text.upper() == "PREFIX":
                ns_tok = self.next()
                iri_tok = self.next()
                self.prefixes[ns_tok.text.rstrip(":")] = self._resolve_iri(iri_tok.text)
            else:
                self.base = self._resolve_iri(self.next().text)
            return True
        return False

    def parse_document(self) -> list[tuple]:
        while self.peek() is not None:
            if self.parse_directive():
                continue
            subj = self.parse_term(as_subject=True)
            # a bare '[ ... ]' or collection subject may be a full statement
            # on its own ('[] .' form) — predicate list is optional then
            if not self.at_punct("."):
                self.parse_predicate_object_list(subj)
            self.expect_punct(".")
        return self.triples


def parse_turtle(text: str, bnode_scope: str = "") -> list[tuple]:
    """Parse one Turtle document → list of 7-tuples
    ``(s, s_type, p, o_value, o_type, o_datatype, o_lang)``."""
    return _TurtleParser(text, bnode_scope).parse_document()


def read_turtle(spark: SparkSession, path: str, graph: str) -> DataFrame:
    """Distributed-by-file Turtle reader into the quad schema for ``graph``
    (reference SparqlUpdateHook.insert_file, sparql_update.py:124-133)."""
    import pandas as pd
    from pyspark.sql import functions as F

    # one row per file; input_file_name drives deterministic bnode scoping
    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in QUAD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fname, text in zip(pdf["file"], pdf["value"]):
                scope = hashlib.md5(str(fname).encode()).hexdigest()[:8]
                for t in parse_turtle(text, bnode_scope=scope):
                    rows.append((graph, *t))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse_files, schema=QUAD_SCHEMA)


def read_rdf(
    spark: SparkSession, path: str, graph: str, fmt: str | None = None
) -> DataFrame:
    """Format-autodetecting RDF file source, mirroring the reference's
    rdflib ``Graph().parse()`` extension autodetect
    (sparql_update.py:124-133): ``.nt``/``.ntriples`` → the line-splittable
    N-Triples reader, ``.nq``/``.nquads`` → the N-Quads reader (graph
    term read in-band; ``graph`` becomes the default for graph-less
    lines), ``.ttl``/``.turtle`` → the per-file Turtle reader,
    ``.rdf``/``.owl``/``.xml`` → the per-file RDF/XML reader."""
    from .ntriples import read_ntriples
    from .rdfxml import read_rdfxml

    if fmt is None:
        low = path.lower().rstrip("/")
        if low.endswith((".ttl", ".turtle")):
            fmt = "turtle"
        elif low.endswith((".nt", ".ntriples")):
            fmt = "ntriples"
        elif low.endswith((".nq", ".nquads")):
            fmt = "nquads"
        elif low.endswith((".rdf", ".owl", ".xml")):
            fmt = "rdfxml"
        else:
            raise ValueError(
                f"cannot autodetect RDF format of {path!r}; "
                "pass fmt='turtle'|'ntriples'|'nquads'|'rdfxml'"
            )
    if fmt == "turtle":
        return read_turtle(spark, path, graph)
    if fmt == "ntriples":
        return read_ntriples(spark, path, graph)
    if fmt == "nquads":
        from .ntriples import read_nquads

        return read_nquads(spark, path, default_graph=graph)
    if fmt in ("rdfxml", "xml"):
        return read_rdfxml(spark, path, graph)
    raise ValueError(f"unsupported RDF format {fmt!r}")
