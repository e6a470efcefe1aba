"""RDF/XML source — the last `insert_file` parity item (the reference's
rdflib ``Graph().parse()`` autodetects RDF/XML alongside Turtle/NT,
reference sparql_update.py:124-133; ``.rdf``/``.owl`` exports are the
classic ontology interchange format).

Spark shape: like Turtle, RDF/XML is not line-splittable, so the FILE is
the unit of parallelism — one row per file via ``wholetext`` read, a
stdlib-``ElementTree`` subset parser per file inside an Arrow-batched
``mapInPandas``. For bulk 100 TB RDF, shred to N-Triples (splittable);
this reader is for config/bootstrap/ontology files.

Syntax subset (RDF/XML 1.1 core):

* ``rdf:RDF`` root or a bare node element
* node elements: ``rdf:Description`` and typed nodes (→ ``rdf:type``),
  subjects via ``rdf:about`` / ``rdf:ID`` (→ ``base#id``) /
  ``rdf:nodeID`` / fresh blank node
* property attributes on node elements (incl. ``rdf:type``)
* property elements: text literals with ``rdf:datatype`` / inherited
  ``xml:lang``; ``rdf:resource`` / ``rdf:nodeID`` objects; nested node
  elements; ``rdf:parseType="Resource"`` (anonymous node),
  ``="Collection"`` (rdf:first/rest chain), ``="Literal"``
  (rdf:XMLLiteral); ``rdf:li`` → ``rdf:_1, _2, ...``
* ``xml:base`` scoping and relative-IRI resolution

Blank-node labels are scoped per file (same guarantee as the Turtle
reader): loading many files into one graph never collides labels.
"""

from __future__ import annotations

import hashlib
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession

from ..terms import BNODE, IRI, LITERAL, QUAD_SCHEMA

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"
XML_LITERAL = RDF_NS + "XMLLiteral"
_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

_RDF = lambda local: "{" + RDF_NS + "}" + local
_SYNTAX_ATTRS = {
    _RDF("about"),
    _RDF("ID"),
    _RDF("nodeID"),
    _RDF("resource"),
    _RDF("datatype"),
    _RDF("parseType"),
    _RDF("li"),
}
_XML_ATTRS = ("{" + XML_NS + "}base", "{" + XML_NS + "}lang")


def _tag_iri(tag: str) -> str:
    if not tag.startswith("{"):
        raise SyntaxError(f"unnamespaced element <{tag}> in RDF/XML")
    ns, local = tag[1:].split("}", 1)
    return ns + local


class _RdfXmlParser:
    def __init__(self, bnode_scope: str = ""):
        self.scope = bnode_scope
        self._anon = 0
        self.triples: list[tuple] = []

    # -- helpers ----------------------------------------------------------

    def _fresh_bnode(self) -> tuple[str, str]:
        self._anon += 1
        label = f"a{self._anon}"
        return (f"x{self.scope}_{label}" if self.scope else label), BNODE

    def _labeled_bnode(self, label: str) -> tuple[str, str]:
        # "u" namespaces user labels away from anonymous ones (same scheme
        # as the Turtle reader)
        return (f"x{self.scope}_u{label}" if self.scope else f"u{label}"), BNODE

    def _resolve(self, iri: str, base: str) -> str:
        if base and "://" not in iri and not iri.startswith("urn:"):
            return urljoin(base, iri)
        return iri

    def emit(self, s, p: str, o_value: str, o_type: str, dt=None, lang=None):
        self.triples.append((s[0], s[1], p, o_value, o_type, dt, lang))

    @staticmethod
    def _scoped(el: ET.Element, base: str, lang: str | None):
        b = el.get(_XML_ATTRS[0])
        if b is not None:
            base = b
        l = el.get(_XML_ATTRS[1])
        if l is not None:
            lang = l or None
        return base, lang

    # -- node elements ----------------------------------------------------

    def node_element(self, el: ET.Element, base: str, lang: str | None):
        """Parse one node element → its subject term (value, type)."""
        base, lang = self._scoped(el, base, lang)
        about = el.get(_RDF("about"))
        rid = el.get(_RDF("ID"))
        node_id = el.get(_RDF("nodeID"))
        if about is not None:
            subj = (self._resolve(about, base), IRI)
        elif rid is not None:
            subj = (self._resolve("#" + rid, base), IRI)
        elif node_id is not None:
            subj = self._labeled_bnode(node_id)
        else:
            subj = self._fresh_bnode()
        tag = _tag_iri(el.tag)
        if tag != RDF_NS + "Description":
            self.emit(subj, RDF_NS + "type", tag, IRI)
        # property attributes (non-syntax, non-xml) are string literals;
        # rdf:type as an attribute takes an IRI object
        for attr, val in el.attrib.items():
            if attr in _SYNTAX_ATTRS or attr.startswith("{" + XML_NS + "}"):
                continue
            if not attr.startswith("{"):
                raise SyntaxError(f"unnamespaced attribute {attr!r} in RDF/XML")
            p = _tag_iri(attr)
            if p == RDF_NS + "type":
                self.emit(subj, p, self._resolve(val, base), IRI)
            else:
                self.emit(subj, p, val, LITERAL, None, lang)
        li_n = 0
        for child in el:
            li_n = self.property_element(subj, child, base, lang, li_n)
        return subj

    # -- property elements ------------------------------------------------

    def property_element(
        self, subj, el: ET.Element, base: str, lang: str | None, li_n: int
    ) -> int:
        base, lang = self._scoped(el, base, lang)
        tag = _tag_iri(el.tag)
        if tag == RDF_NS + "li":
            li_n += 1
            tag = f"{RDF_NS}_{li_n}"
        parse_type = el.get(_RDF("parseType"))
        resource = el.get(_RDF("resource"))
        node_id = el.get(_RDF("nodeID"))
        datatype = el.get(_RDF("datatype"))
        children = list(el)
        if parse_type == "Resource":
            node = self._fresh_bnode()
            self.emit(subj, tag, node[0], BNODE)
            inner_li = 0
            for child in children:
                inner_li = self.property_element(node, child, base, lang, inner_li)
            return li_n
        if parse_type == "Collection":
            prev = None
            for child in children:
                cell = self._fresh_bnode()
                if prev is None:
                    self.emit(subj, tag, cell[0], BNODE)
                else:
                    self.emit(prev, RDF_NS + "rest", cell[0], BNODE)
                obj = self.node_element(child, base, lang)
                self.emit(cell, RDF_NS + "first", obj[0], obj[1])
                prev = cell
            if prev is None:
                self.emit(subj, tag, RDF_NS + "nil", IRI)
            else:
                self.emit(prev, RDF_NS + "rest", RDF_NS + "nil", IRI)
            return li_n
        if parse_type == "Literal":
            xml_text = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in children
            )
            self.emit(subj, tag, xml_text, LITERAL, XML_LITERAL, None)
            return li_n
        if resource is not None:
            self.emit(subj, tag, self._resolve(resource, base), IRI)
            return li_n
        if node_id is not None:
            obj = self._labeled_bnode(node_id)
            self.emit(subj, tag, obj[0], BNODE)
            return li_n
        # property attributes on an otherwise-empty property element mint
        # an anonymous object node carrying them
        prop_attrs = [
            (a, v)
            for a, v in el.attrib.items()
            if a not in _SYNTAX_ATTRS and not a.startswith("{" + XML_NS + "}")
        ]
        if prop_attrs and not children and not (el.text or "").strip():
            node = self._fresh_bnode()
            self.emit(subj, tag, node[0], BNODE)
            for attr, val in prop_attrs:
                self.emit(node, _tag_iri(attr), val, LITERAL, None, lang)
            return li_n
        if children:
            if len(children) != 1:
                raise SyntaxError(
                    f"property element <{tag}> has {len(children)} node "
                    "children; exactly one expected"
                )
            obj = self.node_element(children[0], base, lang)
            self.emit(subj, tag, obj[0], obj[1])
            return li_n
        value = el.text or ""
        if datatype is not None:
            # RDF 1.1: ^^xsd:string IS the plain literal (same rule as the
            # Turtle/SPARQL readers)
            dt = None if datatype == _XSD_STRING else datatype
            self.emit(subj, tag, value, LITERAL, dt, None)
        else:
            self.emit(subj, tag, value, LITERAL, None, lang)
        return li_n

    # -- document ---------------------------------------------------------

    def parse(self, text: str) -> list[tuple]:
        root = ET.fromstring(text)
        base, lang = self._scoped(root, "", None)
        if _tag_iri(root.tag) == RDF_NS + "RDF":
            for child in root:
                self.node_element(child, base, lang)
        else:
            self.node_element(root, base, lang)
        return self.triples


def parse_rdfxml(text: str, bnode_scope: str = "") -> list[tuple]:
    """Parse one RDF/XML document → list of 7-tuples
    ``(s, s_type, p, o_value, o_type, o_datatype, o_lang)``."""
    return _RdfXmlParser(bnode_scope).parse(text)


def read_rdfxml(spark: SparkSession, path: str, graph: str) -> DataFrame:
    """Distributed-by-file RDF/XML reader into the quad schema for
    ``graph`` (reference SparqlUpdateHook.insert_file,
    sparql_update.py:124-133)."""
    import pandas as pd
    from pyspark.sql import functions as F

    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in QUAD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fname, text in zip(pdf["file"], pdf["value"]):
                scope = hashlib.md5(str(fname).encode()).hexdigest()[:8]
                for t in parse_rdfxml(text, bnode_scope=scope):
                    rows.append((graph, *t))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse_files, schema=QUAD_SCHEMA)
