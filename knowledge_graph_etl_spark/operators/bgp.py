"""Basic-graph-pattern compilation: SPARQL WHERE semantics as DataFrame plans.

Implements SURVEY.md §2 ops 14-20 and 23 as composable combinators over the
quads table:

  * ``pattern`` — one triple-pattern scan with constant-term filters
    pushed to the parquet scan (op 14).
  * ``BGPBuilder`` — conjunction of patterns: star joins (shared subject,
    op 15), chain joins (object→subject, op 16), cross-graph value joins
    (op 17) all fall out of the same rule: inner-join on shared variables.
  * ``optional`` — SPARQL OPTIONAL = left outer join on shared variables,
    with the group compiled bottom-up as its own subplan first (op 18).
  * ``exists`` — semi-join constraint (op 19).
  * ``bind`` — extend bindings with computed term columns (op 20).

Variable-binding representation: a solution mapping is a DataFrame with one
column per variable holding the term VALUE, plus companion columns
``?v__type / ?v__dt / ?v__lang`` for variables that can bind non-plain
literals or IRIs (needed by construct templates and term-aware functions).
Join compatibility is tested on the value column — safe because bnode
labels (``_:...``) and IRIs never collide lexically within a load.

Scale notes: every pattern is a filtered scan of the same quads table;
constant g/p/o filters are pushed into the parquet reader (partition
pruning on ``g``, row-group skip on ``p``). Highly-selective
constant-object patterns produce tiny DataFrames — callers can hint
``broadcast=True`` to force a broadcast-hash join (SURVEY.md §4.2).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import TermExpr
from ..terms import LITERAL, Term, XSD_STRING


def _plain_literal_conds(value) -> list[Column]:
    """Full term equality for a constant plain literal: SPARQL matches
    ``"x"`` only against the plain/xsd:string literal, never ``"x"@nl`` or
    ``"x"^^dt`` (RDF 1.1 folds xsd:string into the plain form)."""
    return [
        F.col("o_value") == value,
        F.col("o_type") == LITERAL,
        F.col("o_datatype").isNull() | (F.col("o_datatype") == XSD_STRING),
        F.col("o_lang").isNull(),
    ]


def _object_conds(o) -> list[Column]:
    """Full-term equality conditions for a constant object term."""
    if isinstance(o, Term):
        if o.type == LITERAL and o.datatype is None and o.lang is None:
            return _plain_literal_conds(o.value)
        conds = [F.col("o_value") == o.value, F.col("o_type") == o.type]
        if o.datatype is not None:
            conds.append(
                (F.col("o_datatype") == o.datatype)
                if o.datatype != XSD_STRING
                else (
                    F.col("o_datatype").isNull()
                    | (F.col("o_datatype") == XSD_STRING)
                )
            )
        if o.lang is not None:
            conds.append(F.col("o_lang") == o.lang)
        if o.type == LITERAL and o.lang is None:
            conds.append(F.col("o_lang").isNull())
        return conds
    # plain string constant ≙ plain literal object
    return _plain_literal_conds(o)


@dataclass(frozen=True)
class Var:
    """A SPARQL variable. ``Var("o")`` ≙ ``?o``."""

    name: str


def _is_var(t) -> bool:
    return isinstance(t, Var)


def _companion(name: str, kind: str) -> str:
    return f"{name}__{kind}"


def _check_var_name(t) -> None:
    """'__' delimits companion columns; a user variable containing it would
    be invisible to the shared-variable join logic (silently producing a
    cross join) — reject loudly instead."""
    if _is_var(t) and "__" in t.name:
        raise ValueError(
            f"variable name {t.name!r} is reserved: '__' marks term-companion columns"
        )


def pattern(
    quads: DataFrame,
    s,
    p,
    o,
    keep_object_meta: bool = True,
    graph_var: str | None = None,
) -> DataFrame:
    """Compile one triple pattern into a filtered, projected scan.

    ``s``/``p``/``o`` are :class:`Var` or constants (:class:`Term`, or a
    plain str meaning an IRI for s/p and a plain literal for o — matching
    how the reference's queries write constants, e.g.
    sparql/ldap_mapping_school.sparql:20 ``?o source:businessCategory
    "School"``).

    ``graph_var`` (``GRAPH ?g { ... }``): export the quad's graph IRI as an
    ordinary variable column — every pattern in the block exports it, so
    the BGP's shared-variable equi-join enforces same-graph matching with
    no special-case join logic, and ``?g`` composes with BIND/FILTER/
    projection like any other variable.
    """
    for t in (s, p, o):
        _check_var_name(t)
    if graph_var is not None and any(
        _is_var(t) and t.name == graph_var for t in (s, p, o)
    ):
        raise ValueError(
            f"GRAPH variable ?{graph_var} cannot also appear as a pattern "
            "term inside its own block"
        )
    conds: list[Column] = []
    cols: list[Column] = []
    bound: dict[str, str] = {}  # var name -> role already exporting it
    if graph_var is not None:
        cols.append(F.col("g").alias(graph_var))
        cols.append(F.lit("iri").alias(_companion(graph_var, "type")))

    if not _is_var(s):
        sv = s.value if isinstance(s, Term) else s
        conds.append(F.col("s") == sv)
    else:
        bound[s.name] = "s"
        cols.append(F.col("s").alias(s.name))
        cols.append(F.col("s_type").alias(_companion(s.name, "type")))

    if not _is_var(p):
        pv = p.value if isinstance(p, Term) else p
        conds.append(F.col("p") == pv)
    elif p.name in bound:
        # ?x ?x ?o — the subject term must also be the predicate IRI
        conds.append((F.col("p") == F.col("s")) & (F.col("s_type") == "iri"))
    else:
        bound[p.name] = "p"
        cols.append(F.col("p").alias(p.name))

    if not _is_var(o):
        conds.extend(_object_conds(o))
    elif o.name in bound:
        # repeated variable within one pattern (?s <p> ?s self-loop):
        # full TERM equality as an in-pattern filter, single exported column
        if bound[o.name] == "s":
            conds.append(
                (F.col("o_value") == F.col("s"))
                & (F.col("o_type") == F.col("s_type"))
            )
        else:  # bound as predicate (an IRI)
            conds.append(
                (F.col("o_value") == F.col("p")) & (F.col("o_type") == "iri")
            )
    else:
        cols.append(F.col("o_value").alias(o.name))
        if keep_object_meta:
            cols.append(F.col("o_type").alias(_companion(o.name, "type")))
            cols.append(F.col("o_datatype").alias(_companion(o.name, "dt")))
            cols.append(F.col("o_lang").alias(_companion(o.name, "lang")))

    out = quads
    if conds:
        # ONE combined filter instead of a where-chain: k-1 fewer plan
        # nodes and py4j round-trips per pattern — the compile path is
        # driver-bound at volume (guide §5/§7.3; measured r13: the 16
        # mapping compiles spend ~42 s in py4j/JVM plan construction)
        allc = conds[0]
        for c in conds[1:]:
            allc = allc & c
        out = out.where(allc)
    if not cols:  # pattern with no variables: existence row
        return out.select(F.lit(1).alias("__match"))
    return out.select(*cols)


def star_scan(
    quads: DataFrame,
    subject: Var,
    patterns: list[tuple],
    keep_object_meta: bool = True,
    graph_var: str | None = None,
) -> DataFrame:
    """Property-table rewrite of a same-subject star (SURVEY.md §4.2's one
    genuinely custom optimization): N patterns sharing ``?subject`` with
    CONSTANT predicates compile to ONE predicate-filtered scan + ONE
    aggregation on ``s`` instead of N scans + N-1 self-joins.

    Per subject, each pattern's matching objects are collected
    (``collect_list(when(p = p_i, term))``, map-side partial) and then
    exploded sequentially — the cross product per subject is exactly the
    SPARQL join semantics, including multi-valued predicates. Constant
    objects become presence flags (no exported column), mirroring
    reference patterns like sparql/ldap_mapping_school.sparql:19-21.

    Scale: the star shape dominates the reference's mapping workload (up to
    4-pattern stars, sparql/tl_users_mapping.sparql:31-34); this turns its
    k shuffles into one, and the single shuffle key ``s`` is the store's
    clustering/bucketing key (see GraphStore.as_bucketed_table — over a
    bucketed table the aggregation is shuffle-free too).

    Returns the same solution-mapping shape as chained :func:`pattern`
    joins: value column per variable + ``__type/__dt/__lang`` companions.
    """
    if not _is_var(subject):
        raise ValueError("star_scan subject must be a Var")
    _check_var_name(subject)
    for _, o in patterns:
        _check_var_name(o)
    if graph_var is not None and (
        graph_var == subject.name
        or any(_is_var(o) and o.name == graph_var for _, o in patterns)
    ):
        raise ValueError(
            f"GRAPH variable ?{graph_var} cannot also appear as a pattern "
            "term inside its own block"
        )
    pvals = []
    for p, _ in patterns:
        if _is_var(p):
            raise ValueError("star_scan requires constant predicates")
        pvals.append(p.value if isinstance(p, Term) else p)
    var_names = [o.name for _, o in patterns if _is_var(o)]
    if len(var_names) != len(set(var_names)):
        raise ValueError("star_scan object variables must be distinct")

    scan = quads.where(F.col("p").isin(sorted(set(pvals))))
    aggs: list[Column] = []
    exploded: list[tuple[int, str]] = []
    for i, (pv, (_, o)) in enumerate(zip(pvals, patterns)):
        cond = F.col("p") == pv
        if _is_var(o):
            term = F.struct(
                F.col("o_value").alias("v"),
                F.col("o_type").alias("t"),
                F.col("o_datatype").alias("d"),
                F.col("o_lang").alias("l"),
            )
            aggs.append(F.collect_list(F.when(cond, term)).alias(f"__vals_{i}"))
            exploded.append((i, o.name))
        else:
            for oc in _object_conds(o):
                cond = cond & oc
            aggs.append(F.max(F.when(cond, F.lit(1))).alias(f"__has_{i}"))

    keys = [
        F.col("s").alias(subject.name),
        F.col("s_type").alias(_companion(subject.name, "type")),
    ]
    if graph_var is not None:
        # GRAPH ?g: the star groups per (graph, subject) — a subject whose
        # properties straddle graphs must not merge across them
        keys.append(F.col("g").alias(graph_var))
    df = scan.groupBy(*keys).agg(*aggs)
    # Post-agg shaping in a MINIMAL number of DataFrame ops (one combined
    # filter + one select per explode + one final projection) instead of
    # the 4-5 chained withColumn/drop/select/rename ops per variable the
    # first implementation used: plan construction is driver-side py4j
    # work, ~375 ms per star_scan call in the r13 compile profile, and
    # every chained op re-walks the growing plan in the JVM (guide
    # §5/§7.3). Output rows, column names AND column order are identical.
    fconds: list[Column] = []
    for i, (_, o) in enumerate(patterns):
        if _is_var(o):
            fconds.append(F.size(F.col(f"__vals_{i}")) > 0)
        else:
            fconds.append(F.col(f"__has_{i}").isNotNull())
    if fconds:
        allf = fconds[0]
        for c in fconds[1:]:
            allf = allf & c
        df = df.where(allf)
    # key/prefix columns of the final projection, in the original order
    head: list[Column] = [F.col(subject.name), F.col(_companion(subject.name, "type"))]
    if graph_var is not None:
        head.append(F.col(graph_var))
        head.append(F.lit("iri").alias(_companion(graph_var, "type")))
    # sequential explodes (one Generate per select — Spark allows a single
    # generator per projection; the per-subject cross product semantics
    # need them nested anyway); carry only still-needed __vals columns
    pending = [f"__vals_{i}" for i, _ in exploded]
    for n, (i, _vname) in enumerate(exploded):
        carry = [F.col(f"__e_{j}") for j, _ in exploded[:n]]
        rest = [F.col(v) for v in pending[n + 1 :]]
        df = df.select(
            *head,
            *carry,
            *rest,
            F.explode(F.col(f"__vals_{i}")).alias(f"__e_{i}"),
        )
        head = [F.col(c) for c in (
            [subject.name, _companion(subject.name, "type")]
            + ([graph_var, _companion(graph_var, "type")] if graph_var is not None else [])
        )]
    # one final projection: extract term fields for every exploded var,
    # appending each var's (value, type, dt, lang) in pattern order —
    # byte-identical schema to the chained-ops version
    tail: list[Column] = []
    for i, vname in exploded:
        e = F.col(f"__e_{i}")
        tail.append(e["v"].alias(vname))
        if keep_object_meta:
            tail += [
                e["t"].alias(_companion(vname, "type")),
                e["d"].alias(_companion(vname, "dt")),
                e["l"].alias(_companion(vname, "lang")),
            ]
    if exploded:
        df = df.select(*head, *tail)
    elif any(not _is_var(o) for _, o in patterns):
        # constants only: drop the __has flag columns in one projection
        df = df.select(*head)
    return df


def _shared_value_vars(left: DataFrame, right: DataFrame) -> list[str]:
    lv = {c for c in left.columns if "__" not in c}
    rv = {c for c in right.columns if "__" not in c}
    return sorted(lv & rv)


_COMPANION_KINDS = ("type", "dt", "lang")


def _term_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str,
    compat: frozenset = frozenset(),
    extra_cond_builder=None,
) -> DataFrame:
    """Join two solution mappings on shared variables with full TERM
    compatibility: besides value equality, any companion column
    (``__type/__dt/__lang``) present on BOTH sides must match null-safely —
    SPARQL unifies terms, not lexical values, so ``"5"^^xsd:integer`` must
    not join ``"5"`` (plain), and a literal object must not chain onto a
    subject. Companions present on only one side impose nothing (e.g. a
    subject-role var carries ``__type`` only; its dt/lang are vacuously
    NULL).

    All conditions are conjunctive equalities, so Catalyst still extracts
    hash-join keys — the plan shape is identical to the value-only join.
    The right side's shared columns are pre-renamed (no ambiguity) and the
    surviving copy is the left's (identical by the join condition)."""
    ren: dict[str, str] = {}
    for v in on:
        ren[v] = f"__r__{v}"
        for k in _COMPANION_KINDS:
            comp = _companion(v, k)
            if comp in right.columns and comp in left.columns:
                ren[comp] = f"__r__{comp}"
    # one batched rename (withColumnsRenamed) instead of a per-column
    # withColumnRenamed chain: each chained call is a py4j round-trip plus
    # a JVM plan re-walk — pure driver overhead on the compile path
    r2 = right.withColumnsRenamed(ren) if ren else right
    cond = None
    for v in on:
        c = F.col(v) == F.col(f"__r__{v}")
        for k in _COMPANION_KINDS:
            comp = _companion(v, k)
            if f"__r__{comp}" in r2.columns:
                c = c & F.col(comp).eqNullSafe(F.col(f"__r__{comp}"))
        if v in compat:
            # SPARQL compatible-merge for a var that may be UNBOUND on
            # either side (UNION branch that doesn't bind it, VALUES
            # UNDEF, OPTIONAL-then-pattern): an unbound side matches
            # anything and the bound side's term wins in the output.
            # NOTE: this disjunct removes the var from the equi-join key
            # set — correctness over plan shape, and only for vars
            # statically flagged maybe-unbound.
            c = F.col(v).isNull() | F.col(f"__r__{v}").isNull() | c
        cond = c if cond is None else (cond & c)
    if extra_cond_builder is not None:
        # SPARQL LeftJoin(A, P, C): the constraint is part of the JOIN
        # condition, evaluated over the merged scope (shared vars resolve
        # to the left copy; right-only vars keep their names). The builder
        # runs after the renames so it sees the real column namespace; a
        # NULL (error) condition fails the match, exactly the spec rule.
        cols = set(left.columns) | {
            c for c in r2.columns if not c.startswith("__r__")
        }
        extra = extra_cond_builder(cols)
        if extra is not None:
            cond = extra if cond is None else (cond & extra)
    out = left.join(r2, on=cond, how=how)
    if how in ("inner", "left") and compat:
        merged: dict[str, Column] = {}
        for v in compat:
            if v not in on:
                continue
            use_l = F.col(v).isNotNull()
            merged[v] = F.when(use_l, F.col(v)).otherwise(F.col(f"__r__{v}"))
            for k in _COMPANION_KINDS:
                comp = _companion(v, k)
                if f"__r__{comp}" in r2.columns:
                    merged[comp] = F.when(use_l, F.col(comp)).otherwise(
                        F.col(f"__r__{comp}")
                    )
        if merged:
            # batched withColumns: each merged expr reads only join-output
            # columns (left copy + renamed right copy), never another
            # merged result, so one batched call ≡ the chained loop
            out = out.withColumns(merged)
    return out.drop(*ren.values())


class BGPBuilder:
    """Accumulates a basic graph pattern into a single DataFrame plan.

    Usage::

        b = BGP(quads_in_scope)
        b.pattern(Var("o"), NS + "objectClass", "organization")
        b.pattern(Var("o"), NS + "o", Var("orid"))
        b.bind("org", uri(concat(lit(ORG_NS), md5(col("orid")))))
        df = b.df
    """

    def __init__(self, quads: DataFrame):
        self.quads = quads
        self.df: DataFrame | None = None
        # vars that may be NULL-as-unbound in self.df (bound only inside
        # an OPTIONAL, or by a UNION branch / VALUES row that skips them);
        # joins on these use compatible-merge semantics
        self.maybe_unbound: set = set()

    # -- conjunction -------------------------------------------------------

    def pattern(self, s, p, o, broadcast: bool = False) -> "BGPBuilder":
        scan = pattern(self.quads, s, p, o)
        return self.join_group(scan, broadcast=broadcast)

    def star(self, subject: Var, patterns: list[tuple], broadcast: bool = False) -> "BGPBuilder":
        """Join a same-subject star compiled via :func:`star_scan`
        (one scan + one shuffle instead of N patterns joined)."""
        return self.join_group(star_scan(self.quads, subject, patterns), broadcast=broadcast)

    def join_group(
        self,
        group: DataFrame,
        broadcast: bool = False,
        maybe_unbound: set | None = None,
    ) -> "BGPBuilder":
        """Inner-join another solution-mapping DataFrame on shared variables
        (ops 15/16/17 are all this one rule). ``maybe_unbound`` names the
        incoming group's vars that can be NULL-as-unbound (UNION branches
        that don't bind them, VALUES UNDEF); those — and vars already
        flagged on the accumulated side (OPTIONAL outputs) — join with
        SPARQL compatible-merge semantics instead of plain equality."""
        incoming = set(maybe_unbound or ())
        if self.df is None:
            self.df = group
            self.maybe_unbound |= incoming
            return self
        on = _shared_value_vars(self.df, group)
        # drop right-side duplicates that are NOT join-relevant (a shared
        # var's companions participate in the term-equality join instead)
        dup = [
            c
            for c in group.columns
            if c in self.df.columns
            and c not in on
            and not any(c == _companion(v, k) for v in on for k in _COMPANION_KINDS)
        ]
        group = group.drop(*dup)
        right = F.broadcast(group) if broadcast else group
        if on:
            compat = frozenset(
                v for v in on if v in self.maybe_unbound or v in incoming
            )
            self.df = _term_join(self.df, right, on, "inner", compat=compat)
            # a shared var stays maybe-unbound only if NEITHER side was
            # guaranteed to bind it; new right-side vars inherit their flag
            self.maybe_unbound = (
                (self.maybe_unbound - set(on))
                | {v for v in on if v in self.maybe_unbound and v in incoming}
                | (incoming - set(on))
            )
        else:
            self.df = self.df.crossJoin(right)
            self.maybe_unbound |= incoming
        return self

    # -- optional / exists ---------------------------------------------------

    def optional(self, group: DataFrame, extra_cond_builder=None) -> "BGPBuilder":
        """SPARQL OPTIONAL — left outer join; unbound vars flow as NULLs
        into BINDs and templates (op 18). ``group`` is compiled bottom-up
        by the caller (nested OPTIONALs = optional() on a DataFrame that
        itself was built with optional()). ``extra_cond_builder`` carries
        the group's lifted FILTER constraints into the join condition
        (LeftJoin(A, P, C) — see :func:`_term_join`)."""
        if self.df is None:
            raise ValueError("OPTIONAL requires a preceding required group")
        on = _shared_value_vars(self.df, group)
        dup = [
            c
            for c in group.columns
            if c in self.df.columns
            and c not in on
            and not any(c == _companion(v, k) for v in on for k in _COMPANION_KINDS)
        ]
        group = group.drop(*dup)
        if not on:
            raise ValueError("OPTIONAL group shares no variables with the outer group")
        self.df = _term_join(
            self.df, group, on, "left", extra_cond_builder=extra_cond_builder
        )
        self.maybe_unbound |= {
            c for c in group.columns if "__" not in c and c not in on
        }
        return self

    def exists(self, group: DataFrame) -> "BGPBuilder":
        """EXISTS-style constraint: pattern group that binds no new exported
        variables — semi-join (op 19; reference
        sparql/tl_companies_mapping_cp.sparql:28-35)."""
        if self.df is None:
            raise ValueError("EXISTS requires a preceding required group")
        on = _shared_value_vars(self.df, group)
        keep = on + [
            _companion(v, k)
            for v in on
            for k in _COMPANION_KINDS
            if _companion(v, k) in group.columns and _companion(v, k) in self.df.columns
        ]
        self.df = _term_join(
            self.df, group.select(*keep).dropDuplicates(keep), on, "left_semi"
        )
        return self

    def not_exists(self, group: DataFrame) -> "BGPBuilder":
        """FILTER NOT EXISTS — anti-join (absent from the reference workload,
        SURVEY.md §2.5, provided for completeness)."""
        if self.df is None:
            raise ValueError("NOT EXISTS requires a preceding required group")
        on = _shared_value_vars(self.df, group)
        keep = on + [
            _companion(v, k)
            for v in on
            for k in _COMPANION_KINDS
            if _companion(v, k) in group.columns and _companion(v, k) in self.df.columns
        ]
        self.df = _term_join(
            self.df, group.select(*keep).dropDuplicates(keep), on, "left_anti"
        )
        return self

    # -- extension -----------------------------------------------------------

    def bind(self, name: str, expr: Column | TermExpr) -> "BGPBuilder":
        """BIND(expr AS ?name) (op 20). A :class:`TermExpr` sets the
        companion term-metadata columns; a plain Column binds a plain
        literal value."""
        if self.df is None:
            raise ValueError("BIND requires a preceding group")
        _check_var_name(Var(name))
        if isinstance(expr, TermExpr):
            # one batched withColumns (vs 4 chained withColumn): the exprs
            # are independent, so semantics and column order are identical
            # — this is compile-path driver overhead (guide §5/§7.3)
            self.df = self.df.withColumns(
                {
                    name: expr.value,
                    _companion(name, "type"): expr.type,
                    _companion(name, "dt"): expr.datatype,
                    _companion(name, "lang"): expr.lang,
                }
            )
        else:
            self.df = self.df.withColumn(name, expr)
        return self

    def filter(self, cond: Column) -> "BGPBuilder":
        """FILTER(expr) — absent from the reference workload (§2.5) but part
        of the BGP algebra; provided for the front end."""
        if self.df is None:
            raise ValueError("FILTER requires a preceding group")
        self.df = self.df.where(cond)
        return self


def BGP(quads: DataFrame) -> BGPBuilder:
    return BGPBuilder(quads)
