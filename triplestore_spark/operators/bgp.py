"""Basic graph pattern (BGP) matching and property paths over triples.

The reference's query surface stops at single-pattern point lookups
(source.go:203-220 — the six WithX indexes) plus the fixed-predicate
Tree walk (tree.go). A knowledge-graph builder immediately needs the
next rung: conjunctive patterns ("?doc kg:mentions ?e . ?doc
kg:source src:web") and predicate chains ("?doc kg:mentions/rdf:type
?t"), plus SPARQL-style OPTIONAL groups (left joins) and
FILTER-NOT-EXISTS negation (`anti=`, left-anti joins), with a small
NT-flavored string syntax (parse_bgp) as the front door. This module
adds all of it as pure-Catalyst compositions — each
pattern is a filtered scan of the canonical table (or a materialized
SPO/POS/OSP layout, where constant terms push down onto parquet
stats), and shared variables become hash joins Catalyst is free to
reorder, broadcast, or skew-split under AQE.

Variable bindings are NODE KEYS in the engine's canonical okey
rendering (reference rdf.go:102-113):

    subject var   -> '_:' + subject       (bnode)   | '<' + subject + '>'
    predicate var -> '<' + predicate + '>'
    object var    -> okey (literal / bnode / IRI rendering)

One uniform key space makes cross-position joins exact: an object
variable that binds '<e>' meets a subject variable binding '<e>' with
plain string equality, bnodes stay distinct from IRIs, and
lang-tagged literal identity keeps the reference's datatype-omission
rule for free. `strip_node_key` recovers the raw value.

Scale notes (the part the reference's in-memory maps never face):
- Constant terms are COMPONENT filters, so they reach the parquet
  scan as PushedFilters on a sorted layout (see test_plans).
- Join order seeds from the most-constant pattern and grows only
  through connected patterns; a disconnected BGP is a cartesian
  product and is REFUSED unless allow_product=True.
- No UDFs, no collect: the whole match is one declarative plan.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from triplestore_spark.dsl import Obj
from triplestore_spark.functions.keys import okey_expr
from triplestore_spark.operators.graph import RDFGraph, object_predicate
from triplestore_spark.schema import KIND_RESOURCE

Term = Union[str, Obj]
Pattern = tuple[Term, Term, Term]


def _is_var(t: Term) -> bool:
    return isinstance(t, str) and t.startswith("?")


def _var(t: Term) -> str:
    name = t[1:]
    if not name:
        raise ValueError("empty variable name '?'")
    return name


def _as_obj(t: Term) -> Obj:
    """A bare string in object position is an IRI constant — the same
    convenience the Tree edge view applies (resource objects)."""
    return t if isinstance(t, Obj) else Obj(KIND_RESOURCE, t)


def _subject_key() -> Column:
    return F.when(
        F.col("subject_is_bnode"), F.concat(F.lit("_:"), F.col("subject"))
    ).otherwise(F.concat(F.lit("<"), F.col("subject"), F.lit(">")))


def _object_key(df: DataFrame) -> Column:
    # reuse the stored identity column when the graph already carries it
    return F.col("okey") if "okey" in df.columns else okey_expr()


def strip_node_key(col: Column | str) -> Column:
    """Raw value of a node-key binding: '<iri>' -> iri, '_:b' -> b,
    literals keep their full okey (value+type/lang ARE the identity)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(
            c.startswith("<"), F.substring(c, 2, F.length(c) - 2)
        )
        .when(c.startswith("_:"), F.substring(c, 3, F.length(c) - 2))
        .otherwise(c)
    )


def parse_node_key(c: Column | str):
    """Exact inverse of the node-key rendering: one column of node
    keys -> (is_bnode_subjectable, kind, value, typ, lang) component
    expressions. The okey grammar makes this unambiguous with greedy
    anchored regexes: a datatype IRI cannot contain '>', a lang tag is
    [A-Za-z0-9-]+, and the GREEDY (.*) over the value means the
    terminal '"^^<type>' / '"@lang' is always the real suffix even
    when the value itself contains quotes, '@', or '^^<'."""
    c = F.col(c) if isinstance(c, str) else c
    typed = r'^"(.*)"\^\^<([^>]*)>$'
    langd = r'^"(.*)"@([A-Za-z0-9-]+)$'
    is_res = c.startswith("<")
    is_bnode = c.startswith("_:")
    is_typed = c.rlike(typed)
    is_lang = ~is_typed & c.rlike(langd)
    kind = (
        F.when(is_res, F.lit(KIND_RESOURCE))
        .when(is_bnode, F.lit("bnode"))
        .otherwise(F.lit("lit"))
    )
    value = (
        F.when(is_res, F.substring(c, 2, F.length(c) - 2))
        .when(is_bnode, F.substring(c, 3, F.length(c) - 2))
        .when(is_typed, F.regexp_extract(c, typed, 1))
        .otherwise(F.regexp_extract(c, langd, 1))
    )
    typ = F.when(is_typed, F.regexp_extract(c, typed, 2)).otherwise(F.lit(""))
    lang = F.when(is_lang, F.regexp_extract(c, langd, 2)).otherwise(F.lit(""))
    return is_bnode, kind, value, typ, lang


def bgp_construct(
    graph: RDFGraph | DataFrame,
    patterns: Sequence[Pattern] | str,
    template: Sequence[Pattern],
    **match_kwargs,
) -> DataFrame:
    """SPARQL-CONSTRUCT analog: match `patterns` (plus any
    optional/anti/distinct kwargs bgp_match takes), then instantiate
    each `template` triple once per binding row — the KG
    transformation primitive (derive kg:relatedTo edges from
    co-mentions, reshape extraction output, build views).

    Template terms: '?var' (subject/object take the variable's node
    key apart exactly — bnodes stay bnodes, typed/lang literals keep
    their components; predicate variables must hold IRIs), a constant
    IRI string, or an `Obj` constant in object position. Binding rows
    where a template slot is null (an unmatched OPTIONAL variable)
    drop that instantiation, per SPARQL. Returns deduped canonical
    component triples (keyed), union-ready for RDFGraph.add."""
    from triplestore_spark.operators.graph import dedup_triples

    bound = bgp_match(graph, patterns, distinct=False, **match_kwargs)
    outs = []
    for s, p, o in template:
        cols = {}
        if _is_var(s):
            key = F.col(_var(s))
            is_b, _, val, _, _ = parse_node_key(key)
            cols["subject"] = val
            cols["subject_is_bnode"] = is_b
            # literal bindings cannot be subjects — that instantiation
            # is skipped, per SPARQL CONSTRUCT
            guard = key.isNotNull() & (
                key.startswith("<") | key.startswith("_:")
            )
        else:
            cols["subject"] = F.lit(s)
            cols["subject_is_bnode"] = F.lit(False)
            guard = F.lit(True)
        if _is_var(p):
            pk = F.col(_var(p))
            cols["predicate"] = F.substring(pk, 2, F.length(pk) - 2)
            guard = guard & pk.isNotNull() & pk.startswith("<")
        else:
            cols["predicate"] = F.lit(p)
        if _is_var(o):
            ok = F.col(_var(o))
            _, kind, val, typ, lang = parse_node_key(ok)
            cols["object_kind"] = kind
            cols["object_value"] = val
            cols["object_type"] = typ
            cols["object_lang"] = lang
            guard = guard & ok.isNotNull()
        else:
            ob = _as_obj(o)
            cols["object_kind"] = F.lit(ob.kind)
            cols["object_value"] = F.lit(ob.value)
            cols["object_type"] = F.lit(ob.typ or "")
            cols["object_lang"] = F.lit(ob.lang or "")
        outs.append(
            bound.where(guard).select(
                cols["subject"].alias("subject"),
                cols["subject_is_bnode"].alias("subject_is_bnode"),
                cols["predicate"].alias("predicate"),
                cols["object_kind"].alias("object_kind"),
                cols["object_value"].alias("object_value"),
                cols["object_type"].alias("object_type"),
                cols["object_lang"].alias("object_lang"),
            )
        )
    out = outs[0]
    for extra in outs[1:]:
        out = out.unionByName(extra)
    # dedup_triples dedups on the component columns then (re)computes
    # the canonical keys post-shuffle
    return dedup_triples(out)


def _pattern_scan(df: DataFrame, pat: Pattern) -> tuple[DataFrame, list[str]]:
    """One pattern -> (bindings DataFrame, variable names).

    Constants become component filters (pushdown-friendly, like the
    WithX lookups in operators/graph.py); variables project node-key
    columns. A variable repeated inside one pattern adds the implied
    equality filter.
    """
    s, p, o = pat
    cond = F.lit(True)
    bindings: dict[str, Column] = {}
    if _is_var(s):
        bindings[_var(s)] = _subject_key()
    else:
        cond = cond & (F.col("subject") == s)
    if _is_var(p):
        v = _var(p)
        key = F.concat(F.lit("<"), F.col("predicate"), F.lit(">"))
        if v in bindings:
            cond = cond & (bindings[v] == key)
        else:
            bindings[v] = key
    else:
        cond = cond & (F.col("predicate") == p)
    if _is_var(o):
        v = _var(o)
        key = _object_key(df)
        if v in bindings:
            cond = cond & (bindings[v] == key)
        else:
            bindings[v] = key
    else:
        cond = cond & object_predicate(_as_obj(o))
    out = df.where(cond).select(
        *[expr.alias(name) for name, expr in bindings.items()]
    )
    return out, list(bindings)


def _layout_for(graph, default_df: DataFrame, pat: Pattern) -> DataFrame:
    """Best materialized layout for one pattern's constant positions
    (falls through to the graph's own frame for plain RDFGraphs /
    DataFrames): subject const -> SPO, else predicate const -> POS
    (predicate+object constants are BOTH on the POS sort prefix),
    else object const -> OSP."""
    from triplestore_spark.operators.materialize import MaterializedGraph

    if not isinstance(graph, MaterializedGraph):
        return default_df
    s, p, o = pat
    if not _is_var(s):
        return graph.layout("spo")
    if not _is_var(p):
        return graph.layout("pos")
    if not _is_var(o):
        return graph.layout("osp")
    return graph.layout("spo")


def bgp_match(
    graph: RDFGraph | DataFrame,
    patterns: Sequence[Pattern] | str,
    *,
    optional: Sequence[Sequence[Pattern] | str] | None = None,
    anti: Sequence[Sequence[Pattern] | str] | None = None,
    allow_product: bool = False,
    distinct: bool = True,
) -> DataFrame:
    """Match a conjunction of triple patterns; one column per variable
    (first-appearance order), values are canonical node keys.

    Each term is '?name' (variable), a plain string (subject/predicate
    IRI, or an IRI constant in object position), or an `Obj` constant;
    `patterns` (and each optional/anti group) may also be one
    parse_bgp string ('?d kg:mentions ?e . ?d kg:source src:web').
    `distinct=True` gives SPARQL's set semantics for the projected
    variables; False keeps one row per embedding.

    Join order: seed with the most-constant pattern, then repeatedly
    attach the most-constant pattern sharing >=1 bound variable. A
    pattern with no variables is an existence gate (empty scan ->
    empty result) applied as a broadcast of a single-row limit scan.
    Disconnected groups raise unless allow_product=True (an explicit
    cartesian is almost never what you want at scale).

    `optional` adds SPARQL-OPTIONAL groups: each group is itself a
    pattern list, matched as a BGP and LEFT-joined on the variables it
    shares with the required part — rows that fail the group keep
    their required bindings with nulls in the group's new variables.
    Only WELL-DESIGNED patterns are accepted (each group must share
    >=1 variable with the required BGP, and a group's new variables
    may not leak into other groups) — the shapes beyond that have
    order-dependent semantics and are refused rather than silently
    misevaluated. Each left join is a plain equi-join on already-bound
    keys, so AQE can still broadcast or skew-split it.

    `anti` adds negation (SPARQL FILTER NOT EXISTS): each group is
    matched as a BGP and required-side rows with ANY match on the
    shared variables are dropped (left-anti join — one shuffle-free
    broadcast when the group result is small, never a row explosion).
    Anti groups see the REQUIRED bindings only and bind no new output
    columns; evaluation order is required -> anti -> optional.

    Over a MaterializedGraph each pattern scans the LAYOUT whose sort
    prefix matches its constant positions (subject const -> SPO,
    else predicate const -> POS, else object const -> OSP — the
    reference's WithX index routing, source.go:130-164, applied per
    pattern), so every constant lands on parquet min/max stats of a
    copy sorted for it.
    """
    df = graph.df if isinstance(graph, RDFGraph) else graph
    if isinstance(patterns, str):
        patterns = parse_bgp(patterns)
    if optional is not None:
        optional = [
            parse_bgp(g) if isinstance(g, str) else g for g in optional
        ]
    if anti is not None:
        anti = [parse_bgp(g) if isinstance(g, str) else g for g in anti]
    if not patterns:
        raise ValueError("bgp_match: no patterns")

    scans: list[tuple[DataFrame, list[str], int]] = []
    for pat in patterns:
        if len(pat) != 3:
            raise ValueError(f"pattern must be (s, p, o): {pat!r}")
        scan, vars_ = _pattern_scan(_layout_for(graph, df, pat), pat)
        n_const = 3 - sum(_is_var(t) for t in pat)
        scans.append((scan, vars_, n_const))

    var_order: list[str] = []
    for pat in patterns:
        for t in pat:
            if _is_var(t) and _var(t) not in var_order:
                var_order.append(_var(t))

    # existence gates first: cheap limit-1 broadcast factors
    gates = [s for s in scans if not s[1]]
    rest = sorted(
        (s for s in scans if s[1]), key=lambda s: -s[2]
    )
    if not rest:
        raise ValueError("bgp_match: every pattern is constant-only")

    cur, bound = rest[0][0], set(rest[0][1])
    pending = rest[1:]
    while pending:
        pick = None
        for i, (scan, vars_, _) in enumerate(pending):
            if bound & set(vars_):
                pick = i
                break
        if pick is None:
            if not allow_product:
                raise ValueError(
                    "bgp_match: disconnected patterns would form a "
                    "cartesian product; pass allow_product=True to force"
                )
            pick = 0
        scan, vars_, _ = pending.pop(pick)
        shared = sorted(bound & set(vars_))
        cur = cur.join(scan, on=shared) if shared else cur.crossJoin(scan)
        bound |= set(vars_)

    for gate, _, _ in gates:
        cur = cur.join(
            F.broadcast(gate.limit(1).select(F.lit(1).alias("_g"))),
            how="inner",
        ).drop("_g")

    if anti:
        for gi, group in enumerate(anti):
            gdf = bgp_match(graph, group, distinct=False,
                            allow_product=allow_product)
            shared = sorted(set(bound) & set(gdf.columns))
            if not shared:
                raise ValueError(
                    f"bgp_match: anti group {gi} shares no variable "
                    "with the required patterns (not well-designed)"
                )
            cur = cur.join(gdf.select(*shared), on=shared,
                           how="left_anti")

    if optional:
        required_vars = set(bound)
        claimed: set[str] = set()
        for gi, group in enumerate(optional):
            gdf = bgp_match(graph, group, distinct=False,
                            allow_product=allow_product)
            gvars = set(gdf.columns)
            shared = sorted(required_vars & gvars)
            new = gvars - required_vars
            if not shared:
                raise ValueError(
                    f"bgp_match: optional group {gi} shares no variable "
                    "with the required patterns (not well-designed)"
                )
            leaked = new & claimed
            if leaked:
                raise ValueError(
                    f"bgp_match: optional group {gi} reuses variables "
                    f"{sorted(leaked)} from another optional group "
                    "(not well-designed)"
                )
            claimed |= new
            cur = cur.join(gdf, on=shared, how="left")
            for v in group:
                for t in v:
                    if _is_var(t) and _var(t) not in var_order:
                        var_order.append(_var(t))

    out = cur.select(*var_order)
    return out.distinct() if distinct else out


def _path_step_alternatives(step) -> list[str]:
    """Normalize one path step to its alternative list: 'p', '^p'
    (inverse), 'p1|p2|^p3' (alternation), or an explicit list."""
    if isinstance(step, str):
        alts = [a.strip() for a in step.split("|")]
    else:
        alts = [str(a).strip() for a in step]
    if not alts or any(not a or a == "^" for a in alts):
        raise ValueError(f"property_path: bad step {step!r}")
    for a in alts:
        if _is_var(a.lstrip("^")):
            raise ValueError("property_path: predicates must be constants")
    return alts


def property_path(
    graph: RDFGraph | DataFrame,
    path: Sequence[str | Sequence[str]],
    *,
    start: Term | None = None,
    end: Term | None = None,
    distinct: bool = True,
) -> DataFrame:
    """Fixed-length predicate chain p1/p2/.../pk -> (src, dst) node
    keys. Each step is a predicate IRI, an INVERSE step '^p' (walked
    object -> subject), or an ALTERNATION 'p1|p2' / ['p1', '^p2']
    (SPARQL alt semantics: union of the alternatives' hops). Hop
    variables stitch object-of-step-i to subject-of-step-i+1 — exact
    because both positions bind the same node-key space. `start`/`end`
    pin the endpoints (subject string / Obj or IRI string
    respectively).

    A single-alternative step compiles to one BGP pattern (constants
    push down onto the best layout, see bgp_match); an alternation
    step compiles to the UNION of its alternatives' one-pattern scans
    before the chain join, so the union runs before the shuffle and
    each branch still pushes its predicate filter down.

    For the transitive p+ walk from a constant root, use
    operators.tree.Tree(graph, p).descendants(root) — level-synchronous
    frontier joins. An unrooted all-pairs closure is deliberately not
    offered: it is quadratic in components at 100 TB.
    """
    if not path:
        raise ValueError("property_path: empty path")
    steps = [_path_step_alternatives(s) for s in path]
    terms: list[Term] = ["?src" if start is None else start]
    for i in range(len(steps) - 1):
        terms.append(f"?h{i}")
    terms.append("?dst" if end is None else end)

    cur: DataFrame | None = None
    bound: set[str] = set()
    for i, alts in enumerate(steps):
        src_t, dst_t = terms[i], terms[i + 1]
        frames = []
        for a in alts:
            if a.startswith("^"):
                pat: Pattern = (dst_t, a[1:], src_t)
            else:
                pat = (src_t, a, dst_t)
            frames.append(bgp_match(graph, [pat], distinct=False))
        step_df = frames[0]
        for f in frames[1:]:
            step_df = step_df.unionByName(f)
        if cur is None:
            cur, bound = step_df, set(step_df.columns)
        else:
            shared = sorted(bound & set(step_df.columns))
            if not shared:
                # both endpoints of this step pinned mid-chain cannot
                # happen (internal terms are always hop variables)
                raise AssertionError("disconnected path step")
            cur = cur.join(step_df, on=shared)
            bound |= set(step_df.columns)

    # distinct AFTER projecting away the internal hop vars — deduping
    # the full embedding first would keep one row per hop witness.
    # Pinned endpoints drop out of the projection by construction;
    # with both endpoints pinned the hop bindings are the witness rows.
    keep = [c for c in ("src", "dst") if c in bound]
    out = cur.select(*keep) if keep else cur
    return out.distinct() if distinct else out


def parse_bgp(text: str) -> list[Pattern]:
    """Parse a SPARQL-ish whitespace pattern string into the pattern
    list bgp_match takes — a convenience front-end, not a SPARQL
    parser (no PREFIX, no FILTER expressions, no grouping).

        parse_bgp('?d kg:mentions ?e . ?d kg:source src:web')

    Term syntax per position:
      ?name                         variable
      bare-token                    IRI (subject/predicate/object)
      "text"                        xsd:string literal (object only)
      "text"@lang                   lang-tagged literal
      "text"^^type                  typed literal
      _:label                       bnode (object only — subject
                                    bnodes are rows, not constants)
    Patterns separate on a standalone '.' token (NT style; a trailing
    dot is optional). Quoted text may contain spaces, dots, and
    escaped quotes (\\")."""
    import re

    # tokenize FIRST (a quoted literal is one token even when it
    # contains spaces, dots, or escaped quotes), THEN split the token
    # stream on standalone '.' separators
    token_re = re.compile(
        r'"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^\S+)?|\S+'
    )
    groups: list[list[str]] = [[]]
    for tok in token_re.findall(text):
        if tok == ".":
            if groups[-1]:
                groups.append([])
        else:
            groups[-1].append(tok)
    pats: list[Pattern] = []
    for toks in groups:
        if not toks:
            continue
        if len(toks) != 3:
            raise ValueError(
                f"parse_bgp: pattern needs 3 terms, got {toks!r}"
            )
        s, p, o = toks
        for t, pos in ((s, "subject"), (p, "predicate")):
            if t.startswith('"') or t.startswith("_:"):
                raise ValueError(
                    f"parse_bgp: {pos} constant must be an IRI or "
                    f"?var, got {t!r}"
                )
        pats.append((s, p, _parse_object_term(o)))
    return pats


def _parse_object_term(tok: str) -> Term:
    import re

    from triplestore_spark import schema as S

    if tok.startswith("?") or not (
        tok.startswith('"') or tok.startswith("_:")
    ):
        return tok  # variable or IRI string — bgp_match handles both
    if tok.startswith("_:"):
        return Obj(S.KIND_BNODE, tok[2:])
    m = re.fullmatch(
        r'"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^(\S+))?', tok
    )
    if not m:
        raise ValueError(f"parse_bgp: bad literal {tok!r}")
    value = m.group(1).replace('\\"', '"').replace("\\\\", "\\")
    if m.group(2):
        return Obj(S.KIND_LITERAL, value, "", m.group(2))
    return Obj(S.KIND_LITERAL, value, m.group(3) or S.XSD_STRING)


# ---------------------------------------------------------------- SQL

_OKEY_SQL = (
    "CASE WHEN {a}.object_kind = 'lit' THEN "
    "CASE WHEN {a}.object_lang <> '' THEN "
    "'\"' || {a}.object_value || '\"@' || {a}.object_lang "
    "ELSE '\"' || {a}.object_value || '\"^^<' || {a}.object_type || '>' END "
    "WHEN {a}.object_kind = 'bnode' THEN '_:' || {a}.object_value "
    "ELSE '<' || {a}.object_value || '>' END"
)
_SKEY_SQL = (
    "CASE WHEN {a}.subject_is_bnode THEN '_:' || {a}.subject "
    "ELSE '<' || {a}.subject || '>' END"
)
_PKEY_SQL = "'<' || {a}.predicate || '>'"


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bgp_match_sql(
    patterns: Sequence[Pattern] | str,
    table: str = "triples",
    *,
    optional: Sequence[Sequence[Pattern] | str] | None = None,
    anti: Sequence[Sequence[Pattern] | str] | None = None,
    distinct: bool = True,
) -> str:
    """ANSI-SQL equivalent of bgp_match over a component-column triple
    table — the independent oracle for differential tests (DuckDB runs
    it verbatim). Same node-key semantics, same join graph, expressed
    as self-joins instead of the DataFrame plan. `optional` groups
    become LEFT JOINs of the group's own BGP subquery on the shared
    variables and `anti` groups correlated NOT EXISTS predicates,
    mirroring bgp_match's well-designed-pattern semantics (the same
    validation errors are raised)."""
    if isinstance(patterns, str):
        patterns = parse_bgp(patterns)
    if optional is not None:
        optional = [
            parse_bgp(g) if isinstance(g, str) else g for g in optional
        ]
    if anti is not None:
        anti = [parse_bgp(g) if isinstance(g, str) else g for g in anti]
    if optional or anti:
        return _bgp_composite_sql(
            patterns, optional or [], anti or [],
            table=table, distinct=distinct,
        )
    if not patterns:
        raise ValueError("no patterns")
    var_order: list[str] = []
    wheres: list[str] = []
    exists: list[str] = []
    selects: dict[str, str] = {}
    aliases: list[str] = []
    for i, (s, p, o) in enumerate(patterns):
        a = f"t{i}"
        if not any(_is_var(t) for t in (s, p, o)):
            # existence gate — EXISTS keeps bag semantics identical to
            # the DataFrame version's broadcast limit-1 factor
            gate_wheres: list[str] = []
            ob = _as_obj(o)
            gate_wheres.append(f"{a}.subject = {_sql_str(s)}")
            gate_wheres.append(f"{a}.predicate = {_sql_str(p)}")
            gate_wheres.append(
                f"{a}.object_kind = {_sql_str(ob.kind)} AND "
                f"{a}.object_value = {_sql_str(ob.value)} AND "
                f"{a}.object_lang = {_sql_str(ob.lang or '')}"
            )
            if ob.kind == "lit" and not ob.lang:
                gate_wheres.append(f"{a}.object_type = {_sql_str(ob.typ)}")
            exists.append(
                "EXISTS (SELECT 1 FROM "
                + table
                + f" {a} WHERE "
                + " AND ".join(f"({w})" for w in gate_wheres)
                + ")"
            )
            continue
        aliases.append(a)
        for term, key_sql, const_sql in (
            (s, _SKEY_SQL, lambda t, a=a: f"{a}.subject = {_sql_str(t)}"),
            (p, _PKEY_SQL, lambda t, a=a: f"{a}.predicate = {_sql_str(t)}"),
            (o, _OKEY_SQL, None),
        ):
            if _is_var(term):
                v = _var(term)
                expr = key_sql.format(a=a)
                if v in selects:
                    wheres.append(f"{selects[v]} = {expr}")
                else:
                    selects[v] = expr
                    if v not in var_order:
                        var_order.append(v)
            elif const_sql is not None:
                wheres.append(const_sql(term))
            else:
                ob = _as_obj(o)
                wheres.append(
                    f"{a}.object_kind = {_sql_str(ob.kind)} AND "
                    f"{a}.object_value = {_sql_str(ob.value)} AND "
                    f"{a}.object_lang = {_sql_str(ob.lang or '')}"
                )
                if ob.kind == "lit" and not ob.lang:
                    wheres.append(f"{a}.object_type = {_sql_str(ob.typ)}")
    if not aliases:
        raise ValueError("every pattern is constant-only")
    kw = "DISTINCT " if distinct else ""
    cols = ", ".join(f"{selects[v]} AS {v}" for v in var_order)
    frm = ", ".join(f"{table} {a}" for a in aliases)
    conds = [f"({w})" for w in wheres] + exists
    where = " AND ".join(conds) if conds else "TRUE"
    return f"SELECT {kw}{cols} FROM {frm} WHERE {where}"


def _pattern_vars(patterns: Sequence[Pattern]) -> list[str]:
    """Variable names of a pattern list in first-appearance order."""
    out: list[str] = []
    for pat in patterns:
        for t in pat:
            if _is_var(t) and _var(t) not in out:
                out.append(_var(t))
    return out


def _bgp_composite_sql(
    patterns: Sequence[Pattern],
    optional: Sequence[Sequence[Pattern]],
    anti: Sequence[Sequence[Pattern]],
    *,
    table: str,
    distinct: bool,
) -> str:
    """Required BGP subquery, filtered by one correlated NOT EXISTS
    per anti group, LEFT-JOINed with one subquery per optional group
    on their shared variables — the relational twin of bgp_match's
    anti/optional path, with identical well-designedness checks so
    both compilers refuse the same inputs. (The WHERE runs on
    required-side columns only, so filtering after the left joins is
    equivalent to bgp_match's required -> anti -> optional order.)"""
    req_vars = _pattern_vars(patterns)
    req_sql = bgp_match_sql(patterns, table, distinct=False)
    var_order = list(req_vars)
    claimed: set[str] = set()
    joins: list[str] = []
    not_exists: list[str] = []
    for gi, group in enumerate(anti):
        gvars = _pattern_vars(group)
        shared = sorted(set(req_vars) & set(gvars))
        if not shared:
            raise ValueError(
                f"bgp_match: anti group {gi} shares no variable "
                "with the required patterns (not well-designed)"
            )
        g_sql = bgp_match_sql(group, table, distinct=False)
        on = " AND ".join(f"a{gi}.{v} = req.{v}" for v in shared)
        not_exists.append(
            f"NOT EXISTS (SELECT 1 FROM ({g_sql}) a{gi} WHERE {on})"
        )
    for gi, group in enumerate(optional):
        gvars = _pattern_vars(group)
        shared = sorted(set(req_vars) & set(gvars))
        new = set(gvars) - set(req_vars)
        if not shared:
            raise ValueError(
                f"bgp_match: optional group {gi} shares no variable "
                "with the required patterns (not well-designed)"
            )
        leaked = new & claimed
        if leaked:
            raise ValueError(
                f"bgp_match: optional group {gi} reuses variables "
                f"{sorted(leaked)} from another optional group "
                "(not well-designed)"
            )
        claimed |= new
        g_sql = bgp_match_sql(group, table, distinct=False)
        on = " AND ".join(f"req.{v} = g{gi}.{v}" for v in shared)
        joins.append(f"LEFT JOIN ({g_sql}) g{gi} ON {on}")
        for v in gvars:
            if v not in var_order:
                var_order.append(v)

    def src(v: str) -> str:
        if v in req_vars:
            return f"req.{v}"
        for gi, group in enumerate(optional):
            if v in _pattern_vars(group):
                return f"g{gi}.{v}"
        raise AssertionError(v)

    kw = "DISTINCT " if distinct else ""
    cols = ", ".join(f"{src(v)} AS {v}" for v in var_order)
    sql = f"SELECT {kw}{cols} FROM ({req_sql}) req " + " ".join(joins)
    if not_exists:
        sql += " WHERE " + " AND ".join(not_exists)
    return sql
