"""Basic graph pattern (BGP) matching and property paths over triples.

The reference's query surface stops at single-pattern point lookups
(source.go:203-220 — the six WithX indexes) plus the fixed-predicate
Tree walk (tree.go). A knowledge-graph builder immediately needs the
next rung: conjunctive patterns ("?doc kg:mentions ?e . ?doc
kg:source src:web") and predicate chains ("?doc kg:mentions/rdf:type
?t"). This module adds both as pure-Catalyst compositions — each
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


def bgp_match(
    graph: RDFGraph | DataFrame,
    patterns: Sequence[Pattern],
    *,
    allow_product: bool = False,
    distinct: bool = True,
) -> DataFrame:
    """Match a conjunction of triple patterns; one column per variable
    (first-appearance order), values are canonical node keys.

    Each term is '?name' (variable), a plain string (subject/predicate
    IRI, or an IRI constant in object position), or an `Obj` constant.
    `distinct=True` gives SPARQL's set semantics for the projected
    variables; False keeps one row per embedding.

    Join order: seed with the most-constant pattern, then repeatedly
    attach the most-constant pattern sharing >=1 bound variable. A
    pattern with no variables is an existence gate (empty scan ->
    empty result) applied as a broadcast of a single-row limit scan.
    Disconnected groups raise unless allow_product=True (an explicit
    cartesian is almost never what you want at scale).
    """
    df = graph.df if isinstance(graph, RDFGraph) else graph
    if not patterns:
        raise ValueError("bgp_match: no patterns")

    scans: list[tuple[DataFrame, list[str], int]] = []
    for pat in patterns:
        if len(pat) != 3:
            raise ValueError(f"pattern must be (s, p, o): {pat!r}")
        scan, vars_ = _pattern_scan(df, pat)
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

    out = cur.select(*var_order)
    return out.distinct() if distinct else out


def property_path(
    graph: RDFGraph | DataFrame,
    path: Sequence[str],
    *,
    start: Term | None = None,
    end: Term | None = None,
    distinct: bool = True,
) -> DataFrame:
    """Fixed-length predicate chain p1/p2/.../pk -> (src, dst) node
    keys. Just a BGP whose hop variables stitch object-of-step-i to
    subject-of-step-i+1 — exact because both positions bind the same
    node-key space. `start`/`end` pin the endpoints (subject string /
    Obj or IRI string respectively).

    For the transitive p+ walk from a constant root, use
    operators.tree.Tree(graph, p).descendants(root) — level-synchronous
    frontier joins. An unrooted all-pairs closure is deliberately not
    offered: it is quadratic in components at 100 TB.
    """
    if not path:
        raise ValueError("property_path: empty path")
    terms: list[Term] = ["?src" if start is None else start]
    pats: list[Pattern] = []
    for i, pred in enumerate(path):
        if _is_var(pred):
            raise ValueError("property_path: predicates must be constants")
        dst: Term = f"?h{i}" if i < len(path) - 1 else (
            "?dst" if end is None else end
        )
        pats.append((terms[-1], pred, dst))
        terms.append(dst)
    # distinct AFTER projecting away the internal hop vars — deduping
    # the full embedding first would keep one row per hop witness
    out = bgp_match(graph, pats, distinct=False)
    # pinned endpoints drop out of the projection by construction;
    # the remaining hop vars are internal — keep only src/dst (with
    # both endpoints pinned, the hop bindings are the witness rows)
    keep = [c for c in ("src", "dst") if c in out.columns]
    if keep:
        out = out.select(*keep)
    return out.distinct() if distinct else out


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
    patterns: Sequence[Pattern],
    table: str = "triples",
    *,
    distinct: bool = True,
) -> str:
    """ANSI-SQL equivalent of bgp_match over a component-column triple
    table — the independent oracle for differential tests (DuckDB runs
    it verbatim). Same node-key semantics, same join graph, expressed
    as self-joins instead of the DataFrame plan."""
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
