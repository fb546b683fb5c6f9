"""Struct melt: wide rows / nested mappings -> triples.

The reference reflects over Go structs with `predicate`/`bnode` field
tags (reference struct.go:26-85): each tagged field becomes one
triple, slice fields fan out one triple per element, embedded structs
become a bnode link plus a recursive melt.

Two realizations:

- `triples_from_mapping`: driver-side dict -> list[Triple] (the exact
  struct.go analog, incl. nested-dict bnodes). The reference names
  unnamed embedded bnodes with rand.Uint32 (struct.go:61) —
  nondeterminism is unacceptable for resume at 10^12 scale, so we
  substitute a deterministic content hash (identity, not randomness,
  is the contract tested by struct_test.go:81-106, which only asserts
  count/shape for the random case).

- `melt_df`: distributed DataFrame melt — one `explode` of a
  per-row triple array (entry point C of SURVEY.md §3.3 generalized).
  Narrow, shuffle-free.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from triplestore_spark import schema as S
from triplestore_spark.dsl import Obj, Triple, bnode_pred, object_literal, subj_pred


def _det_bnode(parent_subject: str, field_path: str) -> str:
    """Deterministic bnode label (replaces reference struct.go:61
    rand.Uint32; divergence documented above)."""
    h = hashlib.blake2b(
        f"{parent_subject}\x00{field_path}".encode(), digest_size=4
    )
    return h.hexdigest()


def triples_from_mapping(
    sub: str, mapping: dict, is_bnode: bool = False
) -> list[Triple]:
    """dict of predicate -> value. Values: scalar -> literal triple;
    list -> one triple per element; dict -> bnode link + recursive
    melt; Obj -> used verbatim; None -> skipped (nil-pointer rule,
    struct.go:47-50)."""
    out: list[Triple] = []
    builder = bnode_pred if is_bnode else subj_pred
    for pred, value in mapping.items():
        if value is None:
            continue
        if isinstance(value, dict):
            label = value.get("@bnode") or _det_bnode(sub, pred)
            inner = {k: v for k, v in value.items() if k != "@bnode"}
            out.extend(triples_from_mapping(label, inner, is_bnode=True))
            out.append(builder(sub, pred).bnode(label))
        elif isinstance(value, (list, tuple)):
            for el in value:
                out.append(builder(sub, pred).object(object_literal(el)))
        elif isinstance(value, Obj):
            out.append(builder(sub, pred).object(value))
        else:
            out.append(builder(sub, pred).object(object_literal(value)))
    return out


class MeltField:
    """One melt rule: predicate + object expression."""

    def __init__(
        self,
        predicate: str,
        value: Column,
        kind: str = S.KIND_LITERAL,
        typ: str | Column = "",
        lang: str | Column = "",
        explode_array: bool = False,
    ):
        self.predicate = predicate
        self.value = value
        self.kind = kind
        self.typ = typ
        self.lang = lang
        self.explode_array = explode_array

    def resource(self) -> "MeltField":
        self.kind = S.KIND_RESOURCE
        return self


def melt_df(
    df: DataFrame, subject: Column, fields: Sequence[MeltField]
) -> DataFrame:
    """Wide DataFrame -> triple rows: one explode of a per-row array.

    Array-valued fields (explode_array=True) fan out one triple per
    element like the reference's slice rule (struct.go:71-80).
    """

    def mk(pred, kind, value, typ, lang):
        return F.struct(
            subject.cast("string").alias("subject"),
            F.lit(False).alias("subject_is_bnode"),
            F.lit(pred).alias("predicate"),
            F.lit(kind).alias("object_kind"),
            value.cast("string").alias("object_value"),
            (F.lit(typ) if isinstance(typ, str) else typ).alias("object_type"),
            (F.lit(lang) if isinstance(lang, str) else lang).alias("object_lang"),
        )

    scalar_structs = [
        mk(f.predicate, f.kind, f.value, f.typ, f.lang)
        for f in fields
        if not f.explode_array
    ]
    arrays = [
        F.transform(
            f.value, lambda el: mk(f.predicate, f.kind, el, f.typ, f.lang)
        )
        for f in fields
        if f.explode_array
    ]
    all_triples = F.array(*scalar_structs) if scalar_structs else F.array()
    for arr in arrays:
        all_triples = F.concat(all_triples, arr)
    return df.select(F.explode(all_triples).alias("t")).select("t.*")
