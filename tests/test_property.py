"""Property tests — the analog of the reference's go-fuzz harnesses
(reference fuzz/{ntriples,binary}/main.go): arbitrary triples
round-trip through both codecs; arbitrary bytes never crash the
decoders (they either parse or raise the typed error)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from triplestore_spark.dsl import Obj, Triple
from triplestore_spark.sources.binary import (
    BinaryDecodeError,
    decode_binary_bytes,
    encode_triple_bytes,
)
from triplestore_spark.sources.ntriples import (
    NTParseError,
    encode_triple_py,
    parse_nt_line,
    parse_nt_text,
)

# NT-safe identifier text: the lenient grammar cannot round-trip every
# unicode string in IRIs (e.g. '>' inside an IRI is only parseable in
# some positions); the codec contract is over what the encoder emits
# for reasonable identifiers, matching the reference's fuzz corpus.
ident = st.text(
    alphabet=string.ascii_letters + string.digits + ":/#?&%+-_.~",
    min_size=0,
    max_size=40,
)
# literal values: any printable unicode incl. newlines (escaped by the
# codec); quotes excluded — the lenient parser deliberately accepts
# unescaped quotes, which makes *some* quote placements ambiguous by
# design (reference ntparser_test.go:40-49 documents the accepted
# quirk cases, not full generality)
lit_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters='"'
    ),
    max_size=60,
)
lang = st.text(alphabet=string.ascii_lowercase + "-", min_size=1, max_size=8)
typ = st.sampled_from(
    ["xsd:string", "xsd:integer", "xsd:boolean", "xsd:double", "myinteger"]
)


@st.composite
def triples(draw):
    sub = draw(ident)
    pred = draw(ident)
    is_bnode = draw(st.booleans())
    kind = draw(st.sampled_from(["res", "bnode", "lit"]))
    if kind == "res":
        obj = Obj("res", draw(ident))
    elif kind == "bnode":
        obj = Obj("bnode", draw(ident.filter(lambda s: " " not in s)))
    else:
        t = draw(typ)
        value = draw(lit_text)
        if t == "xsd:string" and draw(st.booleans()):
            obj = Obj("lit", value, t, draw(lang))
        else:
            if t != "xsd:string":
                # non-string lexical forms pass through the NT parser
                # verbatim (no unescape), so exclude raw newlines that
                # the line-oriented format cannot carry unescaped
                value = value.replace("\n", "").replace("\r", "").replace(
                    "\\", ""
                )
            obj = Obj("lit", value, t)
    return Triple(sub, pred, obj, is_bnode)


@given(triples())
@settings(max_examples=300, deadline=None)
def test_binary_roundtrip_property(t):
    rows = decode_binary_bytes(encode_triple_bytes(t.as_row()))
    assert len(rows) == 1
    sub, isb, pred, kind, val, ty, lg = rows[0]
    got = Triple(sub, pred, Obj(kind, val, ty, lg), isb)
    assert got.tkey() == t.tkey()


@given(triples())
@settings(max_examples=300, deadline=None)
def test_nt_roundtrip_property(t):
    line = encode_triple_py(t.as_row())
    rows = parse_nt_text(line)
    assert len(rows) == 1
    sub, isb, pred, kind, val, ty, lg = rows[0]
    got = Triple(sub, pred, Obj(kind, val, ty, lg), isb)
    assert got.tkey() == t.tkey()


@given(st.text(max_size=200))
@settings(max_examples=500, deadline=None)
def test_nt_parser_never_crashes(s):
    try:
        parse_nt_line(s)
    except NTParseError:
        pass  # typed rejection is the contract


@given(triples())
@settings(max_examples=300, deadline=None)
def test_fast_path_equals_state_machine(t):
    """The regex fast path must produce IDENTICAL rows to the state
    machine on every encoder-emitted line."""
    from triplestore_spark.sources.ntriples import parse_nt_line_fast

    line = encode_triple_py(t.as_row()).rstrip("\n")
    assert parse_nt_line_fast(line) == parse_nt_line(line)


@given(st.text(max_size=120))
@settings(max_examples=500, deadline=None)
def test_fast_path_equals_state_machine_arbitrary(s):
    """On arbitrary input: identical accept/reject AND identical rows."""
    from triplestore_spark.sources.ntriples import parse_nt_line_fast

    try:
        slow = ("ok", parse_nt_line(s))
    except NTParseError:
        slow = ("err", None)
    try:
        fast = ("ok", parse_nt_line_fast(s))
    except NTParseError:
        fast = ("err", None)
    assert fast == slow


@given(st.lists(triples(), max_size=10))
@settings(max_examples=200, deadline=None)
def test_vectorized_batch_equals_state_machine(ts):
    """The Arrow/RE2 batch path (pyarrow extract_regex + vectorized
    assembly, the executor hot path) must produce IDENTICAL rows to
    the state machine on every encoder-emitted line."""
    from triplestore_spark.sources.ntriples import parse_nt_batch

    lines = [encode_triple_py(t.as_row()).rstrip("\n") for t in ts]
    slow = [parse_nt_line(ln) for ln in lines]
    assert parse_nt_batch(lines) == slow


@given(st.lists(st.text(max_size=120), max_size=8))
@settings(max_examples=300, deadline=None)
def test_vectorized_batch_equals_state_machine_arbitrary(lines):
    """Arbitrary input: identical accept/reject AND identical rows
    (the batch path must fall back to the state machine on exactly
    the lines the conservative RE2 grammar rejects)."""
    from triplestore_spark.sources.ntriples import parse_nt_batch

    # pyarrow cannot carry lone surrogates; the Spark text source
    # never produces them either (invalid UTF-8 is replaced upstream)
    lines = [ln for ln in lines if not any("\ud800" <= c <= "\udfff" for c in ln)]
    slow, err = [], False
    try:
        for ln in lines:
            b = ln.split("\n")[0]  # batch path is line-oriented
            row = parse_nt_line(b.lstrip(" \t")) if b.lstrip(" \t") else None
            if row is not None:
                slow.append(row)
    except NTParseError:
        err = True
    one_line = [ln.split("\n")[0] for ln in lines]
    try:
        fast = ("ok", parse_nt_batch(one_line))
    except NTParseError:
        fast = ("err", None)
    assert fast == (("err", None) if err else ("ok", slow))


@given(st.binary(max_size=400))
@settings(max_examples=500, deadline=None)
def test_binary_decoder_never_crashes(b):
    try:
        decode_binary_bytes(b)
    except (BinaryDecodeError, UnicodeDecodeError):
        pass  # typed rejection is the contract
