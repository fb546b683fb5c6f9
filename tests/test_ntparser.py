"""Lenient NT parser acceptance — mirrors reference ntparser_test.go."""

import pytest

from triplestore_spark.dsl import Obj, bnode_pred, subj_pred
from triplestore_spark.sources.ntriples import (
    NTParseError,
    parse_nt_line,
    parse_nt_text,
)


def keyset(rows):
    from triplestore_spark.dsl import Obj, Triple

    out = set()
    for sub, isb, pred, kind, val, typ, lang in rows:
        out.add(Triple(sub, pred, Obj(kind, val, typ, lang), isb).tkey())
    return out


# (input, [expected triples]) from reference ntparser_test.go:34-133
PARSE_CASES = [
    (
        '<sub> <pred> "quoting "anything".".',
        [subj_pred("sub", "pred").string_literal('quoting "anything".')],
    ),
    (
        "<sub> <pred> \"quoting 'anything'.\".",
        [subj_pred("sub", "pred").string_literal("quoting 'anything'.")],
    ),
    (
        '\t<sub>\t<pred> <lol> .\n<sub2> <pred2> "lol2" .',
        [
            subj_pred("sub", "pred").resource("lol"),
            subj_pred("sub2", "pred2").string_literal("lol2"),
        ],
    ),
    (
        '<sub> <pred> "2"^^<myinteger> .\n<sub2> <pred2> <lol2> .',
        [
            subj_pred("sub", "pred").object(Obj("lit", "2", "myinteger")),
            subj_pred("sub2", "pred2").resource("lol2"),
        ],
    ),
    (
        '<sub><pred> "2"^^<myinteger> .\n<sub2> <pred2> "lol2"@en.',
        [
            subj_pred("sub", "pred").object(Obj("lit", "2", "myinteger")),
            subj_pred("sub2", "pred2").string_literal_with_lang("lol2", "en"),
        ],
    ),
    ("_:sub<pred><obj>. # comment", [bnode_pred("sub", "pred").resource("obj")]),
    ("_:sub <pred><obj>. # comment", [bnode_pred("sub", "pred").resource("obj")]),
    (
        '<sub> <pred> "dquote:"" .\n',
        [subj_pred("sub", "pred").string_literal('dquote:"')],
    ),
    ("<sub><pred><obj>.\n", [subj_pred("sub", "pred").resource("obj")]),
    ("<sub> <pred> _:anon.\n", [subj_pred("sub", "pred").bnode("anon")]),
    ("<sub><pred>_:anon.\n", [subj_pred("sub", "pred").bnode("anon")]),
    ("<sub> <pred> _:anon.", [subj_pred("sub", "pred").bnode("anon")]),
    ('<sub> <pred> "é".\n', [subj_pred("sub", "pred").string_literal("é")]),
    ('<sub> <pred> "é".', [subj_pred("sub", "pred").string_literal("é")]),
    ('<sub> <pred> "\x1a".', [subj_pred("sub", "pred").string_literal("\x1a")]),
]


@pytest.mark.parametrize("text,expected", PARSE_CASES)
def test_parse_cases(text, expected):
    rows = parse_nt_text(text)
    assert len(rows) == len(expected)
    assert keyset(rows) == {t.tkey() for t in expected}


def test_multiline_empty_and_comment_lines():
    # reference ntparser_test.go:10-31
    text = '  # my triples\n\n# starting\n<sub><pred>"obj"@en .\n\n# ending\n\n'
    rows = parse_nt_text(text)
    assert len(rows) == 1
    expect = subj_pred("sub", "pred").string_literal_with_lang("obj", "en")
    assert keyset(rows) == {expect.tkey()}


def test_newline_escape_in_literal():
    # reference codec_test.go TestDecodeNTriples
    rows = parse_nt_text('<one><two>"three\\nfour\\n" .')
    assert rows[0][4] == "three\nfour\n"


def test_typed_string_literal_not_unescaped():
    # quirk: explicit ^^<xsd:string> keeps the escaped form verbatim
    rows = parse_nt_text('<s> <p> "a\\nb"^^<xsd:string> .')
    assert rows[0][4] == "a\\nb"


def test_invalid_lines():
    for bad in [
        "<s> <p> 1 .",  # bare number object (nt-syntax-bad-num)
        "just junk",
        "<s> nopred .",
    ]:
        with pytest.raises(NTParseError):
            parse_nt_line(bad)


def test_blank_and_comment_lines_skipped():
    assert parse_nt_line("   ") is None
    assert parse_nt_line("# comment") is None
