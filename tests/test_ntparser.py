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


# ---------------------------------------------------------------------------
# adversarial quarantine corpus (VERDICT r3 #6)
# ---------------------------------------------------------------------------

_CORPUS_PATH = __file__.rsplit("/", 1)[0] + "/fixtures/nt_quarantine_corpus.nt"


def _corpus_lines():
    with open(_CORPUS_PATH) as f:
        return [line.rstrip("\n") for line in f]


def _reference_partition():
    """Per-line verdict of the reference state machine: (accepted
    triples multiset, rejected line list) over the pruned corpus."""
    good, bad = [], []
    for line in _corpus_lines():
        t = line.lstrip(" \t")
        if not t or t.startswith("#"):
            continue
        try:
            row = parse_nt_line(t)
        except NTParseError:
            bad.append(line)
            continue
        if row is not None:
            good.append(row)
    return good, bad


def test_quarantine_corpus_is_adversarial():
    """The checked-in corpus must keep exercising BOTH sides — seeded
    quote/escape/whitespace mutations (reference anchor:
    ntparser_test.go error cases + the fuzz/ntriples corpus)."""
    good, bad = _reference_partition()
    assert len(good) >= 100 and len(bad) >= 60, (len(good), len(bad))


def test_quarantine_partitions_exactly_like_reference(spark):
    """PERMISSIVE never drops a parseable line and never passes a
    rejected one: decode_lines_quarantine's (good, bad) split over the
    adversarial corpus equals the reference state machine's per-line
    verdicts, line for line."""
    from triplestore_spark.sources.ntriples import decode_lines_quarantine

    lines = spark.createDataFrame(
        [(line, "corpus.nt") for line in _corpus_lines()], "value string, src string"
    )
    good_df, bad_df = decode_lines_quarantine(lines, file_col="src")
    ref_good, ref_bad = _reference_partition()

    got_good = sorted(
        tuple(r) for r in good_df.select(
            "subject", "subject_is_bnode", "predicate", "object_kind",
            "object_value", "object_type", "object_lang",
        ).collect()
    )
    assert got_good == sorted(ref_good)

    bad_rows = bad_df.collect()
    assert sorted(r["line"] for r in bad_rows) == sorted(ref_bad)
    assert all(r["error"] for r in bad_rows)
    assert all(r["source_file"] == "corpus.nt" for r in bad_rows)


def test_quarantine_permissive_decode_agrees(spark):
    """decode_lines_df(PERMISSIVE) — the vectorized path with state-
    machine fallback — must keep exactly the quarantine's good set."""
    from triplestore_spark.sources.ntriples import decode_lines_df

    lines = spark.createDataFrame(
        [(line,) for line in _corpus_lines()], "value string"
    )
    got = sorted(
        tuple(r) for r in decode_lines_df(lines, mode="PERMISSIVE").select(
            "subject", "subject_is_bnode", "predicate", "object_kind",
            "object_value", "object_type", "object_lang",
        ).collect()
    )
    ref_good, _ = _reference_partition()
    assert got == sorted(ref_good)


def test_quarantine_failfast_names_offender(spark):
    """FAILFAST over the corpus must surface the offending line text
    AND its source file in the error (decode.go:258-279 wrapping)."""
    from triplestore_spark.sources.ntriples import decode_lines_df

    lines = spark.createDataFrame(
        [(line, "adversarial_corpus.nt") for line in _corpus_lines()],
        "value string, src string",
    )
    with pytest.raises(Exception) as exc:
        decode_lines_df(lines, mode="FAILFAST", file_col="src").collect()
    msg = str(exc.value)
    assert "in line" in msg and "adversarial_corpus.nt" in msg
