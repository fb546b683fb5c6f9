"""Planted-truth verification of the SimHash family (VERDICT r2 #1a).

An INDEPENDENT pure-Python XXH64 (public-domain algorithm, the spec
xxhash.com publishes; Spark's xxhash64 is XXH64 with seed 42 over the
UTF-8 bytes) reimplements the whole fingerprint pipeline outside
Spark. That gives the rows-only simhash operators real oracles:

- the 64-bit fingerprints themselves are compared doc-by-doc against
  the reference implementation (differential test, sf0.001 corpus);
- documents are PLANTED at known token-edit distances and the Hamming
  distances Spark reports must equal the reference's XOR popcounts,
  with every planted pair inside the max_hamming=3 ball present in
  simhash_near_pairs' output (the 4x16-bit pigeonhole-band recall
  guarantee, operators/dedup.py).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from triplestore_spark.operators import dedup as DD

# ---------------------------------------------------------------------------
# pure-Python XXH64 (reference implementation of the public algorithm)
# ---------------------------------------------------------------------------

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of `data` with Spark's seed (42). Returns the SIGNED
    64-bit value Spark's xxhash64 column yields."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def simhash_ref(text: str) -> int:
    """Reference SimHash: mirror of operators/dedup.simhash_fingerprints
    semantics (split-on-space tokens, DISTINCT set, +-1 votes per bit of
    xxhash64(token)) built on the independent XXH64 above."""
    tokens = set(text.split(" ")) if text else {""}
    if not tokens:
        tokens = {""}
    sums = [0] * 64
    for t in tokens:
        h = xxh64(t.encode("utf-8")) & _M
        for b in range(64):
            sums[b] += 1 if (h >> b) & 1 else -1
    fp = 0
    for b in range(64):
        if sums[b] > 0:
            fp |= 1 << b
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & _M).count("1")


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_xxh64_matches_spark(spark):
    """The reference XXH64 must agree with Spark's xxhash64 across
    length classes (0, <4, <8, <32, >=32 bytes, multi-block)."""
    samples = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "the quick brown fox", "x" * 31, "x" * 32, "x" * 33, "y" * 100,
        "tok1", "naïve-ütf8-ß", "多字节",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in samples:
        assert got[s] == xxh64(s.encode("utf-8")), s


def test_fingerprints_match_reference(spark, sf_dir):
    """Differential: Spark fingerprints == pure-Python reference on the
    whole sf0.001 documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: r["simhash"]
        for r in DD.simhash_fingerprints(docs).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got.keys() == texts.keys()
    for doc_id, text in texts.items():
        assert got[doc_id] == simhash_ref(text), doc_id


def test_planted_hamming_ball(spark, sf_dir):
    """Plant variants of real docs at small token-edit distances; the
    (doc_a, doc_b, hamming) rows Spark emits for the planted pairs must
    equal the reference XOR-popcount, and every planted pair within the
    Hamming ball must be PRESENT (pigeonhole-band recall)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_rows = docs.orderBy("doc_id").limit(6).collect()

    planted = []
    expected = {}  # (doc_a, doc_b) -> reference hamming
    next_id = 10_000_000
    for j, r in enumerate(base_rows):
        text = r["text"]
        # j+1 appended distinct rare tokens => small (but nonzero-ish)
        # bit flips; exact copy for j == 0
        extra = " ".join(f"zzplanted{j}tok{t}" for t in range(j))
        variant = (text + " " + extra).strip() if extra else text
        planted.append((next_id, variant))
        expected[(r["doc_id"], next_id)] = _hamming(
            simhash_ref(text) & _M, simhash_ref(variant) & _M
        )
        next_id += 1

    aug = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame(planted, "doc_id long, text string")
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in DD.simhash_near_pairs(aug, max_hamming=63).collect()
    }
    in_ball = {p: h for p, h in expected.items() if h <= 3}
    assert in_ball, "no planted pair landed inside the Hamming ball"
    for pair, h in in_ball.items():
        # pairs at distance <= 3 are GUARANTEED recalled by the 4x16
        # bands; their reported distance must match the reference
        assert pair in got, (pair, h)
        assert got[pair] == h, pair
    # any planted pair the banded join did surface must agree too
    for pair, h in expected.items():
        if pair in got:
            assert got[pair] == h, pair


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.01/documents.parquet"),
    reason="sf0.01 testdata not present",
)
def test_ham0_invariant_and_collisions_are_real(spark):
    """simhash_ham0_verified's contract: every identical-token-set
    pair MUST be recalled at Hamming 0 (theorem: the fingerprint is a
    pure function of the token set). The converse does NOT hold in
    general — near-identical distinct sets can legitimately collide
    (sf0.1 has ~400 such pairs) — so every ham0 pair with UNEQUAL
    token sets is cross-checked against the independent pure-Python
    reference: its true XOR-popcount must actually be 0."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    ham0 = {
        (r["doc_a"], r["doc_b"])
        for r in DD.simhash_near_pairs(docs, max_hamming=0)
        .select("doc_a", "doc_b")
        .collect()
    }
    rows = docs.select("doc_id", "text").collect()
    toks = {r["doc_id"]: frozenset(r["text"].split(" ")) for r in rows}
    texts = {r["doc_id"]: r["text"] for r in rows}
    same_set = {
        (a, b)
        for a in toks
        for b in toks
        if a < b and toks[a] == toks[b]
    }
    assert same_set <= ham0  # the recall theorem, end to end
    for a, b in ham0 - same_set:
        # genuine collision: distinct sets, truly identical fingerprint
        assert simhash_ref(texts[a]) == simhash_ref(texts[b]), (a, b)
