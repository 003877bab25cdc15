"""a2m2aln converter behavior (reference: pydca/extras/a2m2aln.pl)."""

import io

import pytest

from pydca_tpu.extras import convert_a2m, run_a2m2aln

A2M = """junk line before first record
>RASH_HUMAN/5-165 the query
MTeY.KLvvVG-A
>other/1-10
MSdF.NIaaIG-C
>short_one
MT
>another
MAnL.RSggLG-D
"""


def test_convert_selects_uppercase_query_columns():
    res = convert_a2m(io.StringIO(A2M), r"^RASH_HUMAN/(\d+)", quiet=True)
    # query uppercase columns of 'MTeY.KLvvVG-A': M T Y K L V G A
    assert res.query_start == 5
    assert res.records[0] == (".RASH_HUMAN/5-165 the query", "MTYKLVGA")
    ids = [i for i, _ in res.records]
    assert ids == [
        ".RASH_HUMAN/5-165 the query",
        ".other/1-10",
        ".another",
    ]
    assert res.records[1][1] == "MSFNIIGC"
    assert res.skipped == ["short_one"]


def test_query_first_match_wins_and_moves_first():
    text = ">b\nAC-G\n>a match\naCGG\n>a match2\nACGG\n"
    res = convert_a2m(io.StringIO(text), r"^a ", quiet=True)
    # query 'a match' (lowercase a excluded): columns 1,2,3 -> 'CGG'
    assert res.records[0] == (".a match", "CGG")
    assert [i for i, _ in res.records] == [".a match", ".b", ".a match2"]
    assert res.query_start is None


def test_no_match_raises():
    with pytest.raises(ValueError):
        convert_a2m(io.StringIO(">x\nAC\n"), "nomatch")


def test_cli_roundtrip():
    out = io.StringIO()
    rc = run_a2m2aln(
        ["--query", "^RASH_HUMAN", "--quiet"],
        stdin=io.StringIO(A2M),
        stdout=out,
    )
    assert rc == 0
    lines = out.getvalue().splitlines()
    assert lines[0] == ">.RASH_HUMAN/5-165 the query"
    assert lines[1] == "MTYKLVGA"
