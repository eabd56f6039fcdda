"""Tokenizer unit tests — per-production coverage like the reference's
grammar token tests (gEconpy/parser/grammar/tokens.py coverage in
tests/parser/grammar/)."""

import pytest

from geconpy_tpu.lang import GCNSyntaxError, tokenize
from geconpy_tpu.lang.lexer import TokenKind


def kinds(src):
    return [t.kind for t in tokenize(src)][:-1]  # drop EOF


def texts(src):
    return [t.text for t in tokenize(src)][:-1]


def test_all_single_char_tokens():
    src = "+ * / ^ = ~ : ; , ( ) { } [ ] @ ?"
    expected = [
        TokenKind.PLUS, TokenKind.STAR, TokenKind.SLASH, TokenKind.CARET,
        TokenKind.EQUALS, TokenKind.TILDE, TokenKind.COLON, TokenKind.SEMI,
        TokenKind.COMMA, TokenKind.LPAREN, TokenKind.RPAREN, TokenKind.LBRACE,
        TokenKind.RBRACE, TokenKind.LBRACKET, TokenKind.RBRACKET,
        TokenKind.AT, TokenKind.QUESTION,
    ]
    assert kinds(src) == expected


def test_arrow_vs_minus():
    assert kinds("a -> b") == [TokenKind.IDENT, TokenKind.ARROW, TokenKind.IDENT]


def test_minus_alone():
    assert kinds("a - b") == [TokenKind.IDENT, TokenKind.MINUS, TokenKind.IDENT]


def test_identifiers_with_underscores_and_digits():
    assert texts("alpha_1 _private K2") == ["alpha_1", "_private", "K2"]
    assert all(k is TokenKind.IDENT for k in kinds("alpha_1 _private K2"))


def test_number_forms():
    assert texts("1 1.5 .5 1e3 1E-3 2.5e+10") == \
        ["1", "1.5", ".5", "1e3", "1E-3", "2.5e+10"]
    assert all(k is TokenKind.NUMBER for k in kinds("1 1.5 .5 1e3"))


def test_number_does_not_eat_trailing_dot_operator_context():
    # "1.2.3" lexes as NUMBER(1.2) NUMBER(.3) — one dot per number
    assert texts("1.2.3") == ["1.2", ".3"]


def test_e_followed_by_identifier_is_not_exponent():
    # "2e" is NUMBER(2) IDENT(e); "2e+" without digit is NUMBER(2) IDENT(e) PLUS
    toks = texts("2e")
    assert toks == ["2", "e"]
    assert kinds("2e+x")[:3] == [TokenKind.NUMBER, TokenKind.IDENT, TokenKind.PLUS]


def test_comments_stripped_to_end_of_line():
    toks = tokenize("a # comment with symbols ; = { \nb")
    assert [t.text for t in toks[:-1]] == ["a", "b"]


def test_locations_line_and_column():
    toks = tokenize("ab cd\n  ef")
    ab, cd, ef = toks[0], toks[1], toks[2]
    assert (ab.loc.line, ab.loc.column) == (1, 0)
    assert (cd.loc.line, cd.loc.column) == (1, 3)
    assert (ef.loc.line, ef.loc.column) == (2, 2)
    assert ef.loc.source_line.strip() == "ef"


def test_bad_character_reports_location_and_code():
    with pytest.raises(GCNSyntaxError) as err:
        tokenize("ok\nok $")
    assert err.value.code == "E001"
    assert err.value.loc.line == 2


def test_double_star_power():
    assert kinds("x ** 2") == [TokenKind.IDENT, TokenKind.CARET, TokenKind.NUMBER]
    assert texts("x ** 2")[1] == "**"


def test_eof_token_present():
    toks = tokenize("")
    assert len(toks) == 1
    assert toks[0].kind is TokenKind.EOF


def test_crlf_and_tabs_ignored():
    toks = tokenize("a\t b\r\nc")
    assert [t.text for t in toks[:-1]] == ["a", "b", "c"]
