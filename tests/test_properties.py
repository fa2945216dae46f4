"""Property-based tests (hypothesis) for the pure task-parsing layer.

The placeholder normalizer rewrites SQL text; its invariants must hold
on arbitrary input, not just the shipped fixtures: quoted literals and
comments are never rewritten, output is deterministic, and argument
arity accounting matches the rewrites made.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from dungbeetle_spark.tasks import _coerce, bind_args, normalize_placeholders

_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)


@st.composite
def sql_with_placeholders(draw):
    """Assemble SQL-ish text from safe fragments, counting real
    placeholders as we insert them."""
    n_parts = draw(st.integers(1, 8))
    parts, dollar_max, qmarks = [], 0, 0
    for _ in range(n_parts):
        kind = draw(st.sampled_from(["word", "str", "dollar", "qmark", "quoted_ph"]))
        if kind == "word":
            parts.append(draw(_ident))
        elif kind == "str":
            parts.append("'" + draw(_ident) + "'")
        elif kind == "dollar":
            i = draw(st.integers(1, 4))
            dollar_max = max(dollar_max, i)
            parts.append(f"${i}")
        elif kind == "qmark":
            qmarks += 1
            parts.append("?")
        else:  # placeholder-looking text inside a string literal
            parts.append("'$1 ? not real'")
    return " ".join(parts), dollar_max, qmarks


@given(sql_with_placeholders())
@settings(max_examples=200, deadline=None)
def test_normalize_accounts_for_every_placeholder(case):
    sql, dollar_max, qmarks = case
    out, nargs = normalize_placeholders(sql)
    assert nargs == max(dollar_max, qmarks)
    # no unrewritten bare placeholders outside string literals
    no_strings = re.sub(r"'[^']*'", "''", out)
    assert "?" not in no_strings
    assert not re.search(r"\$\d", no_strings)
    # deterministic
    assert normalize_placeholders(sql) == (out, nargs)


@given(sql_with_placeholders())
@settings(max_examples=200, deadline=None)
def test_normalize_never_touches_string_literals(case):
    sql, _, _ = case
    out, _ = normalize_placeholders(sql)
    assert re.findall(r"'[^']*'", out) == re.findall(r"'[^']*'", sql)


@given(st.integers(-(10**12), 10**12))
def test_coerce_roundtrips_integers(i):
    assert _coerce(str(i)) == i


@given(st.text(alphabet="0123456789", min_size=2, max_size=8))
def test_coerce_leaves_noncanonical_numerals(s):
    padded = "0" + s  # leading zero → identifier-like, must stay text
    assert _coerce(padded) == padded


@given(st.lists(st.sampled_from(["7", "x", "2.5", "007", "-3"]), max_size=5))
def test_bind_args_positions(args):
    bound = bind_args(args)
    assert set(bound) == {f"p{i+1}" for i in range(len(args))}
