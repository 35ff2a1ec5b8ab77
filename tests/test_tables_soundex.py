"""Unit tests for the HTML table flattener and the Soundex function
added in round 5 (the query-level value-hash checks live in the driver
sim; these pin the parser/function semantics directly)."""

from document_ai_ray.functions.strings import soundex
from document_ai_ray.stages.html_meta import parse_tables


def test_parse_tables_basic_and_hostile():
    html = (
        "<html><body><nav>chrome</nav>"
        "<table class=x><tr><th>h0</th><th>h1</th></tr>\n"
        "<tr><td a=1> alpha\n</td><td><b>beta</b> gamma</td>"  # no </tr>
        "<tr><td>d&amp;e</td><td><table><tr><td>nested</td></tr></table>tail</td></tr>"
        "</table><p>between</p><table><tr><td> solo </td></tr></table></body></html>"
    )
    cells = parse_tables(html)
    assert cells == [
        (0, 0, 0, True, "h0"),
        (0, 0, 1, True, "h1"),
        (0, 1, 0, False, "alpha"),
        (0, 1, 1, False, "beta gamma"),
        (0, 2, 0, False, "d&e"),
        (0, 2, 1, False, "nestedtail"),  # nested table folded into its cell
        (1, 0, 0, False, "solo"),
    ]


def test_parse_tables_unclosed_at_eof_and_bytes():
    assert parse_tables(b"<table><tr><td>x") == [(0, 0, 0, False, "x")]
    assert parse_tables("no tables here") == []


def test_soundex_known_codes():
    # simplified variant: NO H/W-skip rule (documented in the docstring)
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A226"
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"
    assert soundex("Honeyman") == "H555"
    assert soundex("don't") == "D530"
    assert soundex("3.14") is None
    assert soundex("") is None


def test_soundex_matches_sql_mirror():
    import duckdb

    from document_ai_ray.pipelines.text_queries import _soundex_sql

    words = ["jackson", "lukasiewicz", "gutierrez", "vandeusen", "a", "bb", "czzz"]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {_soundex_sql('u')} FROM (SELECT upper(unnest(?::VARCHAR[])) AS u)",
        [words],
    ).fetchall()
    assert [r[0] for r in got] == [soundex(w) for w in words]


def test_parse_outline_counter_stack():
    from document_ai_ray.stages.html_meta import parse_outline

    html = (
        "<body><!-- <h2>decoy</h2> --><h1>A</h1><h2>B <b>x</b></h2><h3>C</h3>"
        "<h3>D</h3><h2>E</h2><h1>F</h1><h3>G</h3></body>"
    )
    assert parse_outline(html) == [
        (0, 1, "1", "A"),
        (1, 2, "1.1", "B x"),
        (2, 3, "1.1.1", "C"),
        (3, 3, "1.1.2", "D"),
        (4, 2, "1.2", "E"),
        (5, 1, "2", "F"),
        (6, 3, "2.1", "G"),  # skipped h2 level absent from the path
    ]


def test_parse_list_items_nesting_and_implicit_close():
    from document_ai_ray.stages.html_meta import parse_list_items

    html = (
        "<ul><li>one<li>two<ol><li>n1</li><li>n2</ol></li><li>three</li></ul>"
        "<ol><li>solo</li></ol>"
    )
    assert parse_list_items(html) == [
        (0, 0, "1", False, "one"),
        (0, 0, "2", False, "two"),
        (0, 1, "2.1", True, "n1"),
        (0, 1, "2.2", True, "n2"),
        (0, 0, "3", False, "three"),
        (1, 0, "1", True, "solo"),
    ]


def test_hll60_python_matches_sql_spec():
    """Differential: the md5-60-bit HLL estimate substrate is
    bit-identical between the Python helpers and the SQL replay, across
    the linear-counting and raw branches."""
    import duckdb

    from document_ai_ray.functions.sketch import (
        hll60_est_milli,
        hll60_registers,
        hll60_sql,
        hll_merge,
    )

    con = duckdb.connect()
    for n in (3, 40, 900, 30000):
        vals = [f"u{i}q{i * 7}" for i in range(n)]
        est, _ = hll60_est_milli(hll60_registers(vals))
        con.execute(
            "CREATE OR REPLACE TABLE t AS SELECT unnest(?::VARCHAR[]) AS v", [vals]
        )
        q = (
            "WITH vals AS (SELECT DISTINCT v FROM t),"
            + hll60_sql("SELECT v FROM vals")
            + "SELECT est_milli FROM est"
        )
        assert con.execute(q).fetchone()[0] == est
        # merge associativity of the 60-bit registers
        whole = hll60_registers(vals)
        parts = [hll60_registers(vals[i::5]) for i in range(5)]
        assert (hll_merge(parts) == whole).all()
