"""The ported sqllogictest corpus (reference tests/sql/*.test) run by the
Python runner (swanlake_spark/slt.py) against the shared engine.

The reference's Rust runner drives these files over Flight SQL
(/root/reference/tests/runner/src/main.rs:145-278); ours drives them
through the engine's SQL front door — same statements, same expected
rows, same rendering rules.
"""

import glob
import os

import pytest

SQL_DIR = os.path.join(os.path.dirname(__file__), "sql")
FILES = sorted(glob.glob(os.path.join(SQL_DIR, "*.test")))


@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(p) for p in FILES])
def test_slt_file(engine, path, tmp_path):
    from swanlake_spark.slt import run_file

    executed = run_file(engine, path, str(tmp_path))
    assert executed > 0


def test_parser_roundtrip():
    from swanlake_spark.slt import parse_slt

    text = (
        "# comment\n\nrequire x\n\nstatement ok\nCREATE TABLE demo (id INT);\n\n"
        "query II\nSELECT 1, 'a'\n----\n1\ta\n\nstatement error\nBROKEN SQL\n"
    )
    recs = parse_slt(text)
    assert [r.kind for r in recs] == ["statement", "query", "statement"]
    assert recs[1].expected == ["1\ta"]
    assert recs[2].expect_error
