#!/usr/bin/env python
"""Deterministic differential fuzzer for the dialect layer.

Generates expressions from small grammars over the round's semantic
hot spots — operator precedence with unary signs, DuckDB division /
modulo / power, NULL-element list comparisons, projection-context
membership, aggregate ORDER BY null placement, and (r11) depth-2/3
nested collection comparisons, star EXCLUDE/REPLACE column order, and
a rotating scalar-function battery (split_part / list_intersect /
list_concat / NULL membership probes / string slicing / bar /
struct_extract) — and runs every case through DuckDB AND the engine
(``dialect="duckdb"``), comparing values. Seeded PRNG: the same seed always replays the same corpus, so
a found divergence is a permanent regression test.

Usage: python tools/dialect_fuzz.py [--n 400] [--seed 7]
Exit 0 iff no silent divergences. Cases where DuckDB errors are
skipped (the engine may accept a superset); engine-only errors print
as LOUD and fail with --strict.
"""

from __future__ import annotations

import argparse
import math
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_arith(rng: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rng.random() < 0.3:
        v = rng.choice(["2", "3", "5", "7", "0", "2.5", "1.5", "4"])
        if rng.random() < 0.3:
            v = "-" + v
        return v
    op = rng.choice(["+", "-", "*", "/", "//", "%", "^"])
    a = gen_arith(rng, depth + 1)
    b = gen_arith(rng, depth + 1)
    if op == "^":
        # keep exponents tiny so both engines stay in DOUBLE range
        b = rng.choice(["2", "3", "-2", "0"])
    if rng.random() < 0.25:
        return f"({a} {op} {b})"
    return f"{a} {op} {b}"


def gen_list(rng: random.Random) -> str:
    n = rng.randint(0, 4)
    elems = [rng.choice(["1", "2", "3", "NULL"]) for _ in range(n)]
    return "[" + ",".join(elems) + "]"


def gen_list_cmp(rng: random.Random) -> str:
    op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
    return f"{gen_list(rng)} {op} {gen_list(rng)}"


def gen_membership(rng: random.Random) -> str:
    vals = [rng.choice(["1", "2", "3", "NULL"]) for _ in range(rng.randint(1, 3))]
    sub = "SELECT x FROM (VALUES " + ",".join(f"({v})" for v in vals) + ") q(x)"
    lhs = rng.choice(["1", "2", "5", "NULL"])
    form = rng.choice(["in", "notin", "any", "all", "gtany", "ltall"])
    if form == "in":
        return f"{lhs} IN ({sub})"
    if form == "notin":
        return f"{lhs} NOT IN ({sub})"
    if form == "any":
        return f"{lhs} = ANY ({sub})"
    if form == "all":
        return f"{lhs} <> ALL ({sub})"
    if form == "gtany":
        return f"{lhs} > ANY ({sub})"
    return f"{lhs} < ALL ({sub})"


def gen_agg_query(rng: random.Random) -> str:
    vals = [rng.choice(["1", "2", "3", "NULL"]) for _ in range(rng.randint(1, 5))]
    table = "(VALUES " + ",".join(f"({v})" for v in vals) + ") t(x)"
    direction = rng.choice(["", " ASC", " DESC"])
    norder = rng.choice(["", " NULLS FIRST", " NULLS LAST"])
    kind = rng.choice(["sa", "aa", "aad", "plain"])
    if kind == "sa":
        expr = f"string_agg(x::VARCHAR, ',' ORDER BY x{direction}{norder})"
    elif kind == "aa":
        expr = f"array_agg(x ORDER BY x{direction}{norder})"
    elif kind == "aad":
        expr = f"array_agg(DISTINCT x ORDER BY x{direction}{norder})"
    else:
        expr = "list_sort(array_agg(x), 'ASC', 'NULLS FIRST')"
    return f"SELECT {expr} AS v FROM {table}"


def gen_window(rng: random.Random) -> str:
    # DISTINCT x values (ties would make lag/lead nondeterministic on
    # both sides — not a divergence, just an unusable oracle)
    pool = ["1", "2", "3", "4", "NULL"]
    rng.shuffle(pool)
    vals = pool[: rng.randint(2, 5)]
    rows = ",".join(f"({v},{i})" for i, v in enumerate(vals))
    fn = rng.choice(
        ["lag(x)", "lead(x)", "first_value(x)", "last_value(x)",
         "sum(x)", "rank()", "dense_rank()", "count(x)"]
    )
    direction = rng.choice(["", " ASC", " DESC"])
    norder = rng.choice(["", " NULLS FIRST", " NULLS LAST"])
    frame = rng.choice(
        ["", " ROWS BETWEEN 1 PRECEDING AND CURRENT ROW",
         " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"]
    )
    if fn in ("rank()", "dense_rank()") or fn.startswith(("lag", "lead")):
        frame = ""  # ranking/offset functions take no frame
    spec = f"ORDER BY x{direction}{norder}{frame}"
    return (
        f"SELECT n, {fn} OVER ({spec}) AS v "
        f"FROM (VALUES {rows}) t(x,n) ORDER BY n"
    )


def gen_datearith(rng: random.Random) -> str:
    ts = rng.choice(
        ["TIMESTAMP '2024-02-28 23:30:00'", "TIMESTAMP '2000-01-01 00:00:00'",
         "TIMESTAMP '1969-07-20 20:17:40'", "TIMESTAMP '2024-12-31 23:59:59'"]
    )
    ts2 = rng.choice(
        ["TIMESTAMP '2024-03-01 00:00:00'", "TIMESTAMP '2023-02-28 12:00:00'",
         "TIMESTAMP '2024-02-29 00:00:00'"]
    )
    unit = rng.choice(
        ["year", "quarter", "month", "week", "day", "hour", "minute",
         "second"]
    )
    kind = rng.choice(["diff", "trunc", "add", "epoch", "part"])
    if kind == "diff":
        return f"SELECT date_diff('{unit}', {ts}, {ts2}) AS v"
    if kind == "trunc":
        return f"SELECT date_trunc('{unit}', {ts}) AS v"
    if kind == "add":
        k = rng.randint(-3, 3)
        return f"SELECT {ts} + INTERVAL {k} {unit.upper()} AS v"
    if kind == "epoch":
        return f"SELECT epoch({ts}) AS v"
    return f"SELECT date_part('{unit}', {ts}) AS v"


def gen_strfn(rng: random.Random) -> str:
    s = rng.choice(["'abc'", "''", "'héllo'", "'a,b,c'", "'A_b%'"])
    t = rng.choice(["'b'", "'x'", "''", "'é'"])
    k = rng.randint(-2, 5)
    i = rng.randint(-3, 4)
    tmpl = rng.choice([
        f"upper({s})", f"reverse({s})", f"left({s}, {k})",
        f"right({s}, {k})", f"substr({s}, {i}, 2)", f"substring({s}, {i})",
        f"lpad({s}, {abs(k)}, 'xy')", f"rpad({s}, {abs(k)}, 'xy')",
        f"split_part({s}, ',', {max(i, 0)})", f"replace({s}, {t}, 'Z')",
        f"instr({s}, {t})", f"levenshtein({s}, {t})",
        f"contains({s}, {t})", f"position({t} IN {s})",
        f"{s}[{i}]", f"{s}[{max(i, 0)}:{max(i, 0) + 2}]",
        f"concat({s}, NULL, {t})", f"length({s})",
    ])
    return f"SELECT {tmpl} AS v"


def gen_groupby(rng: random.Random) -> str:
    rows = ",".join(
        f"({rng.choice(['1', '2', 'NULL'])},"
        f"{rng.choice(['10', '20', '30', 'NULL'])})"
        for _ in range(rng.randint(2, 6))
    )
    pred = rng.choice(
        ["x > 10", "x IS NOT NULL", "x IN (10, 30)", "x IN (10, NULL)",
         "true", "g = 1 OR x < 25"]
    )
    having = rng.choice(
        ["", " HAVING count(*) > 0", " HAVING sum(x) > 10",
         " HAVING min(x) IS NOT NULL"]
    )
    norder = rng.choice([" NULLS FIRST", " NULLS LAST"])
    agg = rng.choice(
        ["sum(x)", "count(x)", "count(*)", "min(x)", "max(x)", "avg(x)",
         "count(*) FILTER (WHERE x > 15)", "bool_or(x > 15)"]
    )
    return (
        f"SELECT g, {agg} AS s FROM (VALUES {rows}) t(g,x) "
        f"WHERE {pred} GROUP BY g{having} ORDER BY g{norder}"
    )


def gen_listfn(rng: random.Random) -> str:
    l = gen_list(rng)
    i = rng.randint(-3, 4)
    j = rng.randint(-2, 5)
    tmpl = rng.choice([
        f"list_sort({l})",
        f"list_sort({l}, 'DESC')",
        f"list_sort({l}, 'ASC', 'NULLS FIRST')",
        f"list_reverse_sort({l})",
        f"({l})[{i}]",
        f"({l})[{min(i, j)}:{max(i, j)}]",
        f"list_resize({l}, {abs(i)})",
        f"list_unique({l})",
        f"list_sort(list_distinct({l}), 'ASC', 'NULLS FIRST')",
        f"list_has({l}, 2)",
        f"list_sum({l})",
        f"list_avg({l})",
        f"len({l})",
        f"list_contains({l}, 2)",
        f"list_position({l}, 2)",
        f"array_slice({l}, {i}, {j})",
        f"flatten([{l}, {gen_list(rng)}])",
        f"list_append({l}, 9)",
        f"list_prepend(9, {l})",
            ])
    return f"SELECT {tmpl} AS v"


def gen_json(rng: random.Random) -> str:
    doc = rng.choice([
        "'{\"a\": 1, \"b\": [1,2,3]}'",
        "'{\"a\": {\"c\": \"x\"}}'",
        "'[1, 2, {\"k\": null}]'",
        "'\"plain\"'",
        "'17'",
        "'null'",
    ])
    path = rng.choice(["'$.a'", "'$.b'", "'$.a.c'", "'$[0]'", "'$.missing'"])
    tmpl = rng.choice([
        f"json_extract({doc}, {path})",
        f"json_extract_string({doc}, {path})",
        f"json_array_length({doc})",
        f"json_valid({doc})",
        f"json_type({doc})",
        f"({doc}::JSON)->>{path}",
    ])
    return f"SELECT {tmpl} AS v"


def gen_setop(rng: random.Random) -> str:
    def arm():
        # typed NULLs: an all-NULL VALUES arm would make the column
        # NullType, where Spark's set ops lose null-safety (a Spark
        # NullType corner, documented in PARITY — not a dialect bug)
        vals = ",".join(
            f"({rng.choice(['1', '2', '3', 'CAST(NULL AS INT)'])})"
            for _ in range(rng.randint(1, 4))
        )
        return f"SELECT x FROM (VALUES {vals}) t(x)"

    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    return f"{arm()} {op} {arm()} ORDER BY 1 NULLS FIRST"


def gen_cast(rng: random.Random) -> str:
    v = rng.choice(
        ["2.5", "-2.5", "3.49", "'5.7'", "'  8 '", "'x'", "NULL",
         "2.5::DOUBLE", "1.5::FLOAT4", "TRUE", "'-3'", "127.6"]
    )
    ty = rng.choice(
        ["INT", "BIGINT", "SMALLINT", "TINYINT", "VARCHAR", "DOUBLE",
         "BOOLEAN", "DECIMAL(6,2)"]
    )
    fn = rng.choice(["CAST({} AS {})", "TRY_CAST({} AS {})", "{}::{}"])
    expr = fn.format(v, ty)
    if rng.random() < 0.3:
        expr = f"TRY_CAST({expr} AS VARCHAR)"
    return f"SELECT {expr} AS v"


def gen_like(rng: random.Random) -> str:
    s = rng.choice(["'abc'", "'a%c'", "'A_C'", "''", "'aXbXc'", "'a.b'"])
    pat = rng.choice(
        ["'a%'", "'%b%'", "'a_c'", "'%'", "'_'", "''", "'A%'"]
    )
    op = rng.choice(
        ["LIKE", "NOT LIKE", "ILIKE", "NOT ILIKE", "SIMILAR TO"]
    )
    if op == "SIMILAR TO":
        pat = rng.choice(["'a.c'", "'[ab]+.*'", "'a%'"])
        pat = pat  # literal regex-ish patterns
    g = rng.choice(["GLOB 'a*'", "GLOB '*b*'", "GLOB '[ab]?c'"])
    tmpl = rng.choice(
        [f"{s} {op} {pat}", f"{s} {g}",
         f"regexp_extract({s}, '[abc]+')",
         f"regexp_matches({s}, '[aA].')",
         f"regexp_replace({s}, 'a', 'Z')",
         f"regexp_replace({s}, 'a', 'Z', 'g')"]
    )
    return f"SELECT {tmpl} AS v"


def gen_cond(rng: random.Random) -> str:
    vals = ["1", "2", "NULL", "0"]
    a, b, c = (rng.choice(vals) for _ in range(3))
    tmpl = rng.choice([
        f"coalesce({a}, {b}, {c})",
        f"nullif({a}, {b})",
        f"ifnull({a}, {b})",
        f"if({a} > {b}, {a}, {c})",
        f"iif({a} IS NULL, {b}, {c})",
        f"greatest({a}, {b}, {c})",
        f"least({a}, {b}, {c})",
        f"CASE {a} WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'other' END",
        f"CASE WHEN {a} > {b} THEN {a} ELSE {b} END + coalesce({c}, 0)",
        f"nvl({a}, {b})",
        f"{a} IS DISTINCT FROM {b}",
        f"{a} IS NOT DISTINCT FROM {b}",
    ])
    return f"SELECT {tmpl} AS v"


def gen_nested(rng: random.Random) -> str:
    """Depth-2/3 collection comparisons with NULL leaves (judge r10 #1:
    nested lists/structs must three-value through every level)."""

    def scalar():
        return rng.choice(["1", "2", "3", "NULL"])

    def inner_list():
        n = rng.randint(0, 3)
        return "[" + ",".join(scalar() for _ in range(n)) + "]"

    def inner_struct():
        return "{'a':%s,'b':%s}" % (scalar(), scalar())

    kind = rng.choice(["ll", "ls", "sl", "ss", "lll"])
    if kind == "ll":
        mk = lambda: "[" + ",".join(
            rng.choice([inner_list(), "NULL"])
            for _ in range(rng.randint(0, 3))
        ) + "]"
    elif kind == "ls":
        mk = lambda: "[" + ",".join(
            inner_struct() for _ in range(rng.randint(0, 3))
        ) + "]"
    elif kind == "sl":
        mk = lambda: "{'a':%s,'b':%s}" % (inner_list(), scalar())
    elif kind == "ss":
        mk = lambda: "{'a':%s,'b':%s}" % (inner_struct(), scalar())
    else:
        mk = lambda: "[[" + inner_list() + "]]"
    shape = rng.random()
    if shape < 0.70:
        op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
        a, b = mk(), mk()
        if rng.random() < 0.15 and kind in ("ll", "lll"):
            # array-typed cast camouflage (r11: INT[] targets)
            ty = "INT[]" if kind == "ll" else "INT[][]"
            a = rng.choice([f"({a})::{ty}", f"CAST({a} AS {ty})"])
        return f"SELECT {a} {op} {b} AS v"
    if shape < 0.80:
        neg = rng.choice(["", "NOT "])
        return (
            f"SELECT {mk()} {neg}IN ({mk()}, {mk()}) AS v"
        )
    if shape < 0.90:
        neg = rng.choice(["", "NOT "])
        return f"SELECT {mk()} {neg}BETWEEN {mk()} AND {mk()} AS v"
    # unnamed structs (row()) compare like named ones
    def rw():
        return "row(%s, %s)" % (scalar(), scalar())

    op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
    return f"SELECT {rw()} {op} {rw()} AS v"


def gen_starmod(rng: random.Random) -> str:
    """Star modifiers EXCLUDE/REPLACE — positional value compare makes
    the check column-ORDER-sensitive (judge r10 #5: REPLACE keeps the
    original star position)."""
    cols = ["a", "b", "c"]
    vals = ",".join(str(rng.randint(0, 9)) for _ in cols)
    mode = rng.choice(["replace1", "replace2", "exclude", "both", "sub"])
    if mode == "replace1":
        tgt = rng.choice(cols)
        sel = f"* REPLACE ({tgt}*10 AS {tgt})"
    elif mode == "replace2":
        t1, t2 = rng.sample(cols, 2)
        sel = f"* REPLACE ({t1}+1 AS {t1}, {t2}*2 AS {t2})"
    elif mode == "exclude":
        tgt = rng.choice(cols)
        sel = f"* EXCLUDE ({tgt})"
    elif mode == "both":
        t1, t2 = rng.sample(cols, 2)
        sel = f"* EXCLUDE ({t1}) REPLACE ({t2}*3 AS {t2})"
    else:
        tgt = rng.choice(cols)
        return (
            f"SELECT * FROM (SELECT * REPLACE ({tgt}+5 AS {tgt}) "
            f"FROM (VALUES ({vals})) t(a,b,c)) s"
        )
    return f"SELECT {sel} FROM (VALUES ({vals})) t(a,b,c)"


def gen_scalarfn(rng: random.Random) -> str:
    """Rotating battery over the r11-fixed scalar surface: split_part
    matrix, list_intersect/concat NULL semantics, NULL membership
    probes, string slicing, bar, struct_extract, json_array_length,
    masked `//` operands."""
    s = rng.choice(["'a,b,c'", "'abcdef'", "''", "'héllo'"])
    sep = rng.choice(["','", "''", "NULL", "'b'"])
    i = rng.randint(-6, 7)
    j = rng.randint(-6, 7)
    l1, l2 = gen_list(rng), gen_list(rng)
    k = rng.randint(0, 9)
    choices = [
        f"split_part({s}, {sep}, {i})",
        f"list_sort(list_intersect({l1}, {l2}), 'ASC', 'NULLS FIRST')",
        f"list_intersect({l1}, NULL)",
        f"list_intersect(NULL, {l1})",
        f"list_concat({l1}, {l2})",
        f"list_concat({l1}, NULL)",
        f"list_concat(NULL, {l1})",
        f"{l1} || {l2}",
        f"{l1} || NULL",
        f"list_contains({l1}, NULL)",
        f"list_contains({l1}, 2)",
        f"list_position({l1}, NULL)",
        f"({s})[{i}]",
        f"({s})[{i}:{j}]",
        f"({s})[{i}:]",
        f"({s})[:{j}]",
        f"upper({s})[{max(i, 1)}:{max(j, 1)}]",
        f"bar({rng.randint(-2, 12)}, 0, 10, {rng.randint(1, 12)})",
        f"bar({rng.uniform(0, 10):.2f}, 0, 10, 10)",
        f"struct_extract({{'a': {k}, 'b': 'x'}}, 'a')",
        f"json_array_length({rng.choice(['NULL', chr(39) + '[1,2]' + chr(39), chr(39) + '3' + chr(39)])})",
        f"length({s}) // 2",
        f"strpos('a/b', '/') // {max(abs(i), 1)}",
        f"any_value(x) FILTER (WHERE x IS NOT NULL)",
    ]
    expr = rng.choice(choices)
    if "any_value" in expr:
        # deterministic: all non-NULL values equal
        return (
            f"SELECT any_value(x) AS v FROM (VALUES (NULL),({k}),({k})) t(x)"
        )
    return f"SELECT {expr} AS v"


def gen_rowvalue(rng: random.Random) -> str:
    """Bare parenthesized row-values (judge r12 #1): DuckDB's implicit
    ROW constructor in comparison/IN/BETWEEN/CASE/WHERE position —
    NULL leaves, nested tuples, list and string positions."""

    def val(ty):
        if rng.random() < 0.25:
            return "NULL"
        if ty == "i":
            return rng.choice(["1", "2", "3"])
        if ty == "s":
            return rng.choice(["'a'", "'b'"])
        if ty == "l":
            return "[" + ",".join(
                rng.choice(["1", "2", "NULL"])
                for _ in range(rng.randint(0, 2))
            ) + "]"
        return "(" + ", ".join(
            rng.choice(["1", "2", "NULL"]) for _ in range(2)
        ) + ")"

    k = rng.randint(2, 3)
    types = [rng.choice(["i", "i", "s", "l", "t"]) for _ in range(k)]

    def tup():
        return "(" + ", ".join(val(t) for t in types) + ")"

    shape = rng.random()
    if shape < 0.5:
        op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
        return f"SELECT {tup()} {op} {tup()} AS v"
    if shape < 0.7:
        neg = rng.choice(["", "NOT "])
        return f"SELECT {tup()} {neg}IN ({tup()}, {tup()}) AS v"
    if shape < 0.8:
        return f"SELECT {tup()} BETWEEN {tup()} AND {tup()} AS v"
    if shape < 0.9:
        inner = f"{tup()} = {tup()}"
        return (
            f"SELECT CASE WHEN ({inner}) IS NULL THEN -1 "
            f"WHEN {inner} THEN 1 ELSE 0 END AS v"
        )
    op = rng.choice(["=", "<"])
    return (
        f"SELECT x FROM (VALUES (1),(2)) t(x) "
        f"WHERE {tup()} {op} {tup()}"
    )


def gen_scalarfn12(rng: random.Random) -> str:
    """Rotating battery over the r12 surface: log arity dispatch, chr
    code points, DECIMAL-cast truncation, median DECIMAL dispatch,
    embedding-distance spellings, table-valued series, in-call ORDER
    BY on order-insensitive aggregates, list_extract string branch."""
    pick = rng.randrange(14)
    if pick == 10:
        a, b = rng.randint(-9, 9), rng.randint(1, 9)
        fn = rng.choice(["add", "subtract", "multiply", "divide"])
        return f"SELECT {fn}({a}, {b}) AS v"
    if pick == 11:
        y = rng.randint(1, 2400)
        fn = rng.choice(["millennium", "century", "decade"])
        return (
            f"SELECT {fn}(DATE '{y:04d}-03-04') AS v, "
            f"extract({fn} FROM DATE '{y:04d}-03-04') AS w"
        )
    if pick == 12:
        s = rng.choice(
            ["'a/b/c'", "'/a/b/c'", "'x'", "'a/'", "'/a'", "''",
             "'a b/c d'"]
        )
        fn = rng.choice(
            ["parse_dirname", "parse_dirpath", "parse_filename"]
        )
        return f"SELECT {fn}({s}) AS v"
    if pick == 13:
        v = rng.choice(["-2.5", "0", "3", "-7"])
        which = rng.randrange(3)
        if which == 0:
            return f"SELECT signbit({v}) AS v"
        if which == 1:
            return f"SELECT @({v}) AS v"
        s = rng.choice(["'a.b*c'", "'h-llo'", "'a_1'", "'[x]'"])
        return f"SELECT regexp_escape({s}) AS v"
    if pick == 0:
        v = rng.choice(["1", "10", "100", "2.5", "0.5", "1000"])
        return f"SELECT round(log({v}), 6) AS v"
    if pick == 1:
        b = rng.choice(["2", "10", "2.0"])
        x = rng.choice(["8", "16", "1"])
        return f"SELECT round(log({b}, {x}), 6) AS v"
    if pick == 2:
        cp = rng.choice(
            ["65", "97", "955", "8364", "128169", "49", "NULL"]
        )
        return f"SELECT chr({cp}) AS v"
    if pick == 3:
        num = rng.choice(
            ["2.55", "2.44", "-2.55", "2.999", "-2.449",
             "0.05", "99.99", "2.5"]
        )
        p, s = rng.choice([("3", "1"), ("4", "2"), ("5", "0"), ("6", "3")])
        e = f"({num}::DOUBLE)" if rng.random() < 0.3 else num
        if rng.random() < 0.5:
            return f"SELECT {e}::DECIMAL({p},{s}) AS v"
        return f"SELECT CAST({e} AS DECIMAL({p},{s})) AS v"
    if pick == 4:
        vals = ",".join(
            f"({rng.choice(['1.0', '2.0', '4.5', '9.0', '3.5'])})"
            for _ in range(rng.randint(1, 5))
        )
        return (
            f"SELECT CAST(median(x) AS DOUBLE) AS v "
            f"FROM (VALUES {vals}) t(x)"
        )
    if pick == 5:
        mk = lambda: "[" + ",".join(
            rng.choice(["1.0", "2.0", "3.0", "0.5"]) for _ in range(3)
        ) + "]"
        fn = rng.choice(["list_dot_product", "list_distance"])
        return f"SELECT round({fn}({mk()}, {mk()}), 6) AS v"
    if pick == 6:
        mk = lambda: "[" + ",".join(
            rng.choice(["1.0", "2.0", "0.0"]) for _ in range(2)
        ) + "]"
        return (
            f"SELECT round(list_cosine_similarity({mk()}, {mk()}), 6)"
            f" AS v"
        )
    if pick == 7:
        a = rng.randint(0, 5)
        b = rng.randint(a, a + 6)
        s = rng.choice([1, 2, 3])
        fn = rng.choice(["generate_series", "range"])
        return f"SELECT sum({fn}) AS v FROM {fn}({a},{b},{s})"
    if pick == 8:
        agg = rng.choice(["sum", "min", "max", "avg", "count"])
        d = rng.choice(["", "DESC"])
        vals = ",".join(
            f"({rng.randint(0, 9)})" for _ in range(rng.randint(1, 4))
        )
        return (
            f"SELECT CAST({agg}(x ORDER BY x {d}) AS DOUBLE) AS v "
            f"FROM (VALUES {vals}) t(x)"
        )
    i = rng.choice(["1", "2", "-1", "0", "99", "NULL"])
    return f"SELECT list_extract('hello', {i}) AS v"


def gen_case_mix(rng: random.Random) -> str:
    inner = rng.choice([gen_list_cmp(rng), gen_membership(rng)])
    return (
        f"CASE WHEN ({inner}) IS NULL THEN -1 "
        f"WHEN {inner} THEN 1 ELSE 0 END"
    )


def build_corpus(rng: random.Random, n: int) -> list[str]:
    out = []
    gens = [
        lambda: f"SELECT {gen_arith(rng)} AS v",
        lambda: f"SELECT {gen_list_cmp(rng)} AS v",
        lambda: f"SELECT {gen_membership(rng)} AS v",
        lambda: gen_agg_query(rng),
        lambda: f"SELECT {gen_case_mix(rng)} AS v",
        lambda: gen_window(rng),
        lambda: gen_datearith(rng),
        lambda: gen_strfn(rng),
        lambda: gen_groupby(rng),
        lambda: gen_listfn(rng),
        lambda: gen_json(rng),
        lambda: gen_setop(rng),
        lambda: gen_cast(rng),
        lambda: gen_like(rng),
        lambda: gen_cond(rng),
        lambda: gen_nested(rng),
        lambda: gen_starmod(rng),
        lambda: gen_scalarfn(rng),
        lambda: gen_rowvalue(rng),
        lambda: gen_scalarfn12(rng),
    ]
    for i in range(n):
        out.append(gens[i % len(gens)]())
    return out


import re as _re

# documented divergence classes (PARITY.md) the generator can produce:
# DuckDB 1.0 performs PLAIN division for `//` over DECIMAL operands
# (2.5 // 2 = 1.25) where the engine keeps floor-div semantics.
_DOCUMENTED_PATTERNS = [
    _re.compile(r"\d\.\d[\d_]*\s*//"),
    _re.compile(r"//\s*-?\s*\d+\.\d"),
]


def documented(sql: str) -> bool:
    return any(p.search(sql) for p in _DOCUMENTED_PATTERNS)


def norm(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return round(v, 6)
    if isinstance(v, int):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--strict", action="store_true")
    args = ap.parse_args()

    import duckdb

    from swanlake_spark.config import EngineConfig
    from swanlake_spark.engine import Engine

    rng = random.Random(args.seed)
    corpus = build_corpus(rng, args.n)

    eng = Engine(
        config=EngineConfig(
            app_name="dialect-fuzz",
            cpus=4,
            shuffle_partitions=4,
            warehouse_dir=tempfile.mkdtemp(prefix="swl_fuzz_"),
        )
    )
    eng.spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()

    ok = skip = doc = 0
    silent: list[tuple[str, object, object]] = []
    loud: list[tuple[str, str]] = []
    for sql in corpus:
        try:
            want = [tuple(norm(c) for c in r) for r in con.execute(sql).fetchall()]
        except Exception:
            skip += 1  # DuckDB rejects (overflow, malformed): no oracle
            continue
        try:
            got = [
                tuple(norm(c) for c in r)
                for r in eng.query(sql, dialect="duckdb").collect()
            ]
        except Exception as exc:  # noqa: BLE001
            loud.append((sql, f"{type(exc).__name__}: {str(exc).splitlines()[0][:100]}"))
            continue

        def close(a, b):
            if a == b:
                return True
            return (
                isinstance(a, float)
                and isinstance(b, float)
                and math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-9)
            )

        same = len(want) == len(got) and all(
            len(w) == len(g) and all(close(x, y) for x, y in zip(w, g))
            for w, g in zip(want, got)
        )
        if same:
            ok += 1
        elif documented(sql):
            doc += 1
        else:
            silent.append((sql, want, got))

    print(
        f"\n=== {ok} agree, {doc} documented-divergence, "
        f"{skip} duckdb-rejected (skipped) ==="
    )
    print(f"=== {len(silent)} SILENT divergences ===")
    for sql, w, g in silent:
        print(f"  {sql}\n    duckdb={w!r}\n    engine={g!r}")
    print(f"=== {len(loud)} engine-only errors ===")
    for sql, msg in loud[:20]:
        print(f"  {sql}\n    {msg}")
    eng.stop()
    if silent:
        return 1
    if args.strict and loud:
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
