"""Randomized property test for the DSL expression compiler: a seeded
generator builds arithmetic/comparison expression trees, renders them to DSL
text, and an INDEPENDENT python mini-evaluator implementing the reference's
integer semantics (math_op.rs: Rust-truncated int `/` and `div`,
sign-of-dividend `%`, parenthesized comparisons) computes the expected value
per row.  All expressions compile into ONE pipeline / ONE Spark job.

Divide-by-zero expects null on the Spark side (ANSI off) and None from the
evaluator — the reference raises a Value::Error there, which is null-ish
under the error-as-value convention (PARITY_DELTAS.md).
"""

import math
import random

from feathr_online_spark.dsl import parse_pipelines

ROWS = [
    {"a": -6, "b": 3}, {"a": 5, "b": -2}, {"a": 0, "b": 4},
    {"a": -1, "b": -5}, {"a": 6, "b": 6}, {"a": 2, "b": 0},
]


def gen_expr(rng: random.Random, depth: int):
    """Returns (dsl_text, eval_fn) — eval_fn(env) → int | None."""
    if depth == 0 or rng.random() < 0.3:
        choice = rng.random()
        if choice < 0.4:
            return "a", lambda env: env["a"]
        if choice < 0.8:
            return "b", lambda env: env["b"]
        lit = rng.randint(0, 4)
        return str(lit), lambda env, v=lit: v

    op = rng.choice(["+", "-", "*", "div", "%", "/", "neg"])
    if op == "neg":
        t, f = gen_expr(rng, depth - 1)
        return f"(-({t}))", lambda env, f=f: (lambda v: None if v is None else -v)(f(env))
    lt, lf = gen_expr(rng, depth - 1)
    rt, rf = gen_expr(rng, depth - 1)

    def ev(env, lf=lf, rf=rf, op=op):
        x, y = lf(env), rf(env)
        if x is None or y is None:
            return None
        if op == "+":
            return x + y
        if op == "-":
            return x - y
        if op == "*":
            return x * y
        # int/int `/` and `div` are both Rust-truncated (math_op.rs:197);
        # `%` keeps the dividend's sign (Rust/Java %, NOT python's)
        if y == 0:
            return None
        q = math.trunc(x / y)
        if op in ("div", "/"):
            return q
        return x - q * y

    return f"({lt} {op} {rt})", ev


def test_dsl_arithmetic_matches_reference_semantics(spark):
    rng = random.Random(20240816)
    exprs = [gen_expr(rng, 3) for _ in range(120)]
    cols = ", ".join(f"c{i} = {t}" for i, (t, _) in enumerate(exprs))
    p = parse_pipelines(f"t(a as long, b as long)\n| project {cols}\n;")["t"]
    out = p.run(spark, ROWS).collect()
    assert len(out) == len(ROWS)
    for row in out:
        env = {"a": row.a, "b": row.b}
        for i, (text, ev) in enumerate(exprs):
            want = ev(env)
            got = getattr(row, f"c{i}")
            assert got == want, f"{text} over {env}: spark={got} expected={want}"


def test_dsl_comparison_matches_reference_semantics(spark):
    rng = random.Random(97531)
    cases = []
    for i in range(40):
        lt, lf = gen_expr(rng, 2)
        rt, rf = gen_expr(rng, 2)
        cmp = rng.choice([">", "<", ">=", "<=", "==", "!="])
        cases.append((f"({lt}) {cmp} ({rt})", lf, rf, cmp))
    cols = ", ".join(f"c{i} = {t}" for i, (t, *_status) in enumerate(cases))
    p = parse_pipelines(f"t(a as long, b as long)\n| project {cols}\n;")["t"]
    out = p.run(spark, ROWS).collect()
    import operator as op

    pyop = {">": op.gt, "<": op.lt, ">=": op.ge, "<=": op.le, "==": op.eq, "!=": op.ne}
    for row in out:
        env = {"a": row.a, "b": row.b}
        for i, (text, lf, rf, cmp) in enumerate(cases):
            x, y = lf(env), rf(env)
            want = None if x is None or y is None else pyop[cmp](x, y)
            got = getattr(row, f"c{i}")
            assert got == want, f"{text} over {env}: spark={got} expected={want}"
