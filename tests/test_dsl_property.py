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


# ---------------------------------------------------------------------------
# r4 extension (VERDICT r3 #6): string / datetime / dynamic-payload trees
# ---------------------------------------------------------------------------

STR_ROWS = [
    {"s1": "Hello World", "s2": "abc"},
    {"s1": "", "s2": "  padded  "},
    {"s1": "a", "s2": "zz top"},
    {"s1": "The-Quick-Brown-Fox", "s2": "x"},
    {"s1": "  lead trail  ", "s2": "MiXeD CaSe"},
]


def gen_str_expr(rng: random.Random, depth: int):
    """(dsl_text, eval_fn) over ASCII strings — eval_fn(env) → str.

    Functions restricted to those whose reference semantics are unambiguous
    and byte==char under ASCII (len.rs counts bytes; substring is the piper
    0-based/negative-wrap contract of string_functions.rs:91-124)."""
    if depth == 0 or rng.random() < 0.3:
        c = rng.random()
        if c < 0.4:
            return "s1", lambda env: env["s1"]
        if c < 0.8:
            return "s2", lambda env: env["s2"]
        lit = rng.choice(["xyz", "Q", "", "0 1"])
        return f'"{lit}"', lambda env, v=lit: v

    op = rng.choice(["upper", "lower", "trim", "ltrim", "rtrim", "concat", "substring"])
    t, f = gen_str_expr(rng, depth - 1)
    if op == "upper":
        return f"upper({t})", lambda env, f=f: f(env).upper()
    if op == "lower":
        return f"lower({t})", lambda env, f=f: f(env).lower()
    if op == "trim":
        return f"trim({t})", lambda env, f=f: f(env).strip()
    if op == "ltrim":
        return f"ltrim({t})", lambda env, f=f: f(env).lstrip()
    if op == "rtrim":
        return f"rtrim({t})", lambda env, f=f: f(env).rstrip()
    if op == "concat":
        t2, f2 = gen_str_expr(rng, depth - 1)
        return f"concat({t}, {t2})", lambda env, f=f, f2=f2: f(env) + f2(env)
    start, length = rng.randint(-5, 5), rng.randint(-5, 5)

    def sub(env, f=f, start=start, length=length):
        # piper substring: 0-based; negative start wraps from the end
        # (max(len+start, 0)); negative length slices to len+length
        s = f(env)
        norm = max(len(s) + start, 0) if start < 0 else start
        norm_len = (max(len(s) + length - norm, 0) if length < 0 else length)
        return s[norm:norm + norm_len] if norm_len > 0 else ""

    return f"substring({t}, {start}, {length})", sub


def test_dsl_string_functions_randomized(spark):
    rng = random.Random(424242)
    exprs = [gen_str_expr(rng, 3) for _ in range(70)]
    cols = ", ".join(f"c{i} = {t}" for i, (t, _) in enumerate(exprs))
    # a few integer roots exercise len-of-string through the same trees
    lens = ", ".join(f"l{i} = len({t})" for i, (t, _) in enumerate(exprs[:15]))
    p = parse_pipelines(
        f"t(s1 as string, s2 as string)\n| project {cols}, {lens}\n;")["t"]
    out = p.run(spark, STR_ROWS).collect()
    for rowidx, row in enumerate(out):
        env = STR_ROWS[rowidx] if False else {"s1": row.s1, "s2": row.s2}
        for i, (text, ev) in enumerate(exprs):
            want = ev(env)
            got = getattr(row, f"c{i}")
            assert got == want, f"{text} over {env}: spark={got!r} expected={want!r}"
        for i, (text, ev) in enumerate(exprs[:15]):
            assert getattr(row, f"l{i}") == len(ev(env)), f"len({text}) over {env}"


from datetime import datetime as _DT

DT_ROWS = [
    {"d": _DT(2024, 2, 29, 23, 59, 59)},   # leap day
    {"d": _DT(2023, 12, 31, 0, 0, 0)},     # year boundary
    {"d": _DT(2024, 1, 1, 12, 0, 0)},
    {"d": _DT(1999, 7, 4, 6, 30, 15)},
    {"d": _DT(2024, 8, 18, 0, 0, 1)},      # a Sunday (piper dayofweek = 0)
]


def gen_dt_expr(rng: random.Random):
    """(dsl_text, eval_fn) — one datetime field extractor, python-evaluated.

    dayofweek uses the reference's bug-compat numbering ((weekday+2)%8:
    Mon=2…Sat=7, Sun=0 — mod.rs:148, PARITY_DELTAS row)."""
    field = rng.choice(["year", "month", "day", "hour", "minute", "second",
                        "dayofyear", "dayofweek"])

    def ev(env, field=field):
        d = env["d"]
        if field == "dayofyear":
            return d.timetuple().tm_yday
        if field == "dayofweek":
            spark_dow = (d.weekday() + 1) % 7 + 1   # Sun=1 … Sat=7
            return 0 if spark_dow == 1 else spark_dow
        return getattr(d, field)

    return f"{field}(d)", ev


def test_dsl_datetime_functions_randomized(spark):
    rng = random.Random(31337)
    cases = []
    for _ in range(50):
        lt, lf = gen_dt_expr(rng)
        rt, rf = gen_dt_expr(rng)
        op = rng.choice(["+", "-", "*"])
        pyop = {"+": lambda x, y: x + y, "-": lambda x, y: x - y,
                "*": lambda x, y: x * y}[op]
        cases.append((f"({lt} {op} {rt})",
                      lambda env, lf=lf, rf=rf, pyop=pyop: pyop(lf(env), rf(env))))
    cols = ", ".join(f"c{i} = {t}" for i, (t, _) in enumerate(cases))
    p = parse_pipelines(f"t(d as datetime)\n| project {cols}\n;")["t"]
    out = p.run(spark, DT_ROWS).collect()
    for rowidx, row in enumerate(out):
        env = DT_ROWS[rowidx]
        for i, (text, ev) in enumerate(cases):
            want = ev(env)
            got = getattr(row, f"c{i}")
            assert got == want, f"{text} over {env}: spark={got} expected={want}"


DYN_ROWS = [
    {"j": {"k": 5, "arr": [1, 2, 3], "nested": {"x": 7}}},
    {"j": {"k": -3, "arr": [], "nested": {"x": 0}}},
    {"j": {"k": 0, "arr": [10], "nested": {"x": -2}}},
    {"j": {"k": 42, "arr": [4, 5, 6, 7], "nested": {"x": 9}}},
]


def gen_dyn_leaf(rng: random.Random):
    """(dsl_text, eval_fn) — a dynamic-payload access: dot path or index,
    possibly missing (→ None, the reference's JSON-null/missing → null)."""
    c = rng.random()
    if c < 0.3:
        return "j.k", lambda env: env["j"]["k"]
    if c < 0.5:
        return "j.nested.x", lambda env: env["j"]["nested"]["x"]
    if c < 0.65:
        return "j.missing", lambda env: None
    i = rng.randint(0, 4)

    def ev(env, i=i):
        arr = env["j"]["arr"]
        return arr[i] if i < len(arr) else None   # OOR index → null

    return f"j.arr[{i}]", ev


def test_dsl_dynamic_payload_randomized(spark):
    """Random dot/index accesses into an untyped (dynamic) JSON carrier,
    combined arithmetically/comparatively — against a python dict walker.
    Null propagation: missing keys and out-of-range indexes are null, and
    null poisons arithmetic/comparisons (ANSI-off three-valued logic)."""
    rng = random.Random(777)
    cases = []
    for _ in range(50):
        lt, lf = gen_dyn_leaf(rng)
        kind = rng.random()
        if kind < 0.5:
            rt, rf = gen_dyn_leaf(rng)
            op = rng.choice(["+", "-", "*"])
            pyop = {"+": lambda x, y: x + y, "-": lambda x, y: x - y,
                    "*": lambda x, y: x * y}[op]

            def ev(env, lf=lf, rf=rf, pyop=pyop):
                x, y = lf(env), rf(env)
                return None if x is None or y is None else pyop(x, y)

            cases.append((f"({lt} {op} {rt})", ev))
        else:
            lit = rng.randint(-3, 8)
            cmp = rng.choice([">", "<", ">=", "<=", "==", "!="])
            import operator as _op

            pyc = {">": _op.gt, "<": _op.lt, ">=": _op.ge,
                   "<=": _op.le, "==": _op.eq, "!=": _op.ne}[cmp]

            def ev(env, lf=lf, lit=lit, pyc=pyc):
                x = lf(env)
                return None if x is None else pyc(x, lit)

            cases.append((f"({lt}) {cmp} {lit}", ev))
    cols = ", ".join(f"c{i} = {t}" for i, (t, _) in enumerate(cases))
    p = parse_pipelines(f"t(j)\n| project {cols}\n;")["t"]
    out = p.run(spark, DYN_ROWS).collect()
    for rowidx, row in enumerate(out):
        env = DYN_ROWS[rowidx]
        for i, (text, ev) in enumerate(cases):
            want = ev(env)
            got = getattr(row, f"c{i}")
            if isinstance(want, bool) or want is None:
                assert got == want, f"{text} over {env}: spark={got} expected={want}"
            else:
                assert got is not None and float(got) == float(want), \
                    f"{text} over {env}: spark={got} expected={want}"


# ---------------------------------------------------------------------------
# r5 extension (VERDICT r4 #4): randomized VERB CHAINS — multi-stage
# pipelines (where / project / explode / top / distinct / summarize) over
# typed + dynamic columns, checked row-for-row against an independent
# python list-of-dicts interpreter.
# ---------------------------------------------------------------------------

def _rust_mod(x, y):
    if x is None or y is None or y == 0:
        return None
    q = math.trunc(x / y)
    return x - q * y


CHAIN_BASE_ROWS = [
    # rid unique; g in 0..3; v has nulls; arr: distinct small ints (0-3 els)
    {"rid": 0, "g": 0, "v": 5,    "s": "alpha",   "arr": [1, 2]},
    {"rid": 1, "g": 1, "v": -3,   "s": "bb",      "arr": []},
    {"rid": 2, "g": 2, "v": None, "s": "gamma",   "arr": [7]},
    {"rid": 3, "g": 3, "v": 0,    "s": "delta d", "arr": [3, 4, 5]},
    {"rid": 4, "g": 0, "v": 2,    "s": "e",       "arr": [9, 0]},
    {"rid": 5, "g": 1, "v": 8,    "s": "zeta",    "arr": [6]},
    {"rid": 6, "g": 2, "v": -1,   "s": "eta eta", "arr": [8, 2, 1]},
    {"rid": 7, "g": 3, "v": 4,    "s": "theta",   "arr": []},
    {"rid": 8, "g": 0, "v": None, "s": "io",      "arr": [5]},
    {"rid": 9, "g": 1, "v": 7,    "s": "kappa k", "arr": [4, 3]},
    {"rid": 10, "g": 2, "v": 3,   "s": "lam",     "arr": [2]},
    {"rid": 11, "g": 3, "v": -5,  "s": "mu mu m", "arr": [1, 9]},
    {"rid": 12, "g": 0, "v": 6,   "s": "nu",      "arr": [0]},
    {"rid": 13, "g": 1, "v": 1,   "s": "xi x",    "arr": [3, 8, 6]},
]


def _gen_where(rng, schema):
    k = rng.randint(-2, 4)
    choices = [
        (f"v > {k}", lambda r, k=k: None if r["v"] is None else r["v"] > k),
        (f"g != {k % 4}", lambda r, k=k: r["g"] != k % 4),
        ("(v % 2) == 0", lambda r: (lambda m: None if m is None else m == 0)(_rust_mod(r["v"], 2))),
        ("v <= g", lambda r: None if r["v"] is None else r["v"] <= r["g"]),
    ]
    if "s" in schema:
        choices.append((f"len(s) > {k % 5 + 1}",
                        lambda r, k=k: len(r["s"]) > k % 5 + 1))
    text, ev = rng.choice(choices)
    return (f"| where {text}",
            lambda rows, ev=ev: [r for r in rows if ev(r) is True],
            schema)


def _gen_project(rng, schema, idx):
    num_cols = [c for c in ("g", "v", "rid") if c in schema]
    num_cols += [c for c in schema if c.startswith("w")]
    x = rng.choice(num_cols)
    op = rng.choice(["+", "-", "*"])
    pyop = {"+": lambda a, b: a + b, "-": lambda a, b: a - b,
            "*": lambda a, b: a * b}[op]
    if rng.random() < 0.5:
        y = rng.choice(num_cols)
        text = f"w{idx} = ({x} {op} {y})"

        def tr(rows, x=x, y=y, pyop=pyop, idx=idx):
            return [{**r, f"w{idx}": None if r[x] is None or r[y] is None
                     else pyop(r[x], r[y])} for r in rows]
    else:
        lit = rng.randint(-3, 5)
        text = f"w{idx} = ({x} {op} {lit})"

        def tr(rows, x=x, lit=lit, pyop=pyop, idx=idx):
            return [{**r, f"w{idx}": None if r[x] is None
                     else pyop(r[x], lit)} for r in rows]
    return (f"| project {text}", tr, schema | {f"w{idx}"})


def _gen_explode(rng, schema):
    def tr(rows):
        out = []
        for r in rows:
            for el in (r["arr"] or []):   # empty/null → dropped (inner)
                out.append({**r, "arr": el})
        return out
    return ("| explode arr as long", tr, schema)


def _gen_top(rng, schema, exploded):
    n = rng.randint(3, 8)
    asc = rng.random() < 0.5
    if exploded:
        # (rid, arr) is the unique key after explode; the combined
        # expression is strictly unique because arr elements < 1000
        key_text = "(rid * 1000 + arr)"
        key = lambda r: r["rid"] * 1000 + r["arr"]
    else:
        key_text = "rid"
        key = lambda r: r["rid"]

    def tr(rows, n=n, asc=asc, key=key):
        return sorted(rows, key=key, reverse=not asc)[:n]

    return (f"| top {n} by {key_text} {'asc' if asc else 'desc'}", tr, schema)


def _gen_distinct(rng, schema):
    by = ["g"] + (["v"] if rng.random() < 0.5 and "v" in schema else [])

    def tr(rows, by=by):
        seen, out = set(), []
        for r in rows:
            k = tuple(r[c] for c in by)
            if k not in seen:
                seen.add(k)
                out.append({c: r[c] for c in by})
        return out

    return (f"| distinct by {', '.join(by)}", tr, set(by))


def _gen_summarize(rng, schema):
    num_cols = [c for c in schema if c in ("v", "rid") or c.startswith("w")]
    col = rng.choice(num_cols)
    aggs = [("n", "count()", lambda vs: len(vs))]
    pick = rng.sample(["sum", "min", "max"], rng.randint(1, 3))
    for i, fn in enumerate(pick):
        def mk(fn):
            def agg(vs, fn=fn):
                nn = [v for v in vs if v is not None]
                if not nn:
                    return None
                return {"sum": sum, "min": min, "max": max}[fn](nn)
            return agg
        aggs.append((f"a{i}", f"{fn}({col})", mk(fn)))
    agg_text = ", ".join(f"{name} = {expr}" for name, expr, _ in aggs)

    def tr(rows, aggs=aggs, col=col):
        groups = {}
        for r in rows:
            groups.setdefault(r["g"], []).append(r)
        out = []
        for gval, members in groups.items():
            row = {"g": gval}
            for name, expr, agg in aggs:
                vs = ([None] * len(members) if expr == "count()"
                      else [m[col] for m in members])
                row[name] = agg(vs)
            out.append(row)
        return out

    return (f"| summarize {agg_text} by g", tr,
            {"g"} | {name for name, _, _ in aggs})


def _gen_chain(rng):
    """One random pipeline: 1-4 lazy stages + optional terminal."""
    schema = {"rid", "g", "v", "s", "arr"}
    stages, transforms = [], []
    exploded = False
    pidx = 0
    for _ in range(rng.randint(1, 4)):
        c = rng.random()
        if c < 0.35:
            text, tr, schema = _gen_where(rng, schema)
        elif c < 0.65:
            text, tr, schema = _gen_project(rng, schema, pidx)
            pidx += 1
        elif c < 0.85 and not exploded:
            text, tr, schema = _gen_explode(rng, schema)
            exploded = True
        else:
            text, tr, schema = _gen_top(rng, schema, exploded)
        stages.append(text)
        transforms.append(tr)
    if rng.random() < 0.5:
        if rng.random() < 0.5:
            text, tr, schema = _gen_distinct(rng, schema)
        else:
            text, tr, schema = _gen_summarize(rng, schema)
        stages.append(text)
        transforms.append(tr)
    return stages, transforms, schema


def _canon(rows_dicts, cols):
    order = sorted(cols)

    def norm(x):
        # an un-exploded dynamic array rides the carrier as array<string>;
        # stringify list elements on both sides so int/str unify
        return [str(e) for e in x] if isinstance(x, list) else x

    return sorted(
        (tuple(norm(r[c]) for c in order) for r in rows_dicts),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def test_dsl_verb_chains_randomized(spark):
    """≥100 random multi-stage pipelines vs an independent python
    interpreter; result compared as a multiset of full rows."""
    rng = random.Random(20260817)
    n_chains = 110
    for trial in range(n_chains):
        stages, transforms, schema = _gen_chain(rng)
        src = ("t(rid as long, g as long, v as long, s as string, arr as array)\n"
               + "\n".join(stages) + "\n;")
        p = parse_pipelines(src)["t"]
        rows_in = [dict(r) for r in CHAIN_BASE_ROWS]
        got = [r.asDict() for r in p.run(spark, rows_in).collect()]
        want = rows_in
        for tr in transforms:
            want = tr(want)
        assert {c for c in got[0]} == schema if got else True, \
            f"trial {trial}: schema {sorted(got[0]) if got else '∅'} != {sorted(schema)}\n{src}"
        assert _canon(got, schema) == _canon(want, schema), \
            f"trial {trial} mismatch:\n{src}\nspark={_canon(got, schema)[:6]}\nwant={_canon(want, schema)[:6]}"
