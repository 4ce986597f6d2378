"""DECIMAL-`//` lint core (VERDICT r11 ask #2 — the FOURTH bite of the
division family: Theil r9, Gumbel r10, anisotropy r11-staging,
language-mix entropy r12-staging).

The trap (pinned by the r11 probe, DuckDB 1.0): `//` on INTEGER/BIGINT/
HUGEINT operands truncates toward zero exactly like Spark `div`, but on
DECIMAL operands `//` is TRUE division — so `(2*sum(t)+n) // (2*n)`
silently stops truncating the moment `t` is a DECIMAL product
(DuckDB sum(DECIMAL) -> DECIMAL), and the half-up idiom returns a
fraction.  The gate can only catch it on data exercising the fractional
path; this lint catches it at write time, mechanically.

Rule: every operand of every `//` in a DuckDB oracle must be PROVABLY
integer-typed from the text alone.  Provable:

- `::BIGINT`/`::HUGEINT`/`::INTEGER`/`::INT` suffix cast, or
  `cast(x AS <those>)`;
- integer literals; known-integer parquet columns of the testdata
  tables (enumerated in KNOWN_INT_COLUMNS);
- integer-returning builtins (count, row_number, rank, ntile, strpos,
  len/length, epoch_us/..., datediff, ascii, unicode);
- sum/max/min/abs/mod/greatest/least/coalesce and CASE branches,
  recursively (DuckDB sum(BIGINT) -> HUGEINT: `//`-truncates fine);
- `+ - * // %` compositions of provable operands; window application
  `f(...) OVER (...)` of a provable f;
- scalar subqueries `(SELECT <provable> FROM ...)`;
- aliases whose defining expression proves (fixpoint, so one level of
  CTE indirection proves through);
- element extraction `name[i]` where `name` is a provable integer-LIST
  alias (range(...), `::BIGINT[]`, or list_transform whose lambda body
  proves).

Documented perimeter (not soundness gaps hidden — design choices):

- LAMBDA PARAMETERS are assumed integer.  The aggregate-promotion bite
  cannot occur inside a scalar lambda body (SQL aggregates don't apply
  there), and every lambda in the repo's oracles ranges over range()
  or byte/hex positions.  A DECIMAL list reaching `//` through a
  lambda would need list_sum, which the oracles don't use with `//`.
- `floor()`/`ceil()` stay UNPROVABLE (they return DOUBLE in DuckDB) —
  the repo idiom is `floor(...)::BIGINT`, which proves via the cast.
- `/` (true division) poisons any expression it appears in.

Sites the prover cannot reach (struct-field extracts, recursive-CTE
aliases) carry per-site waivers in tests/test_decimal_div_lint.py with
the audit rationale.
"""

import re

_INT_TYPES = r"(BIGINT|HUGEINT|INTEGER|INT|SMALLINT|TINYINT|UBIGINT|UINTEGER)"
_SUFFIX_CAST = re.compile(r"::\s*" + _INT_TYPES + r"\s*$", re.I)
_ANY_SUFFIX_CAST = re.compile(r"::\s*\w+\s*(\(\s*[\d, ]*\))?\s*$")
_INT_FUNCS = {
    "count", "row_number", "rank", "dense_rank", "ntile", "len",
    "length", "strpos", "instr", "unicode", "ascii", "octet_length",
    "bit_length", "epoch", "epoch_us", "epoch_ms", "epoch_ns",
    "datediff", "date_diff", "datesub", "date_sub", "levenshtein",
    "hamming", "list_count", "array_length", "cardinality", "sign",
}
_PASSTHROUGH_FUNCS = {
    "sum", "max", "min", "abs", "mod", "greatest", "least", "coalesce",
    "nullif", "list_sum", "list_max", "list_min", "first", "last",
    "any_value", "lag", "lead", "first_value", "last_value",
}

# Integer-typed physical columns of the driver testdata parquet tables
# (verified against DESCRIBE at all three SFs; the schema is fixed by
# TESTDATA.md).  n_tokens/value/price columns are DOUBLE/DECIMAL and
# deliberately absent.
KNOWN_INT_COLUMNS = frozenset({
    "event_id", "user_id", "o_orderkey", "o_custkey", "c_custkey",
    "c_nationkey", "l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "p_partkey", "p_size", "doc_id", "n_chars",
    "vec_id", "label", "s_suppkey", "s_nationkey", "n_nationkey",
    "n_regionkey", "r_regionkey",
})


def _fwd_balanced(text, i):
    depth = 0
    while i < len(text):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return len(text)


def _split_top(expr, seps=","):
    out, depth, cur = [], 0, []
    for c in expr:
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if depth == 0 and c in seps:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    out.append("".join(cur))
    return out


def _top_level_binary_split(expr):
    """('+', parts) for top-level + - * // % chains; ('/', None) when a
    top-level true division poisons the expression; None for a single
    primary."""
    parts, ops = [], []
    depth, cur, i = 0, [], 0
    in_case = 0
    while i < len(expr):
        c = expr[i]
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if depth == 0:
            # CASE..END is one primary: operators inside it are not
            # top-level even at paren depth 0
            m = re.match(r"(?i)CASE\b", expr[i:])
            if m:
                in_case += 1
            m = re.match(r"(?i)END\b", expr[i:])
            if m and in_case:
                in_case -= 1
        if depth == 0 and not in_case:
            if expr.startswith("//", i):
                parts.append("".join(cur)); cur = []; ops.append("//")
                i += 2
                continue
            if c in "+*%":
                parts.append("".join(cur)); cur = []; ops.append(c)
                i += 1
                continue
            if c == "-" and "".join(cur).strip():
                parts.append("".join(cur)); cur = []; ops.append("-")
                i += 1
                continue
            if c == "/":
                return ("/", None)
        cur.append(c)
        i += 1
    parts.append("".join(cur))
    if ops:
        return (ops, parts)
    return None


def provably_date(expr, env):
    """DATE-typed by text: ::DATE suffix, a date alias, or max/min/
    first/last/lag/lead/coalesce of a provable date."""
    e = expr.strip()
    while e.startswith("(") and _fwd_balanced(e, 0) == len(e):
        e = e[1:-1].strip()
    if _top_level_binary_split(e) is not None:
        return False  # date arithmetic out of scope
    if re.search(r"::\s*DATE\s*$", e, re.I):
        return True
    m = re.match(r"^([A-Za-z_]\w*)\s*\(", e)
    if m:
        close = _fwd_balanced(e, m.end() - 1)
        rest = e[close:].strip()
        if rest:
            over = re.match(r"(?is)^OVER\s*\(", rest)
            if not over:
                return False
            over_close = _fwd_balanced(rest, rest.index("("))
            if rest[over_close:].strip():
                return False
        if m.group(1).lower() in (
            "max", "min", "first", "last", "any_value", "lag", "lead",
            "coalesce", "greatest", "least",
        ):
            return all(
                provably_date(a, env)
                for a in _split_top(e[m.end():close - 1])
            )
        return False
    if re.fullmatch(r"[A-Za-z_][\w.]*", e):
        return e.split(".")[-1] in env[2]
    return False


def provably_int(expr, env):
    """env: (int_aliases, int_list_aliases, date_aliases) frozensets +
    a struct-field source map appended as env[3] (alias -> def text)."""
    int_aliases, int_lists = env[0], env[1]
    e = expr.strip()
    if not e:
        return False
    while e.startswith("(") and _fwd_balanced(e, 0) == len(e):
        e = e[1:-1].strip()
    if not e:
        return False
    # scalar subquery: prove the (single) top-level select item
    if re.match(r"(?is)^SELECT\b", e):
        body = re.split(r"(?is)\bFROM\b", e[6:], maxsplit=1)[0]
        items = _split_top(body)
        return len(items) == 1 and provably_int(
            re.sub(r"(?is)\bAS\s+\w+\s*$", "", items[0]), env
        )
    # binary chains FIRST: a suffix cast binds one factor, not the
    # whole expression (c::DECIMAL * x::BIGINT must NOT prove via the
    # trailing ::BIGINT — the r12 planted-trap shape)
    split = _top_level_binary_split(e)
    if split is not None:
        ops, parts = split
        if parts is None:
            return False
        if len(parts) > 1:
            if all(provably_int(p, env) for p in parts):
                return True
            # DATE - DATE is BIGINT days in DuckDB
            return (
                ops == ["-"]
                and len(parts) == 2
                and all(provably_date(p, env) for p in parts)
            )
    # single primary from here on: suffix casts now bind the whole text
    if _SUFFIX_CAST.search(e):
        return True
    if _ANY_SUFFIX_CAST.search(e):
        return False
    if e.startswith("-"):
        return provably_int(e[1:], env)
    if re.fullmatch(r"\d+", e):
        return True
    if re.match(r"(?is)^CASE\b.*\bEND$", e, re.S):
        branches = re.findall(
            r"(?is)\bTHEN\s+(.*?)(?=\bWHEN\b|\bELSE\b|\bEND\s*$)", e
        ) + re.findall(r"(?is)\bELSE\s+(.*?)(?=\bEND\s*$)", e)
        return bool(branches) and all(
            provably_int(b, env) for b in branches
        )
    # cast(x AS TYPE) / try_cast
    m = re.match(r"(?i)^(try_)?cast\s*\(", e)
    if m:
        close = _fwd_balanced(e, e.index("("))
        if e[close:].strip():
            return False
        inner = e[e.index("(") + 1:close - 1]
        mm = re.search(r"(?is)\bAS\s+" + _INT_TYPES + r"\s*$", inner)
        return bool(mm)
    # struct-field extraction f(name).field / name.field where the
    # source alias is a literal list of structs: prove every
    # `'field': <value>` assignment in the definition
    m = re.fullmatch(
        r"(?:[A-Za-z_]\w*\s*\(\s*)?([A-Za-z_]\w*)\s*\)?\s*\.(\w+)", e
    )
    if m and len(env) > 3 and m.group(1) in env[3]:
        defn = env[3][m.group(1)]
        vals = []
        for fm in re.finditer(r"'%s'\s*:" % re.escape(m.group(2)), defn):
            # the value runs to the next top-level ',' or '}'
            i, depth = fm.end(), 0
            while i < len(defn):
                c = defn[i]
                if c in "([{":
                    depth += 1
                elif c in ")]":
                    depth -= 1
                elif c == "}":
                    if depth == 0:
                        break
                    depth -= 1
                elif c == "," and depth == 0:
                    break
                i += 1
            vals.append(defn[fm.end():i])
        if vals and all(provably_int(v, env) for v in vals):
            return True
    # f(args) [OVER (...)]
    m = re.match(r"^([A-Za-z_]\w*)\s*\(", e)
    if m:
        close = _fwd_balanced(e, m.end() - 1)
        rest = e[close:].strip()
        if rest:
            over = re.match(r"(?is)^OVER\s*\(", rest)
            if not over:
                return False
            over_close = _fwd_balanced(rest, rest.index("("))
            if rest[over_close:].strip():
                return False
        fname = m.group(1).lower()
        args = e[m.end():close - 1]
        if fname in _INT_FUNCS:
            return True
        if fname in _PASSTHROUGH_FUNCS:
            return all(provably_int(a, env) for a in _split_top(args))
        return False
    # element extraction: name[idx]
    m = re.fullmatch(r"([A-Za-z_][\w.]*)\s*\[(.+)\]", e, re.S)
    if m:
        return m.group(1).split(".")[-1] in int_lists
    # bare (possibly qualified) identifier
    if re.fullmatch(r"[A-Za-z_][\w.]*", e):
        name = e.split(".")[-1]
        return name in int_aliases or name in KNOWN_INT_COLUMNS
    return False


_KEYWORDS = {
    "WHEN", "THEN", "ELSE", "END", "CASE", "AND", "OR", "NOT", "IN",
    "AS", "ON", "BY", "SELECT", "FROM", "WHERE", "GROUP", "ORDER",
    "HAVING", "JOIN", "USING", "WITH", "UNION", "ALL", "DISTINCT",
    "BETWEEN", "LIKE", "IS", "NULL", "ASC", "DESC", "LIMIT", "OFFSET",
    "PARTITION", "OVER", "ROWS", "RANGE", "PRECEDING", "FOLLOWING",
    "FILTER", "EXISTS", "VALUES", "RETURNING", "MATERIALIZED",
}


def _consume_primary_back(text, j):
    """One primary expression ending at j (exclusive); returns start."""
    while j > 0 and text[j - 1].isspace():
        j -= 1
    while j > 0:
        ch = text[j - 1]
        if ch == ")":
            depth = 0
            while j > 0:
                c = text[j - 1]
                if c == ")":
                    depth += 1
                elif c == "(":
                    depth -= 1
                    if depth == 0:
                        j -= 1
                        break
                j -= 1
            # function name (or OVER keyword) before the group — SQL
            # allows whitespace between the name and its paren
            k = j
            while k > 0 and text[k - 1].isspace():
                k -= 1
            k2 = k
            while k2 > 0 and (text[k2 - 1].isalnum() or text[k2 - 1] in "_$"):
                k2 -= 1
            word = text[k2:k]
            if word.upper() == "OVER":
                # keep walking: the window FUNCTION call precedes
                j = k2
                while j > 0 and text[j - 1].isspace():
                    j -= 1
                continue
            if word and word.upper() not in _KEYWORDS:
                j = k2  # function name
        elif ch.isalnum() or ch in "_$.":
            start_dot = False
            while j > 0 and (text[j - 1].isalnum() or text[j - 1] in "_$."):
                if text[j - 1] == ".":
                    start_dot = True
                j -= 1
            # leading-dot field extract: the base primary precedes
            if text[j] == "." and j > 0 and text[j - 1] in ")]":
                continue
            word = text[j:].split(".")[0]
        elif ch == "]":
            depth = 0
            while j > 0:
                c = text[j - 1]
                if c == "]":
                    depth += 1
                elif c == "[":
                    depth -= 1
                    if depth == 0:
                        j -= 1
                        break
                j -= 1
            continue  # the list base precedes the bracket
        else:
            break
        k = j
        while k > 0 and text[k - 1].isspace():
            k -= 1
        if k >= 2 and text[k - 2:k] == "::":
            j = k - 2
            continue
        break
    return j


def _operand_back(text, i, chain=False):
    """Expression ending just before i.  chain=False: one primary (the
    `//` left operand under precedence).  chain=True: consume the whole
    top-level operator chain (for alias definitions)."""
    end = i
    while end > 0 and text[end - 1].isspace():
        end -= 1
    j = _consume_primary_back(text, end)
    # CASE..END: a primary that back-scanned to just 'END'
    if text[j:end].strip().upper() == "END":
        marks = [(m.start(), m.group(1).upper())
                 for m in re.finditer(r"(?i)\b(CASE|END)\b", text[:j])]
        depth = 1
        for pos, kind in reversed(marks):
            depth += 1 if kind == "END" else -1
            if depth == 0:
                j = pos
                break
    if not chain:
        return text[j:end]
    while True:
        k = j
        while k > 0 and text[k - 1].isspace():
            k -= 1
        if k >= 2 and text[k - 2:k] == "//":
            j = _consume_primary_back(text, k - 2)
        elif k >= 1 and text[k - 1] in "+-*%/":
            j = _consume_primary_back(text, k - 1)
        else:
            break
        if j == k:
            break
    return text[j:end]


def _operand_fwd(text, i):
    n = len(text)
    while i < n and text[i].isspace():
        i += 1
    start = i
    while i < n:
        ch = text[i]
        if ch == "-" and i == start:
            i += 1
            continue
        if ch == "(":
            i = _fwd_balanced(text, i)
        elif ch.isalnum() or ch in "_$.":
            while i < n and (text[i].isalnum() or text[i] in "_$."):
                i += 1
            if i < n and text[i] == "(":
                i = _fwd_balanced(text, i)
        elif ch == "[":
            depth = 0
            while i < n:
                if text[i] == "[":
                    depth += 1
                elif text[i] == "]":
                    depth -= 1
                    if depth == 0:
                        i += 1
                        break
                i += 1
        else:
            break
        k = i
        while k < n and text[k].isspace():
            k += 1
        if text[k:k + 2] == "::":
            i = k + 2
            while i < n and text[i].isspace():
                i += 1
            continue
        if k < n and text[k] == "[":
            i = k
            continue
        break
    return text[start:i]


_LIST_DEF = re.compile(
    r"(?is)^(list_transform|list_sort|list_reverse_sort|list_filter"
    r"|range|generate_series)\s*\("
)


def _is_int_list_def(expr, env):
    e = expr.strip()
    while e.startswith("(") and _fwd_balanced(e, 0) == len(e):
        e = e[1:-1].strip()
    if re.search(r"::\s*" + _INT_TYPES + r"\s*\[\]\s*$", e, re.I):
        return True
    m = _LIST_DEF.match(e)
    if not m:
        return False
    fname = m.group(1).lower()
    if fname in ("range", "generate_series"):
        return True
    close = _fwd_balanced(e, e.index("("))
    if e[close:].strip():
        return False
    args = _split_top(e[e.index("(") + 1:close - 1])
    if fname in ("list_sort", "list_reverse_sort", "list_filter"):
        return _is_int_list_def(args[0], env)
    # list_transform(src, v -> body): prove the body (lambda params are
    # integer-assumed per the documented perimeter)
    body = args[-1]
    if "->" in body:
        body = body.split("->", 1)[1]
    return provably_int(body, env)


def _lambda_params(sql):
    return {m.group(1) for m in re.finditer(r"(\w+)\s*->", sql)}


def build_env(sql):
    defs = []
    for m in re.finditer(r"(?i)\bAS\s+([A-Za-z_]\w*)", sql):
        expr = _operand_back(sql, m.start(), chain=True)
        if expr.strip():
            defs.append((m.group(1), expr))
    ints = set(_lambda_params(sql))
    lists = set()
    dates = set()
    structs = {
        name: expr for name, expr in defs
        if re.search(r"'\w+'\s*:", expr)
    }
    for _ in range(4):
        grew = False
        env = (frozenset(ints), frozenset(lists), frozenset(dates),
               structs)
        for name, expr in defs:
            if name not in ints and provably_int(expr, env):
                ints.add(name)
                grew = True
            if name not in lists and _is_int_list_def(expr, env):
                lists.add(name)
                grew = True
            if name not in dates and provably_date(expr, env):
                dates.add(name)
                grew = True
        if not grew:
            break
    return (frozenset(ints), frozenset(lists), frozenset(dates), structs)


def scan_sql(sql):
    """All `//` operands not provably integer: [(side, operand), ...]."""
    env = build_env(sql)
    out = []
    for m in re.finditer(r"//", sql):
        left = _operand_back(sql, m.start())
        right = _operand_fwd(sql, m.end())
        if not provably_int(left, env):
            out.append(("left", " ".join(left.split())[:90]))
        if not provably_int(right, env):
            out.append(("right", " ".join(right.split())[:90]))
    return out
