"""GOQL → Catalyst Column translator (P1).

The reference compiles GOQL to a native matcher in libgeodesk (compile
call site /root/reference/src/gol/QueryCommand.cpp:105, example queries
/root/reference/test/test_query.py:27-31, negative-clause semantics fix
/root/reference/doc/releases/v2.2.3.md).  We translate the same grammar
subset to a single Column expression over (ftype, is_area, tags) —
Catalyst then folds it into the scan filter.

Grammar:
    query    := selector (',' selector)*           -- union
    selector := types clause*                      -- conjunction
    types    := '*' | [nwar]+
    clause   := '[' '!' key ']'                    -- key absent
              | '[' key ']'                        -- key present
              | '[' key op value ']'
    key      := bare ([A-Za-z0-9_:]+) | "'...'" | '"..."' (quoted)
    op       := '=' | '!=' | '~' | '!~' | '>' | '>=' | '<' | '<='
    value    := "'...'" | '"..."' | bare (with '*' wildcards for =/!=);
                '='/'!=' accept a comma list (v1,v2) = any-of / none-of;
                '~'/'!~' take a regex, matched against the FULL value

Semantics (matching the reference):
    n=node, w=linear way, a=area (closed way or area relation),
    r=non-area relation; [k!=v] matches when k is absent OR differs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEL_RE = re.compile(r"^\s*(\*|[nwar]+)")
_CLAUSE_RE = re.compile(
    r"\[\s*(!?)\s*('[^']*'|\"[^\"]*\"|[A-Za-z0-9_:]+)"
    r"\s*(?:(!=|!~|>=|<=|=|~|>|<)\s*('[^']*'|\"[^\"]*\"|[^\]]*?))?\s*\]"
)


class GoqlError(ValueError):
    pass


def _split_selectors(q: str) -> list[str]:
    """Split on top-level commas — quote-aware: brackets and commas
    inside '...'/"..." are literal text (a value like "a],b" must not
    break the selector structure)."""
    parts, depth, cur = [], 0, []
    quote = None
    for ch in q:
        if quote is not None:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0 and quote is None:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _type_col(types: str) -> Column:
    if types == "*":
        return F.lit(True)
    alts = []
    for t in types:
        if t == "n":
            alts.append(F.col("ftype") == 0)
        elif t == "w":
            alts.append((F.col("ftype") == 1) & ~F.col("is_area"))
        elif t == "a":
            alts.append(F.col("is_area"))
        elif t == "r":
            alts.append((F.col("ftype") == 2) & ~F.col("is_area"))
        else:  # pragma: no cover
            raise GoqlError(f"bad type letter {t!r}")
    out = alts[0]
    for a in alts[1:]:
        out = out | a
    return out


def _unquote(v: str) -> tuple[str, bool]:
    v = v.strip()
    if len(v) >= 2 and v[0] in "'\"" and v[-1] == v[0]:
        return v[1:-1], True
    # a BARE token containing a quote is a malformed quoted value the
    # regex backtracked into (e.g. [k='a'b] → raw "'a'b"): reject loudly
    # like the reference's parser instead of matching a literal-with-
    # quotes that can never occur in tag data
    if "'" in v or '"' in v:
        raise GoqlError(f"malformed quoted value: {v!r}")
    return v, False


def _split_values(raw: str) -> list[str]:
    """Comma-separated value alternatives, commas inside quotes kept."""
    out, cur, quote = [], [], ""
    for ch in raw:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = ""
        elif ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == ",":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [v for v in (x.strip() for x in out) if v]


_NUM_LITERAL_RE = re.compile(r"-?\d+(?:\.\d+)?")


def _leading_num(tag: Column) -> Column:
    """The value's leading number as double ('50 mph' → 50.0; '50' →
    50.0; 'walk' → NULL).  regexp_extract yields '' on no match and
    try_cast('') is NULL, so non-numeric values drop out of every
    numeric clause."""
    return F.regexp_extract(
        tag, r"^\s*(-?\d+(?:\.\d+)?)", 1
    ).try_cast("double")


def _value_clause(key: str, op: str, raw: str) -> Column:
    tag = F.col("tags").getItem(key)
    if op in ("~", "!~"):
        # regex match over the full value (GOQL ~); dialect is the
        # engine's (Java) — keep patterns in the portable common subset
        pat, _ = _unquote(raw)
        pos = tag.rlike(f"^(?:{pat})$")
        if op == "~":
            return tag.isNotNull() & pos
        return tag.isNull() | ~pos
    if op in ("=", "!="):
        alts = []
        for item in _split_values(raw):
            val, quoted = _unquote(item)
            if not quoted and _NUM_LITERAL_RE.fullmatch(val):
                # unquoted numeric comparand compares NUMERICALLY against
                # the value's leading number, so [maxspeed=50] matches
                # '50', '50.0' and '50 mph' (unit-suffixed OSM values;
                # GOQL spec "Using numbers in queries" — quoted '50'
                # stays string-exact).  coalesce(False): a non-numeric
                # value is a definite non-match, never a null that would
                # poison a NOT over a value list.
                alts.append(F.coalesce(
                    _leading_num(tag) == float(val), F.lit(False)
                ))
            elif not quoted and "*" in val:
                pat = val.replace("%", r"\%").replace("_", r"\_").replace("*", "%")
                alts.append(tag.like(pat))
            else:
                alts.append(tag == F.lit(val))
        if not alts:
            raise GoqlError(f"empty value in [{key}{op}]")
        pos = alts[0]
        for a in alts[1:]:
            pos = pos | a
        if op == "=":
            return tag.isNotNull() & pos
        # negative clause: absent key also matches (v2.2.3.md semantics)
        return tag.isNull() | ~pos
    # numeric comparison: values compare by their LEADING number ('50
    # mph' → 50), so unit-suffixed OSM values participate; values with
    # no leading number ('walk') never match
    val, _ = _unquote(raw)
    num = _leading_num(tag)
    try:
        fval = float(val)
    except ValueError as e:
        raise GoqlError(f"non-numeric comparand in [{key}{op}{raw}]") from e
    return {
        ">": num > fval,
        ">=": num >= fval,
        "<": num < fval,
        "<=": num <= fval,
    }[op]


def _selector_col(sel: str) -> Column:
    m = _SEL_RE.match(sel)
    if not m:
        raise GoqlError(f"selector must start with types: {sel!r}")
    cond = _type_col(m.group(1))
    rest = sel[m.end():].strip()
    matched_len = 0
    for cm in _CLAUSE_RE.finditer(rest):
        bang, key, op, raw = cm.groups()
        key, _ = _unquote(key)  # quoted keys: ["addr:street"]
        tag = F.col("tags").getItem(key)
        if bang:
            if op:
                raise GoqlError(f"[!{key}] cannot carry an operator")
            clause = tag.isNull()
        elif not op:
            clause = tag.isNotNull()
        else:
            clause = _value_clause(key, op, raw)
        cond = cond & clause
        matched_len += len(re.sub(r"\s", "", cm.group(0)))
    if len(re.sub(r"\s", "", rest)) != matched_len:
        raise GoqlError(f"unparsed clause text in {sel!r}")
    return cond


def goql_to_column(query: str) -> Column:
    """Compile a GOQL query to a Column over (ftype, is_area, tags)."""
    sels = _split_selectors(query)
    if not sels:
        raise GoqlError("empty query")
    out = _selector_col(sels[0])
    for s in sels[1:]:
        out = out | _selector_col(s)
    return out
