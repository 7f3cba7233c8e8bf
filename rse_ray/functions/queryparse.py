"""Boolean query DSL parser: TERM / AND / OR / NOT / parentheses.

The reference exposes bag-of-words OR retrieval (api/main.go:131-145:
``WHERE pk.word = ANY($1)``); this is the compositional query language
layered on the same tokenize contract, with standard precedence
NOT > AND > OR and left association:

    or   := and (OR and)*
    and  := not (AND not)*
    not  := NOT not | atom
    atom := '(' or ')' | TERM

Operators are case-SENSITIVE uppercase keywords (so lowercase "and"
is a search term, the Lucene classic-parser convention); terms are
normalized through the repo tokenizer (lower, optional Porter stem).
The AST is plain tuples — ("term", t), ("and", [..]), ("or", [..]),
("not", node) — evaluated vectorized over per-doc presence arrays in
rse_ray.pipelines.text.bool_query_match.
"""

from __future__ import annotations


class QueryParseError(ValueError):
    pass


def _lex(s: str) -> list[str]:
    out: list[str] = []
    cur = []
    for ch in s:
        if ch in "()":
            if cur:
                out.append("".join(cur))
                cur = []
            out.append(ch)
        elif ch.isspace():
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def parse(s: str, *, stem: bool = False):
    """Parse a query string into the tuple AST; raises
    QueryParseError on malformed input (dangling operator, unbalanced
    parens, empty query)."""
    from rse_ray.functions.tokenizer import tokenize

    toks = _lex(s)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def p_or():
        parts = [p_and()]
        while peek() == "OR":
            take()
            parts.append(p_and())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def p_and():
        parts = [p_not()]
        while peek() == "AND":
            take()
            parts.append(p_not())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def p_not():
        if peek() == "NOT":
            take()
            return ("not", p_not())
        return p_atom()

    def p_atom():
        t = peek()
        if t is None or t in ("AND", "OR", "NOT", ")"):
            raise QueryParseError(f"expected term or '(' at {pos}")
        if t == "(":
            take()
            node = p_or()
            if peek() != ")":
                raise QueryParseError("unbalanced parenthesis")
            take()
            return node
        take()
        norm = tokenize(t, stem=stem)
        if not norm:
            raise QueryParseError(f"term {t!r} normalizes to nothing")
        return ("term", norm[0])

    node = p_or()
    if pos != len(toks):
        raise QueryParseError(f"trailing input at token {pos}")
    return node


def query_terms(node) -> set[str]:
    """All distinct terms referenced by an AST."""
    kind = node[0]
    if kind == "term":
        return {node[1]}
    if kind == "not":
        return query_terms(node[1])
    out: set[str] = set()
    for child in node[1]:
        out |= query_terms(child)
    return out
