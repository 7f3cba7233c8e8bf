"""Regenerate docs/OPERATORS.md from the live queries()/oracle_sql()
registries: python tools/gen_operators_md.py"""
from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import __ray_entry__ as e

    qs = e.queries()
    oracled = set(qs) & set(e.oracle_sql())
    def imports_of(s: str):
        # both import forms: bare names and parenthesized multi-line
        m = re.search(
            r"from (rse_ray[\w.]*) import (?:\(([^)]*)\)|([\w, ]+))", s)
        if not m:
            return None
        return m.group(1), " ".join((m.group(2) or m.group(3)).split())

    rows = []
    for name, fn in qs.items():
        try:
            s = inspect.getsource(fn)
        except (OSError, TypeError):
            s = ""
        got = imports_of(s)
        if got is None:
            # the pipeline import may live in a shared module-level
            # helper (e.g. the memoized minhash pair list) — follow
            # every entry-module helper the query body calls, one level
            for helper in re.findall(r"\b(_[a-z][\w]*)\(", s):
                h = getattr(e, helper, None)
                if h is None or not callable(h):
                    continue
                try:
                    got = imports_of(inspect.getsource(h))
                except (OSError, TypeError):
                    got = None
                if got:
                    break
        mod, funcs = got if got else ("", "")
        rows.append((name, mod, funcs))
    lines = [
        "# OPERATORS.md — queries() inventory (auto-generated)", "",
        f"{len(qs)} pipelines; {len(oracled)} DuckDB-oracled (the rest "
        "are pytest-oracled approximate/iterative paths).", "",
        "| query | pipeline | oracle |", "|---|---|---|"]
    for name, mod, funcs in sorted(rows):
        o = "SQL" if name in oracled else "pytest"
        lines.append(f"| `{name}` | `{mod}`: {funcs} | {o} |")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "OPERATORS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(rows)} rows")


if __name__ == "__main__":
    main()
