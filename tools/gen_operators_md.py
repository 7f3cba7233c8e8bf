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
    rows = []
    for name, fn in qs.items():
        try:
            s = inspect.getsource(fn)
        except (OSError, TypeError):
            s = ""
        m = re.search(r"from (rse_ray[\w.]*) import ([\w, ]+)", s)
        mod, funcs = (m.group(1), m.group(2).strip()) if m else ("", "")
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
