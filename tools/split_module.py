#!/usr/bin/env python
"""One-shot refactoring tool (r7): split a flat operator module into a
package of contiguous-line-range submodules with identical behavior.

- Parts are CONTIGUOUS LINE RANGES of the original file (comments and
  blank lines travel with their following node), so no operator body
  changes — only module plumbing.
- Each later part gets explicit `from .<earlier> import (...)` lines for
  every top-level name it references that an earlier part defines.
- The package __init__ re-imports EVERY top-level name (including
  underscored helpers — tests import several) in original part order, so
  `sparkgraft.<mod>.<name>` keeps resolving and @query registration
  order is unchanged.

Usage: python tools/split_module.py sparkgraft/textops.py \
           corpus:1 quality:1422 models:3112
(each arg is `partname:first_line`; the first must start at line 1).
"""

from __future__ import annotations

import ast
import os
import sys


def top_level_names(nodes) -> list[str]:
    names: list[str] = []
    for n in nodes:
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.append(n.name)
        elif isinstance(n, ast.Assign):
            names.extend(t.id for t in n.targets if isinstance(t, ast.Name))
        elif isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name):
            names.append(n.target.id)
        elif isinstance(n, (ast.If, ast.Try, ast.With)):
            raise SystemExit(f"unsupported top-level block at line {n.lineno}")
    return names


def main() -> int:
    src_path = sys.argv[1]
    parts = [(a.split(":")[0], int(a.split(":")[1])) for a in sys.argv[2:]]
    assert parts[0][1] == 1
    src = open(src_path).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # Header: module docstring + every top-level import (all at the head
    # of both target files — asserted).
    import_nodes = [n for n in tree.body
                    if isinstance(n, (ast.Import, ast.ImportFrom))]
    header_end = max(n.end_lineno for n in import_nodes)
    body_nodes = [n for n in tree.body
                  if not isinstance(n, (ast.Import, ast.ImportFrom))]
    doc_node = body_nodes[0]
    assert isinstance(doc_node, ast.Expr), "expected module docstring first"
    body_nodes = body_nodes[1:]
    assert all(n.lineno > header_end for n in body_nodes), \
        "imports must all precede the first definition"
    # imports only — the original docstring moves to the package __init__;
    # package-relative imports gain one level (the parts live one deeper)
    header_lines = "".join(
        ln.replace("from .", "from ..", 1)
        if ln.lstrip().startswith("from .") and not ln.lstrip().startswith("from ..")
        else ln
        for ln in lines[doc_node.end_lineno:header_end]
    )

    imported_names: set[str] = set()
    for n in import_nodes:
        for a in n.names:
            imported_names.add((a.asname or a.name).split(".")[0])

    cuts = [p[1] for p in parts[1:]] + [len(lines) + 1]
    part_nodes: list[list[ast.stmt]] = [[] for _ in parts]
    for n in body_nodes:
        start = min([n.lineno] + [d.lineno for d in
                                  getattr(n, "decorator_list", [])])
        idx = sum(1 for c in cuts[:-1] if start >= c)
        part_nodes[idx].append(n)
    for (name, first), nodes in zip(parts, part_nodes):
        assert nodes, f"part {name} is empty"

    defined_per_part = [top_level_names(ns) for ns in part_nodes]
    flat = [x for d in defined_per_part for x in d]
    dup = {x for x in flat if flat.count(x) > 1}
    assert not dup, f"duplicate top-level names across parts: {dup}"

    pkg_dir = src_path[:-3]
    os.makedirs(pkg_dir, exist_ok=False)
    mod = os.path.basename(pkg_dir)

    for i, ((name, first), nodes) in enumerate(zip(parts, part_nodes)):
        start_line = (header_end + 1) if i == 0 else parts[i][1]
        end_line = cuts[i] - 1 if i < len(parts) - 1 else len(lines)
        part_names = {p[0] for p in parts}
        body_lines = []
        for ln in lines[start_line - 1:end_line]:
            s = ln.lstrip()
            # function-local package-relative imports also gain a level
            # (targets are sibling modules of the parent package, never
            # the new part modules)
            if (s.startswith("from .") and not s.startswith("from ..")
                    and s.split(".", 1)[1].split(" ")[0] not in part_names):
                ln = ln.replace("from .", "from ..", 1)
            body_lines.append(ln)
        body = "".join(body_lines)
        refs = set()
        for n in nodes:
            refs |= {x.id for x in ast.walk(n)
                     if isinstance(x, ast.Name) and isinstance(x.ctx, ast.Load)}
        cross = []
        for j in range(i):
            need = sorted(set(defined_per_part[j]) & refs
                          - set(defined_per_part[i]) - imported_names)
            if need:
                cross.append(
                    f"from .{parts[j][0]} import (  # noqa: F401\n    "
                    + ",\n    ".join(need) + ",\n)\n")
        doc = (f'"""{mod}.{name} — split from the flat {mod}.py (r7); '
               f'operator bodies unchanged, see the package __init__."""\n')
        with open(os.path.join(pkg_dir, f"{name}.py"), "w") as fh:
            fh.write(doc + "\n" + header_lines + "\n" + "".join(cross)
                     + "\n" + body)

    init = [f'"""{ast.get_docstring(tree)}\n\nSplit into '
            f'{", ".join(p[0] for p in parts)} submodules in r7 '
            '(single-file scan cost dominated maintenance at ~100 keys); '
            'every top-level name re-exports here, so external imports '
            'and the @query registration order are unchanged."""\n\n'
            'from __future__ import annotations\n']
    for (name, _), defined in zip(parts, defined_per_part):
        init.append(
            f"from .{name} import (  # noqa: F401\n    "
            + ",\n    ".join(defined) + ",\n)\n")
    with open(os.path.join(pkg_dir, "__init__.py"), "w") as fh:
        fh.write("\n".join(init))
    os.remove(src_path)
    print(f"split {src_path} -> {pkg_dir}/ "
          f"{[p[0] for p in parts]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
