"""First-party lint: AST checks + style checks that run with zero deps.

The reference CI runs mypy + pylint + black (reference Makefile `lint:`
target).  This image has no network egress and none of those tools, so
`make lint` layers three things:

1. this module — always runs, pure stdlib;
2. `python -m compileall` + an import-walk of the package — always runs;
3. `mypy` / `black --check` — run when installed (any dev machine with
   egress), skipped with a notice here.

Checks implemented (each one chosen because it is a *real* defect class
pylint would flag, and verifiable without type inference):

- W001 unused import (module scope; `__init__.py` re-exports and
  `import x as x` aliases are exempt, matching pylint's convention)
- W002 mutable default argument (list/dict/set literal or call)
- W003 bare `except:` (pylint W0702)
- W004 f-string with no placeholders (pylint W1309)
- W005 comparison to None/True/False with ==/!= (pylint C0121)
- W006 assert on a non-empty tuple — always true (pylint W0199)
- W007 function/class redefined in the same scope without decoration
- S101 line longer than 120 characters (black's -l 120 contract from the
  reference Makefile)
- S102 trailing whitespace
- S103 tab indentation
- S104 missing newline at end of file
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 120


def _is_reexport(name: str, node: ast.AST) -> bool:
    """`import x as x` / `from m import x as x` mark intentional re-export."""
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        for alias in node.names:
            if alias.asname and alias.asname == alias.name.split(".")[-1]:
                if alias.asname == name:
                    return True
    return False


class _Visitor(ast.NodeVisitor):
    def __init__(self, path: Path, is_init: bool):
        self.path = path
        self.is_init = is_init
        self.problems: list[tuple[int, str, str]] = []
        # name -> (lineno, node) for module-scope imports
        self.imports: dict[str, tuple[int, ast.AST]] = {}
        self.used: set[str] = set()
        self.scope_defs: list[dict[str, int]] = [{}]

    def err(self, node: ast.AST, code: str, msg: str):
        self.problems.append((node.lineno, code, msg))

    # --- imports / usage -------------------------------------------------
    def visit_Import(self, node: ast.Import):
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            self.imports[name] = (node.lineno, node)

    def visit_ImportFrom(self, node: ast.ImportFrom):
        if node.module == "__future__":
            return
        for alias in node.names:
            if alias.name == "*":
                continue
            name = alias.asname or alias.name
            self.imports[name] = (node.lineno, node)

    def visit_Name(self, node: ast.Name):
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute):
        # record the root name of dotted access (np.foo -> np)
        n = node
        while isinstance(n, ast.Attribute):
            n = n.value
        if isinstance(n, ast.Name):
            self.used.add(n.id)
        self.generic_visit(node)

    # --- defect checks ----------------------------------------------------
    def _check_def(self, node):
        scope = self.scope_defs[-1]
        if node.name in scope and not getattr(node, "decorator_list", None):
            prev = scope[node.name]
            self.err(
                node, "W007",
                f"`{node.name}` redefined (first defined line {prev})",
            )
        scope[node.name] = node.lineno
        # mutable defaults
        args = getattr(node, "args", None)
        if args is not None:
            for d in list(args.defaults) + [
                d for d in args.kw_defaults if d is not None
            ]:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    self.err(node, "W002", f"mutable default in `{node.name}`")
        self.scope_defs.append({})
        self.generic_visit(node)
        self.scope_defs.pop()

    def visit_FunctionDef(self, node):
        self._check_def(node)

    def visit_AsyncFunctionDef(self, node):
        self._check_def(node)

    def visit_ClassDef(self, node):
        scope = self.scope_defs[-1]
        if node.name in scope and not node.decorator_list:
            self.err(node, "W007", f"`{node.name}` redefined")
        scope[node.name] = node.lineno
        self.scope_defs.append({})
        self.generic_visit(node)
        self.scope_defs.pop()

    def visit_ExceptHandler(self, node):
        if node.type is None:
            self.err(node, "W003", "bare `except:` — name the exception")
        self.generic_visit(node)

    def visit_JoinedStr(self, node):
        if not any(isinstance(v, ast.FormattedValue) for v in node.values):
            self.err(node, "W004", "f-string without placeholders")
        for v in node.values:
            self.visit(v)

    def visit_FormattedValue(self, node):
        # do NOT recurse into node.format_spec: a format spec like ':0.4f'
        # is itself a JoinedStr with no FormattedValue children and would
        # falsely trip W004 on the enclosing (real) f-string
        self.visit(node.value)

    def visit_Compare(self, node):
        for op, comp in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Eq, ast.NotEq)) and (
                isinstance(comp, ast.Constant)
                and comp.value in (None, True, False)
                and not isinstance(comp.value, (int, float))  # keep ==0/==1
                or isinstance(comp, ast.Constant) and comp.value is None
            ):
                what = repr(comp.value)
                self.err(
                    node, "W005",
                    f"comparison to {what} with ==/!= — use `is`/`is not`",
                )
        self.generic_visit(node)

    def visit_Assert(self, node):
        if isinstance(node.test, ast.Tuple) and node.test.elts:
            self.err(node, "W006", "assert on a tuple is always true")
        self.generic_visit(node)

    # --- finish -----------------------------------------------------------
    def finish(self, tree: ast.Module, source: str):
        if not self.is_init:
            # names used inside string annotations / __all__ count as used
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Assign)
                    and any(
                        isinstance(t, ast.Name) and t.id == "__all__"
                        for t in node.targets
                    )
                    and isinstance(node.value, (ast.List, ast.Tuple))
                ):
                    for elt in node.value.elts:
                        if isinstance(elt, ast.Constant):
                            self.used.add(str(elt.value))
            for name, (lineno, node) in self.imports.items():
                if name in self.used or _is_reexport(name, node):
                    continue
                if name.startswith("_"):
                    continue
                # a bare name appearing anywhere in the source besides the
                # import line keeps it (docstring doctest, typing string)
                if any(
                    name in line
                    for i, line in enumerate(source.splitlines(), 1)
                    if i != lineno
                ):
                    continue
                self.problems.append(
                    (lineno, "W001", f"unused import `{name}`")
                )


def _style(path: Path, source: str) -> list[tuple[int, str, str]]:
    problems = []
    lines = source.splitlines()
    for i, line in enumerate(lines, 1):
        if len(line) > MAX_LINE:
            problems.append((i, "S101", f"line length {len(line)} > {MAX_LINE}"))
        if line != line.rstrip():
            problems.append((i, "S102", "trailing whitespace"))
        stripped_prefix = line[: len(line) - len(line.lstrip())]
        if "\t" in stripped_prefix:
            problems.append((i, "S103", "tab indentation"))
    if source and not source.endswith("\n"):
        problems.append((len(lines), "S104", "no newline at end of file"))
    return problems


def lint_file(path: Path) -> list[str]:
    source = path.read_text()
    out = []
    try:
        tree = ast.parse(source, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]
    v = _Visitor(path, is_init=path.name == "__init__.py")
    v.visit(tree)
    v.finish(tree, source)
    for lineno, code, msg in sorted(v.problems + _style(path, source)):
        out.append(f"{path}:{lineno}: {code} {msg}")
    return out


def main(argv: list[str]) -> int:
    roots = [Path(a) for a in argv] or [Path("clip_retrieval_tpu")]
    files: list[Path] = []
    for r in roots:
        files.extend(sorted(r.rglob("*.py")) if r.is_dir() else [r])
    problems = []
    for f in files:
        problems.extend(lint_file(f))
    for p in problems:
        print(p)
    print(
        f"lint: {len(files)} files, {len(problems)} problems",
        file=sys.stderr,
    )
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
