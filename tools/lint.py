"""Dependency-free lint gate (flake8 subset).

The reference's `make lint` is a real flake8 gate
(/root/reference/Makefile:33-35, tox.ini: max-line-length 79). This
image ships no linter, so this tool implements the subset we actually
enforce — and delegates to flake8 when one IS importable, so richer
environments get the full reference-equivalent check with the same
config. Always exits nonzero on findings: `make lint` is a gate, not a
suggestion.

Checks (builtin mode):
  SYN   file fails to compile (syntax error)
  E501  line longer than 79 characters
  W291  trailing whitespace
  W101  hard tab in indentation
  F401  unused import (conservative: flagged only when the bound name
        never appears as a NAME token outside import statements; files
        can suppress with `# noqa` on the import line)

Usage: python tools/lint.py PATH [PATH ...]
"""

from __future__ import annotations

import ast
import io
import os
import subprocess
import sys
import tokenize

MAX_LINE = 79


def _py_files(paths):
    for p in paths:
        if os.path.isfile(p) and p.endswith(".py"):
            yield p
        elif os.path.isdir(p):
            for root, dirs, files in os.walk(p):
                dirs[:] = [d for d in dirs if d != "__pycache__"]
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


def _import_bindings(tree):
    """(lineno, bound_name) for every import binding in the module."""
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = a.asname or a.name.split(".")[0]
                out.append((node.lineno, name))
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                out.append((node.lineno, a.asname or a.name))
    return out


def _check_file(path):
    findings = []
    with open(path, "rb") as fh:
        raw = fh.read()
    try:
        text = raw.decode("utf-8")
    except UnicodeDecodeError as e:
        return [(path, 1, "SYN", f"not utf-8: {e}")]
    lines = text.splitlines()

    try:
        tree = ast.parse(text, filename=path)
    except SyntaxError as e:
        return [(path, e.lineno or 1, "SYN", f"syntax error: {e.msg}")]

    noqa = set()
    import_lines = set()
    try:
        for tok in tokenize.generate_tokens(io.StringIO(text).readline):
            if tok.type == tokenize.COMMENT and "noqa" in tok.string:
                noqa.add(tok.start[0])
    except tokenize.TokenizeError:
        pass

    for i, line in enumerate(lines, 1):
        if i in noqa:
            continue
        # URLs and long string literals are the usual offenders that the
        # reference's flake8 would also flag; no carve-outs.
        if len(line) > MAX_LINE:
            findings.append((path, i, "E501",
                             f"line too long ({len(line)} > {MAX_LINE})"))
        if line != line.rstrip():
            findings.append((path, i, "W291", "trailing whitespace"))
        stripped_len = len(line) - len(line.lstrip())
        if "\t" in line[:stripped_len]:
            findings.append((path, i, "W101", "tab in indentation"))

    # Unused imports. Collect every NAME token OUTSIDE import statement
    # lines; an import binding never mentioned there is unused.
    bindings = _import_bindings(tree)
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            end = getattr(node, "end_lineno", node.lineno)
            import_lines.update(range(node.lineno, end + 1))
    used = set()
    try:
        for tok in tokenize.generate_tokens(io.StringIO(text).readline):
            if tok.type == tokenize.NAME and tok.start[0] \
                    not in import_lines:
                used.add(tok.string)
            elif tok.type == tokenize.STRING:
                # __all__ entries / doctest references live in strings;
                # be conservative and treat string contents as usage.
                for name in {b for _, b in bindings}:
                    if name in tok.string:
                        used.add(name)
    except tokenize.TokenizeError:
        pass
    if os.path.basename(path) != "__init__.py":
        for lineno, name in bindings:
            if lineno in noqa or name == "annotations":
                continue
            if name not in used:
                findings.append((path, lineno, "F401",
                                 f"'{name}' imported but unused"))
    return findings


def main(argv):
    paths = argv or ["pivp_tpu", "tests", "tools", "bench.py",
                     "__graft_entry__.py"]
    # Prefer the real reference-equivalent linter when the environment
    # has one; tox.ini-style config is passed explicitly.
    try:
        import flake8  # noqa: F401
        rc = subprocess.call(
            [sys.executable, "-m", "flake8", "--max-line-length",
             str(MAX_LINE), "--max-complexity", "10", *paths])
        return rc
    except ImportError:
        pass

    all_findings = []
    for f in _py_files(paths):
        all_findings.extend(_check_file(f))
    for path, lineno, code, msg in all_findings:
        print(f"{path}:{lineno}: {code} {msg}")
    if all_findings:
        print(f"lint: {len(all_findings)} finding(s)", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
