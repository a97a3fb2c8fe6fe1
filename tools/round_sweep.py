#!/usr/bin/env python3
"""One-shot r7 sweep: convert SQL ROUND(expr, n) built-ins in the query
catalog's oracle/shared-formula strings to the pure-IEEE half-up spelling
  (CAST(floor((expr) * 1e<n> + 0.5) AS DOUBLE) / 1e<n>)
which is bit-identical across Spark and DuckDB for the same input bits —
the engine ROUND built-in is not (r6 verdict: embed_covariance diverged
between two DuckDB environments on a representational boundary).

Operates on raw .scala text; the balanced-paren match spans Scala string
concatenation ("..." + "...") safely because the inserted head replaces
`ROUND(` and the inserted tail replaces `, n)` — everything between stays
verbatim, so each insertion lands inside the literal its anchor was in.

Usage: round_sweep.py [--apply] file...
Without --apply, prints every proposed conversion for review.
"""
import re
import sys


def find_matching(text, start):
    """start = index just after the opening '('. Returns index of the
    matching ')' — counts parens anywhere (string-literal boundaries in
    the Scala source carry no parens in these files)."""
    depth = 1
    i = start
    while i < len(text):
        c = text[i]
        if c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError(f"unbalanced parens from {start}")


def split_scale(inner):
    """Split 'expr, n' at the LAST top-level comma; n must be a bare
    integer literal. Returns (expr, n) or None."""
    depth = 0
    last = -1
    for i, c in enumerate(inner):
        if c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
        elif c == ',' and depth == 0:
            last = i
    if last < 0:
        return None
    expr, scale = inner[:last], inner[last + 1:].strip()
    if not re.fullmatch(r'\d+', scale):
        return None
    return expr, int(scale)


def convert(text, path, apply_):
    out = []
    pos = 0
    n_conv = 0
    skipped = []
    while True:
        m = text.find('ROUND(', pos)
        if m < 0:
            out.append(text[pos:])
            break
        close = find_matching(text, m + len('ROUND('))
        inner = text[m + len('ROUND('):close]
        parsed = split_scale(inner)
        if parsed is None:
            skipped.append((path, m, inner[:60]))
            out.append(text[pos:close + 1])
            pos = close + 1
            continue
        expr, scale = parsed
        repl = (f"(CAST(floor(({expr.strip()}) * 1e{scale} + 0.5) "
                f"AS DOUBLE) / 1e{scale})")
        line_no = text.count('\n', 0, m) + 1
        print(f"--- {path}:{line_no} scale={scale}")
        print(f"  ROUND({inner.strip()[:120]}{'...' if len(inner) > 120 else ''})")
        out.append(text[pos:m])
        out.append(repl)
        pos = close + 1
        n_conv += 1
    return ''.join(out), n_conv, skipped


def main():
    apply_ = '--apply' in sys.argv
    files = [a for a in sys.argv[1:] if not a.startswith('--')]
    total = 0
    all_skipped = []
    for path in files:
        with open(path) as f:
            text = f.read()
        new, n, skipped = convert(text, path, apply_)
        all_skipped.extend(skipped)
        total += n
        if apply_ and n:
            with open(path, 'w') as f:
                f.write(new)
    print(f"\n== {total} conversions{' APPLIED' if apply_ else ' (dry run)'} ==")
    for path, off, inner in all_skipped:
        print(f"SKIPPED (non-literal scale): {path} @{off}: {inner}")


if __name__ == '__main__':
    main()
