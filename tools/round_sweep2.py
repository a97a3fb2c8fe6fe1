#!/usr/bin/env python3
"""r7 follow-up sweep: the plain floor spelling from round_sweep.py broke
NaN/Infinity cross-engine parity (Spark floor(double) -> BIGINT turns
NaN into 0 and +Inf into Long.MaxValue; DuckDB floor keeps them), which
the old ROUND built-in passed through identically. Upgrade every
display-rounding site

    CAST(floor(W * 1e<n> + 0.5) AS DOUBLE) / 1e<n>

to the guarded form (the CANONICAL Qutil.rScale spelling — the huge-
finite guard is >= 9e12, not an Infinity equality: Spark floor(double)
SATURATES at Long.MaxValue for any finite value past ~9.22e12 while
DuckDB keeps doubles, so an Infinity-only guard still diverges on huge
finites; above 9e12 the double grid is coarser than 1e-3 anyway, so
display rounding is meaningless there)

    (CASE WHEN isnan(W) OR abs(W) >= 9e12
          THEN CAST(W AS DOUBLE)
          ELSE CAST(floor(W * 1e<n> + 0.5) AS DOUBLE) / 1e<n> END)

valid in both dialects; NULL still propagates through the ELSE arm.
Integer-quantization floors (… AS BIGINT) do not match the tail pattern
and are untouched. Usage: round_sweep2.py [--apply] file...
"""
import re
import sys

ANCHOR = 'CAST(floor('
TAIL_IN = re.compile(r'\*\s*1e(\d+)\s*\+\s*0\.5\s*$')


def find_matching(text, start):
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


def convert(text, path):
    out = []
    pos = 0
    n_conv = 0
    while True:
        m = text.find(ANCHOR, pos)
        if m < 0:
            out.append(text[pos:])
            break
        inner_start = m + len(ANCHOR)
        # idempotency: a site already inside the guarded CASE's ELSE arm
        # must not be wrapped again
        if text[max(0, m - 5):m] == 'ELSE ':
            out.append(text[pos:inner_start])
            pos = inner_start
            continue
        close = find_matching(text, inner_start)
        inner = text[inner_start:close]
        tail_m = TAIL_IN.search(inner)
        if not tail_m:
            # advance past the anchor only, NOT past its closing paren —
            # a nested display-rounding site inside a non-matching outer
            # CAST(floor( (e.g. an integer-quantization wrapper) must
            # still be scanned
            out.append(text[pos:inner_start])
            pos = inner_start
            continue
        scale = int(tail_m.group(1))
        w = inner[:tail_m.start()].strip()
        # after floor's close paren expect: " AS DOUBLE) / 1e<n>"
        after = text[close + 1:]
        after_m = re.match(r'\s*AS DOUBLE\)\s*/\s*1e(\d+)', after)
        if not after_m or int(after_m.group(1)) != scale:
            out.append(text[pos:inner_start])
            pos = inner_start
            continue
        end = close + 1 + after_m.end()
        line_no = text.count('\n', 0, m) + 1
        print(f"--- {path}:{line_no} scale={scale} W={w[:80]}")
        repl = (f"(CASE WHEN isnan({w}) OR abs({w}) >= 9e12 "
                f"THEN CAST({w} AS DOUBLE) "
                f"ELSE CAST(floor({w} * 1e{scale} + 0.5) AS DOUBLE) / 1e{scale} END)")
        out.append(text[pos:m])
        out.append(repl)
        pos = end
        n_conv += 1
    return ''.join(out), n_conv


def main():
    apply_ = '--apply' in sys.argv
    files = [a for a in sys.argv[1:] if not a.startswith('--')]
    total = 0
    for path in files:
        with open(path) as f:
            text = f.read()
        new, n = convert(text, path)
        total += n
        if apply_ and n:
            with open(path, 'w') as f:
                f.write(new)
    print(f"\n== {total} conversions{' APPLIED' if apply_ else ' (dry run)'} ==")


if __name__ == '__main__':
    main()
