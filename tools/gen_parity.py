"""Regenerate the expression-operator table in PARITY.md.

Walks the op registry (`plans/ops.py`), locates each op's declaration
line, and checks whether the op is exercised by an oracle query in
`__spark_entry__.py` and by which test files.  Usage:

    python tools/gen_parity.py        # prints the markdown table
"""

from __future__ import annotations

import glob
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pydiverse_transform_spark.plans.ops import REGISTRY  # noqa: E402

# symbol-operator spellings as they appear in pipeline code
SYM = {
    "add": " + ", "sub": " - ", "mul": " * ", "truediv": " / ",
    "floordiv": " // ", "mod": " % ", "eq": " == ", "ne": " != ",
    "lt": " < ", "le": " <= ", "gt": " > ", "ge": " >= ",
    "bool_and": " & ", "bool_or": " | ", "bool_xor": " ^ ",
    "bool_invert": "~", "neg": "-(", "pos": "+(", "pow": "**",
}


def main():
    entry = open(os.path.join(ROOT, "__spark_entry__.py")).read()
    tests = {
        os.path.basename(f): open(f).read()
        for f in glob.glob(os.path.join(ROOT, "tests", "*.py"))
    }
    opssrc = open(os.path.join(
        ROOT, "pydiverse_transform_spark", "plans", "ops.py")).read()
    opslines = opssrc.splitlines()

    def find_line(op: str):
        for i, ln in enumerate(opslines, 1):
            if f'"{op}"' in ln:
                return i
        return None

    def where(op: str):
        if op in SYM:
            pats = [SYM[op]]
        else:
            tok = op
            for pre in ("str_", "dt_", "dur_", "list_", "h_"):
                if op.startswith(pre):
                    tok = op[len(pre):]
                    break
            pats = [f".{tok}(", f"pdt.{tok}("]
        in_entry = any(p in entry for p in pats)
        tfiles = sorted(n for n, s in tests.items()
                        if any(p in s for p in pats))
        return in_entry, tfiles

    print("| op | ftype | impl (plans/ops.py) | oracle query | tests |")
    print("|---|---|---|---|---|")
    for op in sorted(REGISTRY):
        meta = REGISTRY[op]
        in_entry, tfiles = where(op)
        tshow = ", ".join(tfiles[:2]) or "—"
        print(f"| `{op}` | {meta.ftype} | :{find_line(op)} "
              f"| {'yes' if in_entry else '—'} | {tshow} |")


if __name__ == "__main__":
    main()
