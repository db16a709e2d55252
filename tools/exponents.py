"""Per-query scaling exponents from the committed bench artifacts.

Joins ``BENCH_LOCAL_sf0.1.json`` and ``BENCH_LOCAL_sf1.json`` (and the
matching ``ORACLE_TIMINGS_*`` pair when present) and prints a markdown
table of exponents — ``exp = log10(t_sf1 / t_sf0.1)`` over the one
measured decade, so exp 1.0 = linear in data size, < 1 = sublinear
(fixed per-round/JVM floors amortizing), > 1 = superlinear (a
scale-killer candidate; anything > 1.3 needs an explanation or a fix in
PLAN_AUDIT.md).

Floors: a query whose BOTH timings sit under ``--floor`` seconds
(default 1.0) is orchestration noise, not plan signal — its exponent is
reported but excluded from the superlinearity flag list.

Usage: python tools/exponents.py [--floor 1.0] [--flag 1.3]
"""

from __future__ import annotations

import json
import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str) -> dict[str, float]:
    path = os.path.join(ROOT, name)
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        return json.load(fh)["queries"]


def main() -> None:
    floor = 1.0
    flag_at = 1.3
    if "--floor" in sys.argv:
        floor = float(sys.argv[sys.argv.index("--floor") + 1])
    if "--flag" in sys.argv:
        flag_at = float(sys.argv[sys.argv.index("--flag") + 1])

    e01 = _load("BENCH_LOCAL_sf0.1.json")
    e1 = _load("BENCH_LOCAL_sf1.json")
    e10 = _load("BENCH_LOCAL_sf10.json")  # engine-only second decade
    o01 = _load("ORACLE_TIMINGS_sf0.1.json")
    o1 = _load("ORACLE_TIMINGS_sf1.json")

    rows = []
    for n in sorted(set(e01) & set(e1)):
        exp = math.log10(max(e1[n], 1e-4) / max(e01[n], 1e-4))
        oexp = (
            math.log10(max(o1[n], 1e-4) / max(o01[n], 1e-4))
            if n in o01 and n in o1
            else None
        )
        exp2 = (
            math.log10(max(e10[n], 1e-4) / max(e1[n], 1e-4))
            if n in e10
            else None
        )
        rows.append((n, e01[n], e1[n], exp, o1.get(n), oexp, e10.get(n), exp2))

    print(
        "| query | engine sf0.1 | engine sf1 | engine exp | oracle sf1 | "
        "oracle exp | engine sf10 | exp sf1→10 |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for n, t01, t1, exp, ot1, oexp, t10, exp2 in sorted(
        rows, key=lambda r: -r[3]
    ):
        print(
            f"| {n} | {t01:.2f} | {t1:.2f} | {exp:.2f} | "
            f"{'-' if ot1 is None else f'{ot1:.2f}'} | "
            f"{'-' if oexp is None else f'{oexp:.2f}'} | "
            f"{'-' if t10 is None else f'{t10:.2f}'} | "
            f"{'-' if exp2 is None else f'{exp2:.2f}'} |"
        )

    flagged = [
        (n, t01, t1, exp)
        for n, t01, t1, exp, _, _, _, _ in rows
        if exp > flag_at and max(t01, t1) > floor
    ]
    flagged2 = [
        (n, t1, t10, exp2)
        for n, _, t1, _, _, _, t10, exp2 in rows
        if exp2 is not None and exp2 > flag_at and max(t1, t10) > floor
    ]
    print()
    print(
        f"flagged (exp > {flag_at}, slower side > {floor}s): "
        f"{[(n, round(e, 2)) for n, _, _, e in flagged]}"
    )
    if e10:
        print(
            f"flagged decade 2 (exp sf1→10 > {flag_at}, slower side > "
            f"{floor}s): {[(n, round(e, 2)) for n, _, _, e in flagged2]}"
        )
    missing = sorted(set(e01) - set(e1))
    if missing:
        print(f"in sf0.1 but not sf1 ({len(missing)}): {missing}")


if __name__ == "__main__":
    main()
