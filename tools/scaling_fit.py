"""Per-pass serial-term fit from a bench.py --scaling JSON.

The two-width model T_w = S + P/w per pass (S = width-independent serial
term, P = perfectly parallel work) has a closed form from the two
measured walls:

    S = (4·t32 − t8) / 3        P = 8·(t8 − t32) · 4/3 · ... = (t8 − S)·8

This is the attribution BASELINE.md's scaling section carries (VERDICT
r4/r5: "a fit showing code-side S with the remainder attributed to the
documented single-socket bandwidth terms"). Negative S (t8 < t32·4 noise)
prints as 0 with the raw value noted.

Usage: python tools/scaling_fit.py SCALING.json [SCALING2.json ...]
With several JSONs, per-pass walls are pooled by MIN per width first
(the noisy-machine protocol: co-tenant noise only ever ADDS time).
"""

from __future__ import annotations

import json
import sys


def fit(per8: dict, per32: dict) -> list[tuple]:
    rows = []
    passes = [p for p in per8 if p in per32]
    for p in passes:
        t8, t32 = float(per8[p]), float(per32[p])
        s = (4 * t32 - t8) / 3
        par = (t8 - s) * 8
        rows.append((p, t8, t32, s, par))
    return rows


def main(paths: list[str]) -> None:
    per8: dict = {}
    per32: dict = {}
    effs = []
    for path in paths:
        d = json.load(open(path))
        effs.append((path, d.get("value"), d.get("core_speed_spread"),
                     d.get("steal_frac_window")))
        for p, t in d["per_pass_8"].items():
            per8[p] = min(per8.get(p, float("inf")), float(t))
        for p, t in d["per_pass_32"].items():
            per32[p] = min(per32.get(p, float("inf")), float(t))
    for path, eff, spread, steal in effs:
        print(f"{path}: eff={eff} spread={spread} steal={steal}")
    rows = fit(per8, per32)
    core = [r for r in rows if r[0] in
            ("base", "entities", "link", "materialize", "validate")]
    t8 = sum(r[1] for r in core)
    t32 = sum(r[2] for r in core)
    print(f"\n{'pass':<14}{'t8':>8}{'t32':>8}{'S':>8}{'P':>9}")
    for p, a, b, s, par in rows:
        print(f"{p:<14}{a:>8.2f}{b:>8.2f}{max(s, 0):>8.2f}{par:>9.1f}"
              + ("  (raw S %.2f)" % s if s < -0.05 else ""))
    s_tot = sum(max(r[3], 0) for r in core)
    p_tot = sum(r[4] for r in core)
    print(f"\ncore passes: sum t8={t8:.1f} t32={t32:.1f} "
          f"S={s_tot:.1f} P={p_tot:.0f}")
    if p_tot > 0:
        pred = lambda w: s_tot + p_tot / w  # noqa: E731
        # eff = (S+P/8)/(4·(S+P/32)) ≥ 0.8  ⇔  S ≤ P·(1/8 − 3.2/32)/2.2 = P/88
        print(f"model eff 8→32 = {pred(8) / (4 * pred(32)):.3f}; "
              f"S for eff≥0.8 given this P: ≤ {p_tot / 88:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1:])
