"""Weak-scaling evidence: constant work per CPU, double data + double CPUs.

The strong-scaling artifact (bench.py --scaling, SCALING_r05_canonical.json)
answers "same data, 4x CPUs". A 100-TB cluster grows the DATA with the
cluster, so the complementary evidence is weak scaling: sf0.4 @ 16 cpus vs
sf0.8 @ 32 cpus (0.025 sf per CPU at both points). Ideal = identical wall
time; efficiency = T(small)/T(big).

Protocol mirrors run_scaling(): fresh bench.py subprocesses per point,
SCALING_REPS (default 2) reps, min per point, measured conditions embedded.

Usage: python tools/weak_scaling.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import core_speed_spread, steal_frac  # noqa: E402

POINTS = [
    {"sf_dir": "/root/testdata/sf0.4", "num_cpus": 16},
    {"sf_dir": "/root/testdata/sf0.8", "num_cpus": 32},
]


def run_point(sf_dir: str, ncpu: int, reps: int) -> dict:
    best = None
    for _ in range(reps):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        ).stdout
        r = json.loads(out.strip().splitlines()[-1])
        if best is None or r["value"] < best["value"]:
            best = r
    return best


def main() -> dict:
    reps = int(os.environ.get("SCALING_REPS", "2"))
    spread0 = core_speed_spread()
    steal0 = steal_frac()
    results = [run_point(p["sf_dir"], p["num_cpus"], reps) for p in POINTS]
    steal1 = steal_frac()
    t_small, t_big = results[0]["value"], results[1]["value"]
    return {
        "metric": "weak_scaling_efficiency_16sf04_to_32sf08",
        "value": round(t_small / t_big, 3),
        "unit": "ratio (1.0 = perfect weak scaling)",
        "sec_16_sf04": t_small,
        "sec_32_sf08": t_big,
        "turns_per_sec_per_cpu": [
            round(r["n_turns"] / r["value"] / p["num_cpus"], 1)
            for r, p in zip(results, POINTS)
        ],
        "triples_per_sec": [r["triples_per_sec"] for r in results],
        "n_turns": [r["n_turns"] for r in results],
        "per_pass_16_sf04": results[0]["queries"],
        "per_pass_32_sf08": results[1]["queries"],
        "steal_frac_window": [steal0, steal1],
        "core_speed_spread": spread0,
        "protocol": (
            f"fresh bench.py process per rep, min of {reps} per point; "
            "constant 0.025 sf/cpu"
        ),
    }


if __name__ == "__main__":
    res = main()
    out = json.dumps(res, indent=1)
    print(out)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(out + "\n")
