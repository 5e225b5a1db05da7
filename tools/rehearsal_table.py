#!/usr/bin/env python
"""Format a rehearsal_sf1.py JSON result as the BASELINE.md markdown
table: failures first, then the slowest keys, then a per-family cold
summary (394 per-key rows would bury the signal; the full JSON stays in
the artifact referenced by the table header).

Usage: python tools/rehearsal_table.py /tmp/rehearsal_all.json [--top 25]
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    with open(args.path) as f:
        data = json.load(f)
    results: dict[str, dict] = data["results"]

    fails = {k: v for k, v in results.items() if "error" in v}
    timed = {k: v for k, v in results.items() if "cold" in v}

    print(f"Keys swept: {len(results)}  ·  failures: {len(fails)}")
    if fails:
        print("\n| key | error |\n|---|---|")
        for k, v in sorted(fails.items()):
            print(f"| `{k}` | {v['error']} |")

    print(f"\n**Slowest {args.top} keys (cold / warm s):**\n")
    print("| key | cold | warm |\n|---|---|---|")
    by_cold = sorted(timed.items(), key=lambda kv: -kv[1]["cold"])
    for k, v in by_cold[: args.top]:
        warm = "skipped" if v.get("warm") is None else f"{v['warm']:.2f}"
        print(f"| `{k}` | {v['cold']:.2f} | {warm} |")

    fam = defaultdict(list)
    for k, v in timed.items():
        fam[k.split("_", 1)[0]].append(v["cold"])
    print("\n**Per-family cold totals:**\n")
    print("| family | keys | total cold s | max cold s |\n|---|---|---|---|")
    for name, colds in sorted(fam.items(), key=lambda kv: -sum(kv[1])):
        print(
            f"| {name}_* | {len(colds)} | {sum(colds):.1f} | {max(colds):.2f} |"
        )


if __name__ == "__main__":
    main()
