"""Two-HEAD same-window A/B bench (drift attribution).

Generalizes the BENCH_AB_r11 protocol: check out a past HEAD in a
throwaway worktree, then run bench.py ALTERNATING between the two
HEADs inside one session window (leg order A B A B), so machine drift
between rounds cannot masquerade as a code regression — the question
"did THIS code get slower?" is answered by same-window legs under one
protocol, per BASELINE.md's drift methodology.

Usage:
  python tools/ab_bench.py --old 31a70f5 --keys graph_pagerank_exact \
      [--legs 2] [--out BENCH_AB_r12.json] [--tier2]

--tier2 runs the keys through the tier-2 block only (BENCH_KEYS=none,
BENCH_T2_KEYS=<keys>, min-of-2 + one warm pass — the committed tier-2
semantics); without it the keys run as the headline set.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(tree: str, keys: str, tier2: bool) -> dict:
    env = dict(os.environ)
    sidecar = os.path.join(tempfile.gettempdir(), f"ezgs_ab_{os.path.basename(tree)}.json")
    env["BENCH_FULL_OUT"] = sidecar
    if tier2:
        env["BENCH_KEYS"] = "none"
        env["BENCH_T2_KEYS"] = keys
    else:
        env["BENCH_KEYS"] = keys
        env["BENCH_T2_KEYS"] = "none"
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=int(os.environ.get("EZGS_BENCH_TIMEOUT", "3600")),
        cwd=tree,
    )
    lines = out.stdout.strip().splitlines()
    if not lines:
        raise RuntimeError(
            f"bench at {tree} produced no stdout (rc={out.returncode}); "
            "stderr tail:\n" + "\n".join(out.stderr.splitlines()[-15:])
        )
    summary = json.loads(lines[-1])
    if "full" in summary and os.path.exists(summary["full"]):
        with open(summary["full"]) as fh:
            return json.load(fh)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True, help="past commit for leg A")
    ap.add_argument("--keys", required=True, help="comma list of bench keys")
    ap.add_argument("--legs", type=int, default=2, help="legs PER HEAD")
    ap.add_argument("--tier2", action="store_true")
    ap.add_argument("--out", default="BENCH_AB.json")
    ap.add_argument("--purpose", default="")
    args = ap.parse_args()

    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    old_tree = os.path.join(tempfile.gettempdir(), f"ezgs_ab_{args.old}")
    if not os.path.isdir(old_tree):
        subprocess.run(
            ["git", "worktree", "add", "--detach", old_tree, args.old],
            cwd=REPO,
            check=True,
        )
    legs: dict[str, list] = {args.old: [], head: []}
    for i in range(args.legs):
        for name, tree in ((args.old, old_tree), (head, REPO)):
            print(f"# leg {i + 1} {name} ...", file=sys.stderr)
            legs[name].append(run_leg(tree, args.keys, args.tier2))
    artifact = {
        "purpose": args.purpose
        or f"same-window A/B of {args.old} vs {head} on [{args.keys}] "
        f"({'tier-2' if args.tier2 else 'headline'} protocol, alternating legs)",
        "protocol": {
            "legs_per_head": args.legs,
            "order": "alternating old/new inside one window",
            "tier2": args.tier2,
            "keys": args.keys.split(","),
        },
        "old_head": {"commit": args.old, "legs": legs[args.old]},
        "new_head": {"commit": head, "legs": legs[head]},
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(artifact, f, indent=1)
    field = "tier2_queries" if args.tier2 else "queries"
    for name in (args.old, head):
        vals = [leg.get(field, {}) for leg in legs[name]]
        print(name, json.dumps(vals))
    print(f"written: {args.out}")


if __name__ == "__main__":
    main()
