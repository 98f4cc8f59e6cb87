"""Interleaved A/B of the tight-pairs SCALING probe across two code
versions (round 5: the 100k/200k tight-pairs raw ratios read 0.49-0.58
in the shifted per-doc-CPU host regime vs 0.83-0.94 in earlier healthy
windows — adjudicate whether any round-5 code change altered the
build's 2→8 scaling, or the readings track the host regime).

Each cell runs ``python <repo>/bench.py --phase build`` in a FRESH
process with its own Ray session, so every measurement uses that code
version's own protocol verbatim.  Within each round the four cells
run back-to-back — (A@2, A@8, B@2, B@8) — so host drift largely
cancels INSIDE a round and the A-vs-B efficiency comparison is
same-window by construction (the methodology BASELINE.md uses for
every build A/B).

    python scripts/scaling_ab.py [a_worktree_path] [rounds] [n_docs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_cell(repo: str, cpus: int, n_docs: int) -> float:
    env = dict(os.environ)
    env["RAY_GRAFT_CPUS"] = str(cpus)
    env["GRAFT_BENCH_DOCS"] = str(n_docs)
    p = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--phase", "build"],
        capture_output=True,
        text=True,
        env=env,
        cwd=repo,
        timeout=3600,
    )
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    if p.returncode != 0 or not lines:
        raise RuntimeError(
            f"{repo} @ {cpus} cpus failed (rc={p.returncode}); "
            f"stderr tail: {p.stderr[-800:]}"
        )
    return json.loads(lines[-1])["queries"]["build_docs_per_sec"]


def main() -> None:
    a_repo = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ftsray_r4"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    b_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    effs: dict[str, list[float]] = {"A": [], "B": []}
    for i in range(rounds):
        row: dict = {"round": i}
        for tag, repo in (("A", a_repo), ("B", b_repo)):
            d2 = run_cell(repo, 2, n_docs)
            d8 = run_cell(repo, 8, n_docs)
            row[f"dps2_{tag}"], row[f"dps8_{tag}"] = d2, d8
            row[f"eff_{tag}"] = round(d8 / (4 * d2), 3)
            effs[tag].append(row[f"eff_{tag}"])
        print(json.dumps(row), flush=True)
    print(
        json.dumps(
            {
                "a_repo": a_repo,
                "b_repo": b_repo,
                "n_docs": n_docs,
                "eff_A_median": round(statistics.median(effs["A"]), 3),
                "eff_B_median": round(statistics.median(effs["B"]), 3),
                "eff_A": effs["A"],
                "eff_B": effs["B"],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
