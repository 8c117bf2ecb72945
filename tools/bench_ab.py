"""Same-session bench A/B (the r12 judge's protocol): run the bench of
an arbitrary git sha AND of the working tree back-to-back on the same
host, both gated on idle load, and print a per-query comparison.

Cross-round absolute comparisons are invalid unless both codebases ran
in the same session — this tool makes that a one-liner:

    python tools/bench_ab.py <baseline_sha> [sf_dir]

The baseline tree is materialized with ``git archive`` into a temp dir
(its own __spark_entry__/bench.py/engine — no shared state with the
working tree); each side runs ``bench.py`` as a subprocess with
SPARK_GRAFT_DETAIL pointing at a scratch file. Output: one JSON line
with both totals, the common-query ratio, and the biggest movers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile


def _run_bench(workdir: str, detail_path: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_DETAIL"] = detail_path
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("SPARK_GRAFT_WAIT_IDLE", "900")
    subprocess.run(
        [sys.executable, "bench.py"], cwd=workdir, env=env, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # older bench.py (pre-r14) ignores SPARK_GRAFT_DETAIL and writes
    # BENCH_DETAIL.json beside itself — fall back to that copy
    if not os.path.exists(detail_path):
        detail_path = os.path.join(workdir, "BENCH_DETAIL.json")
    with open(detail_path) as f:
        return json.load(f)


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: bench_ab.py <baseline_sha> [sf_dir]")
    sha = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory(prefix=f"bench_ab_{sha[:8]}_") as old_dir:
        tar = subprocess.run(
            ["git", "archive", sha], cwd=repo, check=True, capture_output=True
        ).stdout
        subprocess.run(["tar", "-x", "-C", old_dir], input=tar, check=True)
        old = _run_bench(old_dir, os.path.join(old_dir, "_detail.json"), sf_dir)
        new = _run_bench(repo, os.path.join(tempfile.gettempdir(), "_ab_new.json"), sf_dir)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    to, tn = sum(oq[k] for k in common), sum(nq[k] for k in common)
    movers = sorted(
        ((nq[k] / max(oq[k], 0.05), k) for k in common), key=lambda x: -x[0]
    )[:5]
    print(json.dumps({
        "baseline_sha": sha,
        "sf_dir": sf_dir,
        "old": {"total": old["value"], "n": old["n_queries"],
                "loadavg_start": old.get("loadavg_start")},
        "new": {"total": new["value"], "n": new["n_queries"],
                "loadavg_start": new.get("loadavg_start")},
        "common": len(common),
        "common_old_sec": round(to, 1),
        "common_new_sec": round(tn, 1),
        "common_ratio": round(tn / to, 3) if to else None,
        "top_movers": [{"query": k, "ratio": round(r, 2),
                        "old": round(oq[k], 2), "new": round(nq[k], 2)}
                       for r, k in movers],
    }))


if __name__ == "__main__":
    main()
