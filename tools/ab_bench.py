"""Same-box A/B/A comparison of named queries between two trees.

The round-13 measurement pain was box drift: full-bench numbers taken
minutes apart disagree by more than most per-query optimizations, so
the honest code-effect evidence is an INTERLEAVED comparison — the
"before" tree (a git worktree pinned at a ref) and the "after" tree
(the current checkout) profiled back-to-back with the same control
query, before-arm re-run last to bracket the drift (A-B-A). This tool
makes that methodology one command.

Usage:
  python tools/ab_bench.py --ref <commit> name [name ...]
  python tools/ab_bench.py --ref <commit> --control ann_cosine_topk name

Each arm runs ``tools/profile_query.py`` (3 evaluations per query,
noop sink, min-of-warm + job/stage/task counts) in its own process.
Wall seconds carry drift; the job/stage/task counts are
scheduler-invariant and must agree between the two A runs — if they
don't, the arms compiled different plans and the wall comparison is
void. The control query must be UNTOUCHED between the refs; its wall
movement is the box-drift estimate to subtract mentally from the rest.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

_LINE = re.compile(
    r"^(\S+)\s+cold=\s*([\d.]+)s warm=\s*([\d.]+)s plan=\s*([\d.]+)s "
    r"jobs=\[([^\]]*)\] stages=\[([^\]]*)\] tasks=\[([^\]]*)\]"
)


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_arm(tree: str, names: list[str]) -> dict[str, dict]:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    # "." = the CURRENT checkout regardless of the caller's cwd; the
    # before-arm passes its worktree path explicitly
    cwd = _REPO_ROOT if tree == "." else tree
    proc = subprocess.run(
        [sys.executable, "tools/profile_query.py", *names],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        sys.stderr.write(
            f"arm in {cwd} failed (rc={proc.returncode})\n"
            f"--- stdout ---\n{proc.stdout[-4000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}\n"
        )
        raise SystemExit(1)
    out = proc.stdout
    parsed = {}
    for line in out.splitlines():
        m = _LINE.match(line.strip())
        if m:
            parsed[m.group(1)] = {
                "cold": float(m.group(2)),
                "warm": float(m.group(3)),
                "plan": float(m.group(4)),
                # warm-run counts: last entry of each series (the
                # steady-state evaluation)
                "jobs": int(m.group(5).split(",")[-1]),
                "stages": int(m.group(6).split(",")[-1]),
                "tasks": int(m.group(7).split(",")[-1]),
            }
    missing = [n for n in names if n not in parsed]
    if missing:
        raise SystemExit(f"arm in {tree} produced no rows for {missing}")
    return parsed


def main() -> int:
    args = sys.argv[1:]
    ref = None
    control = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--ref":
            ref = args[i + 1]
            i += 2
        elif args[i] == "--control":
            control = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not ref or not names:
        print(__doc__)
        return 2
    if control and control not in names:
        names.append(control)

    wt = f"/tmp/ab_bench_{os.getpid()}"
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, ref],
        check=True,
        capture_output=True,
        cwd=_REPO_ROOT,
    )
    try:
        print(f"A (before, {ref}) ...", flush=True)
        a1 = _run_arm(wt, names)
        print("B (after, working tree) ...", flush=True)
        b = _run_arm(".", names)
        print(f"A again (drift bracket) ...", flush=True)
        a2 = _run_arm(wt, names)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            capture_output=True,
            cwd=_REPO_ROOT,
        )

    print(
        f"\n{'query':40s} {'warm A1/A2 -> B':>22s} "
        f"{'jobs A->B':>10s} {'stages':>9s} {'tasks':>11s}"
    )
    for n in names:
        tag = "  [control]" if n == control else ""
        drift = (
            " DRIFT?"
            if min(a1[n]["warm"], a2[n]["warm"])
            and abs(a1[n]["warm"] - a2[n]["warm"])
            / min(a1[n]["warm"], a2[n]["warm"])
            > 0.25
            else ""
        )
        plans_agree = (a1[n]["jobs"], a1[n]["stages"]) == (
            a2[n]["jobs"],
            a2[n]["stages"],
        )
        print(
            f"{n:40s} "
            f"{a1[n]['warm']:6.2f}/{a2[n]['warm']:6.2f} -> {b[n]['warm']:6.2f} "
            f"{a1[n]['jobs']:4d}->{b[n]['jobs']:<4d} "
            f"{a1[n]['stages']:4d}->{b[n]['stages']:<4d} "
            f"{a1[n]['tasks']:5d}->{b[n]['tasks']:<5d}"
            f"{tag}{drift}{'' if plans_agree else ' A-ARMS-DISAGREE'}"
        )
    print(
        "\ncounts are the warm evaluation's; A1/A2 disagreement on wall "
        "is box drift — judge wall deltas against the control's."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
