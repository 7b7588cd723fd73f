#!/usr/bin/env python3
"""Interleaved same-box A/B bench harness (round-13 verdict item #7).

Cross-round wall-clock comparisons against the driver's BENCH_r*.json are
unreliable on this VM: unchanged sub-second queries swing 2-3x between
driver windows (measured round 11), so "q_x got slower" needs a paired
experiment, not a record diff. This script runs the SAME query set
against TWO compiled classpaths (a prior-round git ref and the current
working tree), INTERLEAVED A,B,A,B,... on one box, and compares
same-run-index pairs — machine drift hits both sides of each pair
equally, so the per-pair ratio isolates the code delta.

Usage:
  python3 scripts/ab_bench.py --baseline <git-ref> \
      --queries q_quality_classify,q_pipeline_classified \
      [--runs 3] [--sf-dir /root/testdata/sf0.1] [--skip-build]

Output: per-query table of per-run seconds for both sides, the paired
ratios, and median-of-ratios verdict. Run it on an IDLE box (kill stray
graft.Bench javas first — a timed-out probe leaves its child running).

Notes:
 - builds the baseline in a git worktree at /tmp/graft_ab_<ref> via
   `sbt compile` (sbt holds a per-project launcher lock, so the two
   compiles run sequentially; pass --skip-build to reuse an existing
   worktree build);
 - snapshots BOTH classes dirs to /tmp before benching so neither JVM
   reads a classes dir a later compile could mutate;
 - each bench runs from its own temp CWD: graft.Bench writes
   bench_out.json to the CWD, and running from the repo would clobber
   the driver's full record (the adjudication memory rule).
"""

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_JARS = "/opt/spark/jars/*"

ADD_OPENS_PKGS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]
JVM_FLAGS = [f for p in ADD_OPENS_PKGS for f in ("--add-opens", f"{p}=ALL-UNNAMED")]
JVM_FLAGS += ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
              "-Xmx" + os.environ.get("SPARK_DRIVER_MEM", "8g")]


def run(cmd, **kw):
    print("+ " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, **kw)


def ensure_baseline_worktree(ref, skip_build):
    sha = subprocess.check_output(
        ["git", "-C", REPO, "rev-parse", "--short", ref]).decode().strip()
    wt = f"/tmp/graft_ab_{sha}"
    if not os.path.isdir(wt):
        run(["git", "-C", REPO, "worktree", "add", "--detach", wt, ref])
    classes = os.path.join(wt, "target/scala-2.13/classes")
    if not skip_build or not os.path.isdir(classes):
        run(["sbt", "-batch", "compile"], cwd=wt)
    return wt, classes


def snapshot(classes_dir, tag):
    dst = tempfile.mkdtemp(prefix=f"graft_ab_classes_{tag}_")
    # copy into dst/classes so the cp root is stable
    shutil.copytree(classes_dir, os.path.join(dst, "classes"))
    return os.path.join(dst, "classes")


def bench_once(classes, queries, sf_dir, tag, run_idx):
    cwd = tempfile.mkdtemp(prefix=f"graft_ab_run_{tag}_{run_idx}_")
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_ONLY"] = ",".join(queries)
    cmd = ["java"] + JVM_FLAGS + ["-cp", f"{classes}:{SPARK_JARS}", "graft.Bench"]
    print(f"+ [{tag} run {run_idx}] graft.Bench ({len(queries)} queries)", flush=True)
    subprocess.run(cmd, check=True, cwd=cwd, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(os.path.join(cwd, "bench_out.json")) as f:
        rec = json.load(f)
    return {q: rec["queries"][q] for q in queries if q in rec.get("queries", {})}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True,
                    help="git ref of the prior-round classes to compare against")
    ap.add_argument("--queries", required=True,
                    help="comma list for SPARK_GRAFT_ONLY")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse an existing worktree build")
    args = ap.parse_args()
    queries = [q for q in args.queries.split(",") if q]

    stray = subprocess.run(["pgrep", "-f", "graft.Bench"], capture_output=True)
    if stray.returncode == 0:
        sys.exit("stray graft.Bench JVMs running — kill them first "
                 "(contended timings are garbage): pids " +
                 stray.stdout.decode().strip().replace("\n", ","))

    wt, base_classes = ensure_baseline_worktree(args.baseline, args.skip_build)
    run(["sbt", "-batch", "compile"], cwd=REPO)
    cur = snapshot(os.path.join(REPO, "target/scala-2.13/classes"), "cur")
    base = snapshot(base_classes, "base")

    a, b = [], []  # per-run dicts: baseline, current
    for i in range(args.runs):
        a.append(bench_once(base, queries, args.sf_dir, "baseline", i))
        b.append(bench_once(cur, queries, args.sf_dir, "current", i))

    print(f"\n=== A/B: baseline={args.baseline} vs current "
          f"({args.runs} interleaved runs, {args.sf_dir}) ===")
    print(f"{'query':34s} {'baseline(s)':>22s} {'current(s)':>22s} "
          f"{'paired ratios':>20s} {'median':>7s}")
    summary = {}
    for q in queries:
        av = [r.get(q) for r in a]
        bv = [r.get(q) for r in b]
        if None in av or None in bv:
            print(f"{q:34s} missing from a run — check query name")
            continue
        ratios = [y / x for x, y in zip(av, bv)]
        med = statistics.median(ratios)
        summary[q] = {"baseline": av, "current": bv, "ratios": ratios,
                      "median_ratio": med}
        fmt = lambda vs: " ".join(f"{v:6.2f}" for v in vs)
        print(f"{q:34s} {fmt(av):>22s} {fmt(bv):>22s} "
              f"{' '.join(f'{r:5.2f}' for r in ratios):>20s} {med:7.2f}")
    out = os.path.join(REPO, "ab_bench_out.json")
    with open(out, "w") as f:
        json.dump({"baseline_ref": args.baseline, "sf_dir": args.sf_dir,
                   "runs": args.runs, "results": summary}, f, indent=2)
    print(f"\nwritten: {out}")
    print("median ratio > 1 = current slower than baseline (paired, "
          "machine-drift-cancelled)")


if __name__ == "__main__":
    main()
