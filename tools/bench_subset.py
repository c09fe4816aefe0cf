#!/usr/bin/env python3
"""Per-op fresh-JVM bench of a named subset at an arbitrary SF dir —
the 100x scale-leg harness (BENCH_sf10.json producer).

The full 264-op gauntlet is impractical at sf10 (hours); the scale
evidence that matters is the ~25 heaviest / iterative / shuffle-bound
ops. Each runs in its own JVM via graft.BenchOne (cold = rep 1, warm =
min of later reps — the BENCH_iso protocol, so numbers are
contention-free by construction), with a hard per-op timeout recorded as
an error entry instead of a stalled sweep.

Usage: python3 tools/bench_subset.py <sfDir> <outJson> <refJson|-> <op> [op...]
  refJson: a BENCH_sf1.json-style file whose queries_warm_sf1 (or a raw
  bench_detail.json whose queries_warm) supplies the reference warms for
  the scaling ratios; '-' = no reference.
Env: SPARK_GRAFT_CPUS (default 32), SPARK_DRIVER_MEM (default 48g),
     GRAFT_SUBSET_REPS (default 2), GRAFT_SUBSET_TIMEOUT secs (default 2400).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_ref(path):
    if path == "-":
        return {}
    d = json.load(open(path))
    for k in ("queries_warm_sf1", "queries_warm"):
        if k in d:
            return d[k]
    return {}


def main():
    sf_dir, out_path, ref_path = sys.argv[1], sys.argv[2], sys.argv[3]
    ops = sys.argv[4:]
    ref = load_ref(ref_path)
    reps = int(os.environ.get("GRAFT_SUBSET_REPS", "2"))
    timeout = int(os.environ.get("GRAFT_SUBSET_TIMEOUT", "2400"))
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    out = {"sf": sf_dir, "reps": reps, "ref": os.path.basename(ref_path),
           "queries": {}}
    for name in ops:
        try:
            p = subprocess.run(
                [os.path.join(REPO, "tools/run_graft.sh"), "graft.BenchOne",
                 name, str(reps)],
                env=env, capture_output=True, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            out["queries"][name] = {"error": f"timeout>{timeout}s"}
            print(f"[bench_subset] {name} TIMEOUT", file=sys.stderr)
            continue
        line = next((l for l in p.stdout.splitlines()
                     if l.startswith('{"query"')), None)
        if p.returncode != 0 or line is None:
            out["queries"][name] = {"error": (p.stderr or p.stdout)[-500:]}
            print(f"[bench_subset] {name} FAILED", file=sys.stderr)
            continue
        times = json.loads(line)["times"]
        e = {"times": times, "cold": times[0],
             "warm": min(times[1:]) if len(times) > 1 else times[0]}
        if name in ref and ref[name] > 0:
            e["ref_warm"] = ref[name]
            e["scaling_vs_ref"] = round(e["warm"] / ref[name], 2)
        out["queries"][name] = e
        r = e.get("scaling_vs_ref", "-")
        print(f"[bench_subset] {name}: cold={e['cold']:.1f} "
              f"warm={e['warm']:.1f} ratio={r}", file=sys.stderr)
        with open(out_path, "w") as f:   # checkpoint after every op
            json.dump(out, f, indent=1)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(out_path)


if __name__ == "__main__":
    main()
