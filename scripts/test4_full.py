"""TEST4 full-dataset artifact — the reference's "Table 1" runs (VERDICT #4).

Reproduces TESTS/TEST4/run_tests.sh on the full shipped UCI data:
  <kernel gaussian|matern12> x <window g|m> x <adam iters 0|500>
with the reference driver's settings (foo.cpp:136-160 + run_tests.sh:14-19):
raw x0 = (0,0,0) -> softplus 0.6931 for (f, l, mu), learn_maxits 10,
nvecs 10, Nystrom rank 10, fastsum operator.  Writes TEST4.json +
TEST4.md with final hyperparameters, prediction RMSE, and loss history
tails — the committed analog of the reference's printed Table-1 rows
(foo.cpp:401-432; the reference does not commit its outputs).

Usage: python scripts/test4_full.py [--name poletele] [--iters 0 500]
"""

import argparse
import json
import math
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/root/reference/TESTS/TEST4/data"
LN2 = 0.6931471805599453  # softplus(0): the driver's raw x0 = (0,0,0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="poletele")
    ap.add_argument("--iters", nargs="*", type=int, default=[0, 500])
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json", default="TEST4.json")
    ap.add_argument("--md", default="TEST4.md")
    args = ap.parse_args()

    results = []
    for kernel, window in (("gaussian", "g"), ("matern12", "m")):
        for its in args.iters:
            tag = f"{args.name}_{kernel}_{window}_{its}"
            out_prefix = os.path.join(ROOT, f".test4_{tag}")
            cmd = [
                sys.executable, "-m",
                "preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.cli",
                "--data-dir", DATA, "--name", args.name,
                "--kernel", kernel, "--window", window,
                "--operator", "fastsum", "--precond", "nystrom",
                "--f", str(LN2), "--l", str(LN2), "--mu", str(LN2),
                "--adam-maxits", str(its), "--learn-maxits", "10",
                "--learn-nvecs", "10", "--rank", "10",
                "--out-prefix", out_prefix,
            ]
            if args.platform:
                cmd += ["--platform", args.platform]
            t0 = time.time()
            print(">>", tag, flush=True)
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  cwd=ROOT, timeout=7200)
            wall = time.time() - t0
            tail = proc.stdout.strip().splitlines()[-6:]
            print("\n".join(tail), flush=True)
            rec = {"tag": tag, "kernel": kernel, "window": window,
                   "adam_maxits": its, "wall_s": round(wall, 1),
                   "rc": proc.returncode}
            for line in tail:
                if line.startswith("final params"):
                    toks = line.replace("=", " ").split()
                    rec["f"] = float(toks[toks.index("f") + 1])
                    rec["l"] = float(toks[toks.index("l") + 1])
                    rec["mu"] = float(toks[toks.index("mu") + 1])
                if "prediction RMSE" in line:
                    rec["rmse"] = float(line.split("RMSE:")[1].split()[0])
            hist_file = out_prefix + "_loss.txt"
            if os.path.exists(hist_file):
                with open(hist_file) as f:
                    hist = [float(v) for v in f.read().split()]
                rec["loss_first"] = hist[0] if hist else None
                rec["loss_last"] = hist[-1] if hist else None
                rec["loss_n"] = len(hist)
            if proc.returncode != 0:
                rec["stderr_tail"] = proc.stderr.strip().splitlines()[-5:]
            results.append(rec)

    with open(os.path.join(ROOT, args.json), "w") as f:
        json.dump({"name": args.name, "config":
                   "run_tests.sh parity: x0 softplus(0), learn 10/10, rank 10",
                   "runs": results}, f, indent=1)

    with open(os.path.join(ROOT, args.md), "w") as f:
        f.write(f"# TEST4 full-dataset runs: {args.name}\n\n")
        f.write("Reference driver config (TESTS/TEST4/run_tests.sh:14-19, "
                "foo.cpp:136-160): raw x0 = (0,0,0) -> softplus 0.6931, "
                "FGMRES/SLQ maxits 10, 10 probes, Nystrom rank 10, fastsum "
                "operator.  The reference prints these rows but commits no "
                "outputs; this table is the committed artifact.\n\n")
        f.write("| kernel | window | adam its | f | l | mu | test RMSE | "
                "loss[0] | loss[-1] | wall s |\n|---|---|---|---|---|---|---|---|---|---|\n")
        for r in results:
            f.write(
                f"| {r['kernel']} | {r['window']} | {r['adam_maxits']} | "
                f"{r.get('f', float('nan')):.4f} | {r.get('l', float('nan')):.4f} | "
                f"{r.get('mu', float('nan')):.4f} | {r.get('rmse', float('nan')):.4f} | "
                f"{r.get('loss_first')} | {r.get('loss_last')} | {r['wall_s']} |\n"
            )
    print("wrote", args.json, args.md, flush=True)


if __name__ == "__main__":
    main()
