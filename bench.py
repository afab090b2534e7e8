#!/usr/bin/env python3
"""Benchmark driver: --glm logistic/Firth variants/sec at 500k samples
(BASELINE.json config 5, the headline metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "variants/sec", "vs_baseline": N}

vs_baseline = our steady-state variants/sec divided by multi-threaded plink2
CPU variants/sec on the IDENTICAL fileset.  The plink2 number is measured
once per machine if the oracle binary exists (see BASELINE.md build recipe)
and cached; otherwise the number recorded in BASELINE_MEASURED.json
(measured on the dev host) is used.

Panel: 500,000 samples x 2,048 variants, 2% missingness, binary phenotype,
covariates = SEX + 10 standard-normal "PCs" (statistically equivalent to
principal components for timing purposes), seed 42.  Cached under .bench/.

Our timing excludes one warmup pass (JIT compile + cache); plink2 has no
compile step, so steady-state throughput is the honest comparison for a
production scan where M >> 2048.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_DIR = os.path.join(REPO, ".bench")
ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

SAMPLES = int(os.environ.get("BENCH_SAMPLES", 500_000))
VARIANTS = int(os.environ.get("BENCH_VARIANTS", 2048))
SEED = 42


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def ensure_panel():
    os.makedirs(BENCH_DIR, exist_ok=True)
    prefix = os.path.join(BENCH_DIR, f"p{SAMPLES}x{VARIANTS}")
    if not os.path.exists(prefix + ".pgen"):
        log(f"bench: generating {SAMPLES}x{VARIANTS} panel at {prefix} ...")
        from plink_tpu.cli import parse_args
        from plink_tpu.commands.dummy import generate_dummy
        from plink_tpu.utils.logging import RunLogger

        cfg = parse_args(
            ["--dummy", str(SAMPLES), str(VARIANTS), "0.02", "--seed", str(SEED),
             "--out", prefix]
        )
        lg = RunLogger(prefix, silent=True)
        generate_dummy(cfg, lg)
        lg.close()
    cov = prefix + ".cov"
    if not os.path.exists(cov):
        import numpy as np

        rng = np.random.default_rng(SEED + 1)
        iids = None
        with open(prefix + ".psam") as f:
            header = f.readline().rstrip("\n").split("\t")
            sex_idx = header.index("SEX")
            rows = [l.rstrip("\n").split("\t") for l in f]
        pcs = rng.standard_normal((len(rows), 10))
        with open(cov, "w") as f:
            f.write("#IID\tSEX\t" + "\t".join(f"PC{i+1}" for i in range(10)) + "\n")
            for r, row in enumerate(rows):
                f.write(
                    row[0] + "\t" + row[sex_idx] + "\t"
                    + "\t".join(f"{v:.6f}" for v in pcs[r]) + "\n"
                )
    return prefix, cov


def run_ours(prefix, cov, out):
    from plink_tpu.cli import main

    argv = [
        "--pfile", prefix, "--glm", "hide-covar", "--covar", cov,
        "--out", out, "--silent",
    ]
    t0 = time.time()
    rc = main(argv)
    if rc != 0:
        raise RuntimeError(f"plink_tpu --glm failed rc={rc}")
    return time.time() - t0


def measure_baseline(prefix, cov):
    cache = os.path.join(BENCH_DIR, f"plink2_glm_{SAMPLES}x{VARIANTS}.json")
    if os.path.exists(cache):
        return json.load(open(cache))["variants_per_sec"]
    if os.path.exists(ORACLE):
        log("bench: measuring plink2 CPU baseline (one-time) ...")
        ncpu = os.cpu_count() or 1
        t0 = time.time()
        subprocess.run(
            [ORACLE, "--pfile", prefix, "--glm", "hide-covar", "--covar", cov,
             "--threads", str(ncpu), "--memory", "12000",
             "--out", os.path.join(BENCH_DIR, "oracle_glm")],
            check=True, capture_output=True,
        )
        dt = time.time() - t0
        vps = VARIANTS / dt
        json.dump(
            {"variants_per_sec": vps, "wall_s": dt, "threads": ncpu},
            open(cache, "w"),
        )
        return vps
    recorded = os.path.join(REPO, "BASELINE_MEASURED.json")
    if os.path.exists(recorded):
        rec = json.load(open(recorded))
        key = f"glm_logistic_{SAMPLES}x{VARIANTS}"
        if key in rec:
            return rec[key]["variants_per_sec"]
    return None


def main():
    prefix, cov = ensure_panel()
    # warmup pass: JIT compile + device buffers (separate --out)
    log("bench: warmup pass (compile) ...")
    run_ours(prefix, cov, os.path.join(BENCH_DIR, "warmup"))
    log("bench: timed pass ...")
    dt = run_ours(prefix, cov, os.path.join(BENCH_DIR, "timed"))
    vps = VARIANTS / dt
    baseline = measure_baseline(prefix, cov)
    vs = (vps / baseline) if baseline else None
    print(json.dumps({
        "metric": f"glm_logistic_hybrid_variants_per_sec_{SAMPLES}samples",
        "value": round(vps, 3),
        "unit": "variants/sec",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
