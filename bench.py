#!/usr/bin/env python3
"""Benchmark driver: all five BASELINE.json configs.

Prints one JSON line per config; the LAST line is the headline metric
(--glm logistic/Firth variants/sec at 500k samples):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline = plink2 wall-clock / our wall-clock (or our variants/sec
divided by plink2 variants/sec for the GLM config) on IDENTICAL filesets,
plink2 running with --threads <nproc>.  plink2 numbers are measured once
per machine and cached under .bench/ (see .bench/prep_configs.sh); the
GRM/PCA baseline uses a LAPACK-enabled plink2 build linked against
scipy's threaded OpenBLAS (the NOLAPACK fallback would understate it).

Our timing excludes one warmup pass (JIT compile + tunnel warm); plink2
has no compile step, so steady-state throughput is the honest comparison
for production scans where the fileset is large.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_DIR = os.path.join(REPO, ".bench")
ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
ORACLE_LAPACK = os.environ.get(
    "PLINK2_ORACLE_LAPACK", "/tmp/oracle_lapack/2.0/build_dynamic/plink2"
)

GLM_SAMPLES = int(os.environ.get("BENCH_SAMPLES", 500_000))
GLM_VARIANTS = int(os.environ.get("BENCH_VARIANTS", 16384))
SEED = 42

_plat = os.environ.get("JAX_PLATFORMS", "default").split(",")[0] or "default"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(BENCH_DIR, f"jaxcache-{_plat}")
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _gen_panel(prefix, samples, variants, seed, miss="0.02"):
    if os.path.exists(prefix + ".pgen"):
        return
    log(f"bench: generating {samples}x{variants} panel at {prefix} ...")
    from plink_tpu.cli import parse_args
    from plink_tpu.commands.dummy import generate_dummy
    from plink_tpu.utils.logging import RunLogger

    cfg = parse_args(
        ["--dummy", str(samples), str(variants), miss, "--seed", str(seed),
         "--out", prefix]
    )
    lg = RunLogger(prefix, silent=True)
    generate_dummy(cfg, lg)
    lg.close()


def _gen_cov(prefix, seed):
    cov = prefix + ".cov"
    if os.path.exists(cov):
        return cov
    import numpy as np

    rng = np.random.default_rng(seed)
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
    return cov


def _ensure_toy():
    prefix = os.path.join(BENCH_DIR, "toy")
    if not os.path.exists(prefix + ".pgen"):
        from plink_tpu.cli import main

        rc = main(["--pedmap", "/root/reference/1.9/toy", "--make-pgen",
                   "--out", prefix, "--silent"])
        if rc != 0:
            raise RuntimeError("toy conversion failed")
    return prefix


def run_ours(argv):
    from plink_tpu.cli import main

    t0 = time.time()
    rc = main(argv + ["--silent"])
    if rc != 0:
        raise RuntimeError(f"plink_tpu failed rc={rc}: {argv}")
    return time.time() - t0


def _oracle_wall(cache_name, oracle_bin, args):
    """Measured plink2 wall seconds, cached in .bench/oracle_<name>.json."""
    cache = os.path.join(BENCH_DIR, f"oracle_{cache_name}.json")
    if os.path.exists(cache):
        rec = json.load(open(cache))
        if rec.get("rc", 0) == 0:
            return rec["wall_s"]
    if not os.path.exists(oracle_bin):
        return None
    log(f"bench: measuring plink2 baseline {cache_name} (one-time) ...")
    ncpu = os.cpu_count() or 1
    t0 = time.time()
    r = subprocess.run(
        [oracle_bin] + args + ["--threads", str(ncpu), "--memory", "12000"],
        capture_output=True,
    )
    wall = time.time() - t0
    rec = {"wall_s": wall, "rc": r.returncode, "threads": ncpu}
    json.dump(rec, open(cache, "w"))
    return wall if r.returncode == 0 else None


def _emit(metric, value, unit, vs):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }), flush=True)


def bench_config(name, metric, our_argv, oracle_name, oracle_bin, oracle_args,
                 out_prefix, warmup=True):
    if warmup:
        log(f"bench [{name}]: warmup ...")
        run_ours(our_argv + ["--out", out_prefix + ".warm"])
    log(f"bench [{name}]: timed ...")
    dt = run_ours(our_argv + ["--out", out_prefix + ".timed"])
    base = _oracle_wall(oracle_name, oracle_bin, oracle_args)
    vs = (base / dt) if base else None
    _emit(metric, dt, "seconds", vs)
    return dt


def main():
    os.makedirs(BENCH_DIR, exist_ok=True)
    outd = os.path.join(BENCH_DIR, "runs")
    os.makedirs(outd, exist_ok=True)

    # config 1: freq/missing/hardy on the 1.9 toy panel
    try:
        toy = _ensure_toy()
        bench_config(
            "freq_toy", "freq_missing_hardy_toy_wall",
            ["--pfile", toy, "--freq", "--missing", "--hardy"],
            "freq_toy", ORACLE,
            ["--pfile", toy, "--freq", "--missing", "--hardy",
             "--out", os.path.join(outd, "o_toy")],
            os.path.join(outd, "toy"),
        )
    except Exception as e:  # never let one config sink the headline metric
        log(f"bench [freq_toy] FAILED: {e}")

    # config 2: --indep-pairwise at 10k samples
    try:
        p2 = os.path.join(BENCH_DIR, "p10000x32768")
        _gen_panel(p2, 10000, 32768, 52)
        bench_config(
            "indep_10k", "indep_pairwise_10000x32768_wall",
            ["--pfile", p2, "--indep-pairwise", "200", "50", "0.2"],
            "indep_10k", ORACLE,
            ["--pfile", p2, "--indep-pairwise", "200", "50", "0.2",
             "--out", os.path.join(outd, "o_indep")],
            os.path.join(outd, "indep"),
        )
    except Exception as e:
        log(f"bench [indep_10k] FAILED: {e}")

    # config 3: KING + GRM at 50k samples
    try:
        p3 = os.path.join(BENCH_DIR, "p50000x32768")
        _gen_panel(p3, 50000, 32768, 53)
        t_king = bench_config(
            "king_50k", "king_table_50000x32768_wall",
            ["--pfile", p3, "--make-king-table", "--king-table-filter",
             "0.044"],
            "king_50k", ORACLE,
            ["--pfile", p3, "--make-king-table", "--king-table-filter",
             "0.044", "--out", os.path.join(outd, "o_king")],
            os.path.join(outd, "king"), warmup=False,
        )
        t_grm = bench_config(
            "grm_50k", "grm_bin_50000x32768_wall",
            ["--pfile", p3, "--make-grm-bin"],
            "grm_50k", ORACLE_LAPACK,
            ["--pfile", p3, "--make-grm-bin",
             "--out", os.path.join(outd, "o_grm")],
            os.path.join(outd, "grm"), warmup=False,
        )
    except Exception as e:
        log(f"bench [king/grm_50k] FAILED: {e}")

    # config 4: --pca approx top-10 at 100k samples
    try:
        p4 = os.path.join(BENCH_DIR, "p100000x32768")
        _gen_panel(p4, 100000, 32768, 54)
        bench_config(
            "pca_100k", "pca_approx10_100000x32768_wall",
            ["--pfile", p4, "--pca", "10", "approx", "--seed", "13"],
            "pca_100k", ORACLE_LAPACK,
            ["--pfile", p4, "--pca", "10", "approx",
             "--out", os.path.join(outd, "o_pca")],
            os.path.join(outd, "pca"), warmup=False,
        )
    except Exception as e:
        log(f"bench [pca_100k] FAILED: {e}")

    # config 5 (headline, LAST): --glm at 500k samples
    p5 = os.path.join(BENCH_DIR, f"p{GLM_SAMPLES}x{GLM_VARIANTS}")
    _gen_panel(p5, GLM_SAMPLES, GLM_VARIANTS, SEED)
    cov = _gen_cov(p5, SEED + 1)
    glm_argv = ["--pfile", p5, "--glm", "hide-covar", "--covar", cov]
    log("bench [glm_500k]: warmup (compile) ...")
    run_ours(glm_argv + ["--out", os.path.join(outd, "glm.warm")])
    log("bench [glm_500k]: timed ...")
    dt = run_ours(glm_argv + ["--out", os.path.join(outd, "glm.timed")])
    vps = GLM_VARIANTS / dt
    base_cache = os.path.join(
        BENCH_DIR, f"plink2_glm_{GLM_SAMPLES}x{GLM_VARIANTS}.json"
    )
    base_vps = None
    if os.path.exists(base_cache):
        base_vps = json.load(open(base_cache)).get("variants_per_sec")
    elif os.path.exists(ORACLE):
        wall = _oracle_wall(
            f"glm_{GLM_SAMPLES}x{GLM_VARIANTS}", ORACLE,
            ["--pfile", p5, "--glm", "hide-covar", "--covar", cov,
             "--out", os.path.join(outd, "o_glm")],
        )
        base_vps = (GLM_VARIANTS / wall) if wall else None
    _emit(
        f"glm_logistic_hybrid_variants_per_sec_{GLM_SAMPLES}samples",
        vps, "variants/sec",
        (vps / base_vps) if base_vps else None,
    )


if __name__ == "__main__":
    main()
