#!/usr/bin/env python3
"""Warm the .bench/ cache outside the driver's bench window: panels,
covariates, and plink2 oracle baselines (the slow parts of bench.py).
Idempotent — everything is cached by file existence.

Run: python tools/warm_bench.py  (CPU-only; safe alongside other work)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    os.makedirs(bench.RUNS, exist_ok=True)
    p5 = os.path.join(bench.BENCH_DIR, f"p{bench.GLM_SAMPLES}x{bench.GLM_VARIANTS}")
    bench._gen_panel(p5, bench.GLM_SAMPLES, bench.GLM_VARIANTS, bench.SEED)
    cov = bench._gen_cov(p5, bench.SEED + 1)
    toy = bench._ensure_toy()
    bench.log("warm: GLM oracle baseline (slow, one-time) ...")
    wall = bench._oracle_wall(
        f"glm_{bench.GLM_SAMPLES}x{bench.GLM_VARIANTS}", bench.ORACLE,
        ["--pfile", p5, "--glm", "hide-covar", "--covar", cov,
         "--out", os.path.join(
             bench.BENCH_DIR,
             f"o_glm_{bench.GLM_SAMPLES}x{bench.GLM_VARIANTS}")])
    bench.log(f"warm: GLM oracle wall = {wall}")
    panels = [
        ("p10000x32768", 10000, 32768),
        ("p50000x32768", 50000, 32768),
        ("p100000x32768", 100000, 32768),
    ]
    for name, ns, nv in panels:
        bench._gen_panel(os.path.join(bench.BENCH_DIR, name), ns, nv,
                         bench.SEED)
    for name, metric, obin, oargs in [
        ("freq_toy", None, bench.ORACLE,
         ["--pfile", toy, "--freq", "--missing", "--hardy",
          "--out", os.path.join(bench.BENCH_DIR, "o_toy")]),
        ("indep_10k", None, bench.ORACLE,
         ["--pfile", os.path.join(bench.BENCH_DIR, "p10000x32768"),
          "--indep-pairwise", "200", "50", "0.2",
          "--out", os.path.join(bench.BENCH_DIR, "o_indep")]),
        ("king_50k", None, bench.ORACLE,
         ["--pfile", os.path.join(bench.BENCH_DIR, "p50000x32768"),
          "--make-king-table", "--king-table-filter", "0.044",
          "--out", os.path.join(bench.BENCH_DIR, "o_king")]),
        ("grm_50k", None, bench.ORACLE_LAPACK,
         ["--pfile", os.path.join(bench.BENCH_DIR, "p50000x32768"),
          "--make-grm-bin", "--out", os.path.join(bench.BENCH_DIR, "o_grm")]),
        ("pca_100k", None, bench.ORACLE_LAPACK,
         ["--pfile", os.path.join(bench.BENCH_DIR, "p100000x32768"),
          "--pca", "10", "approx", "--out",
          os.path.join(bench.BENCH_DIR, "o_pca")]),
    ]:
        bench.log(f"warm: oracle baseline {name} ...")
        bench._oracle_wall(name, obin, oargs)
    bench.log("warm: import VCF ...")
    vcf = bench._ensure_import_vcf()
    if os.path.exists(vcf):
        bench._oracle_wall(
            "vcf_import", bench.ORACLE,
            ["--vcf", vcf, "--make-pgen",
             "--out", os.path.join(bench.BENCH_DIR, "o_vcfimp")])
    bench.log("warm: done.")


if __name__ == "__main__":
    main()
