#!/usr/bin/env python3
"""Measure plink2 oracle walls + capture parity artifacts for bench.py.

Run OUTSIDE the driver's bench window (takes ~1-6 h: the 50k GRM dsyrk
alone is hours even with OpenBLAS).  Results go to bench_golden/ (committed
to git), so `python bench.py` under the driver NEVER runs plink2: walls
come from bench_golden/walls.json and parity diffs run against the
committed artifacts.

Panels must already exist under .bench/ (bench.py or plink_tpu.bench_gen
generates them deterministically -- see bench_gen.py's module docstring;
the committed artifacts are only valid for those exact panel bytes, which
walls.json records as sha256 prefixes).

Usage: python tools/measure_baselines.py [config ...]
  (default: all of toy glm indep king vcf pca grm)
"""

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, ".bench")
GOLD = os.path.join(REPO, "bench_golden")
ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
ORACLE_LAPACK = os.environ.get(
    "PLINK2_ORACLE_LAPACK", "/tmp/oracle_lapack/2.0/build_dynamic/plink2")
# OpenBLAS from the image's opencv wheel: standard dgemm_/dsyrk_/dsyevr_
# symbols, preloaded over the netlib libblas.so.3 the oracle links --
# plink2 users build against OpenBLAS/MKL, so this is the honest baseline.
OPENBLAS = "/opt/venv/lib/python3.12/site-packages/opencv_python.libs/" \
    "libopenblasp-r0-59ffcd50.3.15.so"

P5 = os.path.join(BENCH, "p500000x16384")
P2 = os.path.join(BENCH, "p10000x32768")
P3 = os.path.join(BENCH, "p50000x32768")
P4 = os.path.join(BENCH, "p100000x32768s")
TOY = os.path.join(BENCH, "toy")
VCF = os.path.join(BENCH, "imp10k.vcf.gz")


def _zst(src, dst):
    import zstandard

    with open(src, "rb") as f, open(dst, "wb") as g:
        g.write(zstandard.ZstdCompressor(level=9).compress(f.read()))


def _sha(path, n=16):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(1 << 22)
            if not b:
                break
            h.update(b)
    return h.hexdigest()[:n]


def _run(name, binary, args, env_extra=None, threads=None):
    ncpu = threads or os.cpu_count() or 1
    mem_mb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") \
        // (1024 * 1024)
    env = dict(os.environ)
    env["OPENBLAS_NUM_THREADS"] = str(ncpu)
    if env_extra:
        env.update(env_extra)
    cmd = [binary] + args + ["--threads", str(ncpu),
                             "--memory", str(max(12000, mem_mb - 8000))]
    print(f"[{name}] {' '.join(cmd)}", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    wall = time.time() - t0
    if r.returncode != 0:
        print(f"[{name}] FAILED rc={r.returncode}\n{r.stderr[-2000:]}"
              f"\n{r.stdout[-2000:]}", flush=True)
        return None
    print(f"[{name}] wall {wall:.1f}s", flush=True)
    return wall


def _update_walls(name, wall, extra=None):
    path = os.path.join(GOLD, "walls.json")
    walls = json.load(open(path)) if os.path.exists(path) else {}
    rec = {"wall_s": round(wall, 4), "threads": os.cpu_count(),
           "measured": time.strftime("%Y-%m-%d"),
           "host": "4-vCPU GCE bench host, 125 GB RAM"}
    if extra:
        rec.update(extra)
    walls[name] = rec
    json.dump(walls, open(path, "w"), indent=1, sort_keys=True)


def do_toy():
    out = os.path.join(BENCH, "o_toy")
    # sub-10ms run: report the best of 9 so the baseline isn't scheduler
    # noise (plink2's whole-process wall on toy data is ~4 ms)
    walls = [_run("freq_toy", ORACLE,
                  ["--pfile", TOY, "--freq", "--missing", "--hardy",
                   "--out", out]) for _ in range(9)]
    if any(w is None for w in walls):
        return
    wall = min(walls)
    for ext in (".afreq", ".hardy", ".smiss", ".vmiss"):
        with open(out + ext, "rb") as f, \
                open(os.path.join(GOLD, "o_toy" + ext), "wb") as g:
            g.write(f.read())
    _update_walls("freq_toy", wall)


def do_glm():
    out = os.path.join(BENCH, "o_glm")
    wall = _run("glm", ORACLE,
                ["--pfile", P5, "--glm", "hide-covar", "--covar", P5 + ".cov",
                 "--out", out])
    if wall is None:
        return
    _zst(out + ".PHENO1.glm.logistic.hybrid",
         os.path.join(GOLD, "o_glm.PHENO1.glm.logistic.hybrid.zst"))
    _update_walls("glm_500000x16384", wall,
                  {"panel_sha": _sha(P5 + ".pgen"), "variants": 16384})


def do_indep():
    out = os.path.join(BENCH, "o_indep")
    wall = _run("indep_10k", ORACLE,
                ["--pfile", P2, "--indep-pairwise", "200", "50", "0.2",
                 "--out", out])
    if wall is None:
        return
    _zst(out + ".prune.in", os.path.join(GOLD, "o_indep.prune.in.zst"))
    _update_walls("indep_10k", wall, {"panel_sha": _sha(P2 + ".pgen")})


def do_king():
    out = os.path.join(BENCH, "o_king")
    wall = _run("king_50k", ORACLE,
                ["--pfile", P3, "--make-king-table",
                 "--king-table-filter", "0.044", "--out", out])
    if wall is None:
        return
    _zst(out + ".kin0", os.path.join(GOLD, "o_king.kin0.zst"))
    _update_walls("king_50k", wall, {"panel_sha": _sha(P3 + ".pgen")})


def do_vcf():
    import gzip

    out = os.path.join(BENCH, "o_vcfimp")
    wall = _run("vcf_import", ORACLE,
                ["--vcf", VCF, "--make-pgen", "--out", out])
    if wall is None:
        return
    _zst(out + ".pvar", os.path.join(GOLD, "o_vcfimp.pvar.zst"))
    _zst(out + ".psam", os.path.join(GOLD, "o_vcfimp.psam.zst"))
    # identity of the INPUT: hash of decompressed VCF text (our exporter
    # regenerates the file on cold caches; BGZF framing may differ, the
    # variant content must not)
    h = hashlib.sha256()
    with gzip.open(VCF, "rb") as f:
        while True:
            b = f.read(1 << 22)
            if not b:
                break
            h.update(b)
    _update_walls("vcf_import", wall, {"vcf_content_sha": h.hexdigest()[:16]})


def do_pca():
    out = os.path.join(BENCH, "o_pca")
    wall = _run("pca_100k", ORACLE_LAPACK,
                ["--pfile", P4, "--pca", "10", "approx", "--out", out],
                env_extra={"LD_PRELOAD": OPENBLAS})
    if wall is None:
        return
    # subsample every 5th row: |corr| over 20k rows is statistically
    # equivalent and 5x smaller in git
    with open(out + ".eigenvec") as f, \
            open(os.path.join(GOLD, "o_pca.eigenvec.sub5"), "w") as g:
        g.write(f.readline())
        for i, line in enumerate(f):
            if i % 5 == 0:
                g.write(line)
    _zst(os.path.join(GOLD, "o_pca.eigenvec.sub5"),
         os.path.join(GOLD, "o_pca.eigenvec.sub5.zst"))
    os.unlink(os.path.join(GOLD, "o_pca.eigenvec.sub5"))
    with open(out + ".eigenval") as f, \
            open(os.path.join(GOLD, "o_pca.eigenval"), "w") as g:
        g.write(f.read())
    _update_walls("pca_100k", wall,
                  {"panel_sha": _sha(P4 + ".pgen"), "blas": "openblas-3.15"})


GRM_STRIDE = 65536
GRM_NSTRIDES = 16


def grm_sample_offsets(n_entries):
    import numpy as np

    rng = np.random.default_rng(0)
    offs = [0] + sorted(
        rng.integers(0, max(1, n_entries - GRM_STRIDE),
                     GRM_NSTRIDES - 1).tolist())
    return offs


def do_grm():
    import numpy as np

    out = os.path.join(BENCH, "o_grm")
    wall = _run("grm_50k", ORACLE_LAPACK,
                ["--pfile", P3, "--make-grm-bin", "--out", out],
                env_extra={"LD_PRELOAD": OPENBLAS})
    if wall is None:
        return
    n = os.path.getsize(out + ".grm.bin") // 4
    offs = grm_sample_offsets(n)
    vals = np.empty((len(offs), GRM_STRIDE), np.float32)
    with open(out + ".grm.bin", "rb") as f:
        for i, off in enumerate(offs):
            f.seek(off * 4)
            vals[i] = np.frombuffer(f.read(GRM_STRIDE * 4), np.float32)
    np.savez_compressed(os.path.join(GOLD, "o_grm.samples.npz"),
                        offsets=np.asarray(offs, np.int64), values=vals,
                        n_entries=np.int64(n))
    _update_walls("grm_50k", wall,
                  {"panel_sha": _sha(P3 + ".pgen"), "blas": "openblas-3.15"})


ALL = {"toy": do_toy, "glm": do_glm, "indep": do_indep, "king": do_king,
       "vcf": do_vcf, "pca": do_pca, "grm": do_grm}


def main():
    os.makedirs(GOLD, exist_ok=True)
    names = sys.argv[1:] or ["toy", "indep", "vcf", "glm", "king", "pca",
                             "grm"]
    for n in names:
        ALL[n]()


if __name__ == "__main__":
    main()
