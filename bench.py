#!/usr/bin/env python3
"""Benchmark driver: all five BASELINE.json configs, cold-cache-proof.

Prints one JSON line per config; the LAST line is always the headline
metric (--glm logistic/Firth variants/sec at 500k samples):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "parity": ...}

Structure (round-5 redesign after BENCH_r04 rc=124: a cold .bench spent
the driver window regenerating panels and re-measuring an 803-second
plink2 GLM baseline):
  * NO plink2 invocation ever happens here.  Oracle walls live in
    bench_golden/walls.json and oracle output artifacts (for parity
    diffs) live in bench_golden/*.zst -- both committed to git, produced
    by `python tools/measure_baselines.py` outside the bench window.
  * Synthetic panels regenerate in SECONDS on a cold cache via the
    native deterministic generator (plink_tpu/bench_gen.py +
    native/pgen_decode.cc panelgen_*): ~30 s for the 500k x 16384 GLM
    panel vs ~7 min for the old numpy --dummy path.  walls.json records
    sha256 prefixes of the panel bytes the oracle artifacts were
    computed on; a drifted panel marks parity, never a wall.
  * The orchestrator process never imports jax.  Every config runs in a
    subprocess (`bench.py --worker <name>`) under its own wall budget,
    so a hung TPU tunnel can never sink the remaining configs.
  * A backend preflight (tiny jitted op in a subprocess, hard timeout)
    runs first; if the TPU backend cannot initialize, the whole bench
    falls back to JAX_PLATFORMS=cpu and every metric name gains a
    `_cpu_fallback` suffix so nothing is misrepresented.
  * The headline GLM config runs FIRST (but its JSON line is printed
    last), so even a truncated driver window records the one metric
    that matters.

vs_baseline = plink2 wall-clock / our wall-clock (variants/sec ratio for
the GLM config) on IDENTICAL filesets, plink2 running with --threads
<nproc> (and OpenBLAS for the BLAS-bound GRM/PCA configs -- see
tools/measure_baselines.py).  Our timing excludes one warmup pass (JIT
compile + tunnel warm); plink2 has no compile step, so steady-state
throughput is the honest comparison for production scans where the
fileset is large.
"""

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_DIR = os.path.join(REPO, ".bench")
RUNS = os.path.join(BENCH_DIR, "runs")
GOLD = os.path.join(REPO, "bench_golden")

GLM_SAMPLES = int(os.environ.get("BENCH_SAMPLES", 500_000))
GLM_VARIANTS = int(os.environ.get("BENCH_VARIANTS", 16384))
SEED = 42

# Wall budgets (seconds).
TOTAL_BUDGET = float(os.environ.get("BENCH_BUDGET", 2400))
# a live tunnel answers a tiny jitted op well within 2 minutes (cold
# compile ~20-40s); a dead one hangs forever, so fail fast
PREFLIGHT_S = float(os.environ.get("BENCH_PREFLIGHT_S", 120))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _cpu_env(base=None):
    """Env forcing the CPU backend.  JAX_PLATFORMS alone is NOT enough:
    the axon sitecustomize calls jax.config.update("jax_platforms",
    "axon,cpu") which overrides the env var, so we also clear
    PALLAS_AXON_POOL_IPS to skip that registration entirely."""
    env = dict(base or os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    return env


def _walls():
    path = os.path.join(GOLD, "walls.json")
    if not os.path.exists(path):
        return {}
    return json.load(open(path))


def _golden(name):
    """Path of a golden artifact, decompressing .zst next to .bench."""
    plain = os.path.join(GOLD, name)
    if os.path.exists(plain):
        return plain
    zst = plain + ".zst"
    if not os.path.exists(zst):
        return None
    cache = os.path.join(BENCH_DIR, "golden_" + name)
    if not os.path.exists(cache) or \
            os.path.getmtime(cache) < os.path.getmtime(zst):
        import zstandard

        with open(zst, "rb") as f, open(cache + ".tmp", "wb") as g:
            g.write(zstandard.ZstdDecompressor().decompress(
                f.read(), max_output_size=1 << 31))
        os.replace(cache + ".tmp", cache)
    return cache


# --------------------------------------------------------------------------
# panel preparation (fast deterministic native generator; cached)
# --------------------------------------------------------------------------

def _panel_sha(prefix):
    cache = prefix + ".sha"
    if os.path.exists(cache):
        return open(cache).read().strip()
    h = hashlib.sha256()
    with open(prefix + ".pgen", "rb") as f:
        while True:
            b = f.read(1 << 22)
            if not b:
                break
            h.update(b)
    sha = h.hexdigest()[:16]
    with open(cache, "w") as f:
        f.write(sha)
    return sha


def _gen_panel(prefix, samples, variants, seed, miss=0.02, k=0, cov=False):
    if not os.path.exists(prefix + ".pgen"):
        log(f"bench: generating {samples}x{variants}"
            f"{' structured' if k else ''} panel at {prefix} ...")
        args = [sys.executable, "-m", "plink_tpu.bench_gen", prefix,
                str(samples), str(variants), "--miss", str(miss),
                "--seed", str(seed)]
        if k:
            args += ["--k", str(k)]
        if cov:
            args += ["--cov"]
        subprocess.run(args, env=_cpu_env(), check=True, cwd=REPO)
        for stale in (prefix + ".sha",):
            if os.path.exists(stale):
                os.unlink(stale)
    elif cov and not os.path.exists(prefix + ".cov"):
        code = (f"from plink_tpu.bench_gen import make_cov;"
                f"make_cov({prefix!r}, {seed + 1})")
        subprocess.run([sys.executable, "-c", code], env=_cpu_env(),
                       check=True, cwd=REPO)


def _ensure_toy():
    prefix = os.path.join(BENCH_DIR, "toy")
    if not os.path.exists(prefix + ".pgen"):
        code = (
            "from plink_tpu.cli import main;"
            "raise SystemExit(main(['--pedmap','/root/reference/1.9/toy',"
            f"'--make-pgen','--out','{prefix}','--silent']))"
        )
        subprocess.run([sys.executable, "-c", code], env=_cpu_env(),
                       check=True)
    return prefix


def _ensure_import_vcf():
    """BGZF VCF for the import benchmark, exported by OUR deterministic
    exporter from the 10k panel (~45 s, one-time per cache)."""
    path = os.path.join(BENCH_DIR, "imp10k.vcf.gz")
    if not os.path.exists(path):
        p2 = os.path.join(BENCH_DIR, "p10000x32768")
        log("bench: exporting import-bench VCF (one-time) ...")
        code = (
            "from plink_tpu.cli import main;"
            f"raise SystemExit(main(['--pfile','{p2}','--export','vcf',"
            f"'bgz','--out','{path[:-7]}','--silent']))"
        )
        subprocess.run([sys.executable, "-c", code], env=_cpu_env(),
                       check=True, cwd=REPO)
    return path


def _vcf_content_sha(path):
    import gzip

    cache = path + ".contentsha"
    if os.path.exists(cache) and \
            os.path.getmtime(cache) > os.path.getmtime(path):
        return open(cache).read().strip()
    h = hashlib.sha256()
    with gzip.open(path, "rb") as f:
        while True:
            b = f.read(1 << 22)
            if not b:
                break
            h.update(b)
    sha = h.hexdigest()[:16]
    with open(cache, "w") as f:
        f.write(sha)
    return sha


# --------------------------------------------------------------------------
# parity checks vs committed plink2 oracle artifacts
# --------------------------------------------------------------------------

def _parity_glm(ours, theirs):
    """Join on ID; P must agree to 1e-3 relative (f32 device IRLS + f64
    host refinement vs plink2's f64; plink2's own glm_compare.py uses
    comparable tolerances)."""
    def load(path):
        out = {}
        with open(path) as f:
            header = f.readline().rstrip("\n").split("\t")
            iid = header.index("ID")
            ip = header.index("P")
            for line in f:
                p = line.rstrip("\n").split("\t")
                out[p[iid]] = p[ip]
        return out

    a, b = load(ours), load(theirs)
    if set(a) != set(b):
        return "fail:ids"
    bad = 0
    for k, va in a.items():
        vb = b[k]
        if va == "NA" or vb == "NA":
            bad += (va != vb)
            continue
        fa, fb = float(va), float(vb)
        if abs(fa - fb) > 1e-3 * max(1e-8, abs(fb)) + 1e-9:
            bad += 1
    return "ok" if bad == 0 else f"fail:{bad}/{len(a)}"


def _parity_text_equal(ours, theirs):
    with open(ours, "rb") as f1, open(theirs, "rb") as f2:
        return "ok" if f1.read() == f2.read() else "fail:bytes"


def _parity_prune(ours, theirs):
    sa = set(open(ours).read().split())
    sb = set(open(theirs).read().split())
    if sa == sb:
        return "ok"
    return f"fail:{len(sa ^ sb)}sym"


def _parity_grm(ours):
    """Sampled float32 comparison against committed oracle strides (the
    full matrices are 5 GB)."""
    import numpy as np

    gold = os.path.join(GOLD, "o_grm.samples.npz")
    if not os.path.exists(gold):
        return "skipped:no-golden"
    rec = np.load(gold)
    n = int(rec["n_entries"])
    if os.path.getsize(ours) != n * 4:
        return "fail:size"
    offs, vals = rec["offsets"], rec["values"]
    stride = vals.shape[1]
    with open(ours, "rb") as f1:
        for i, off in enumerate(offs):
            f1.seek(int(off) * 4)
            a = np.frombuffer(f1.read(stride * 4), np.float32)
            if not np.allclose(a, vals[i], rtol=2e-4, atol=2e-5):
                return f"fail:off{off}"
    return "ok"


def _parity_pca(ours, ours_val):
    """Sign-aware column comparison à la plink2's pca_compare.py on the
    committed every-5th-row subsample, plus an eigenvalue check.  approx
    mode is a randomized algorithm with different RNG streams, so
    per-component |correlation| > 0.98 + eigenvalues to 1% is the
    equality notion; the panel has PLANTED structure (10 separated
    spikes, plink_tpu/bench_gen.py) so the top-10 subspace is
    identifiable and this comparison is meaningful."""
    import numpy as np

    theirs = _golden("o_pca.eigenvec.sub5")
    theirs_val = os.path.join(GOLD, "o_pca.eigenval")
    if theirs is None or not os.path.exists(theirs_val):
        return "skipped:no-golden"

    def load(path, every=1):
        rows = []
        with open(path) as f:
            f.readline()
            for i, line in enumerate(f):
                if i % every == 0:
                    rows.append([float(x) for x in line.split()[1:]])
        return np.array(rows, np.float64)

    a, b = load(ours, every=5), load(theirs)
    if a.shape != b.shape:
        return "fail:shape"
    bad = 0
    for j in range(a.shape[1]):
        c = np.corrcoef(a[:, j], b[:, j])[0, 1]
        if abs(c) < 0.98:
            bad += 1
    va = np.array([float(x) for x in open(ours_val)])
    vb = np.array([float(x) for x in open(theirs_val)])
    nval = int(np.sum(np.abs(va - vb) > 0.01 * np.abs(vb)))
    if bad == 0 and nval == 0:
        return "ok"
    return f"fail:{bad}pcs,{nval}vals"


def _parity(name, out_prefix):
    try:
        if name == "glm":
            oracle = _golden("o_glm.PHENO1.glm.logistic.hybrid")
            if oracle is None:
                return "skipped:no-golden"
            return _parity_glm(
                out_prefix + ".PHENO1.glm.logistic.hybrid", oracle)
        if name == "freq_toy":
            res = []
            for ext in (".afreq", ".hardy", ".smiss", ".vmiss"):
                gold = _golden("o_toy" + ext)
                if gold is None:
                    return "skipped:no-golden"
                res.append(_parity_text_equal(out_prefix + ext, gold))
            return "ok" if all(r == "ok" for r in res) else ";".join(res)
        if name == "indep_10k":
            gold = _golden("o_indep.prune.in")
            if gold is None:
                return "skipped:no-golden"
            return _parity_prune(out_prefix + ".prune.in", gold)
        if name == "king_50k":
            gold = _golden("o_king.kin0")
            if gold is None:
                return "skipped:no-golden"
            return _parity_text_equal(out_prefix + ".kin0", gold)
        if name == "grm_50k":
            return _parity_grm(out_prefix + ".grm.bin")
        if name == "pca_100k":
            return _parity_pca(out_prefix + ".eigenvec",
                               out_prefix + ".eigenval")
        if name == "vcf_import":
            # .pvar/.psam must byte-match plink2's import of the same VCF;
            # .pgen bytes legitimately differ (compressor representation
            # choices), so genotypes are decode-compared against the
            # SOURCE panel (import must round-trip the exporter exactly)
            res = []
            for ext in (".pvar", ".psam"):
                gold = _golden("o_vcfimp" + ext)
                if gold is None:
                    return "skipped:no-golden"
                res.append(_parity_text_equal(out_prefix + ext, gold))
            if any(r != "ok" for r in res):
                return ";".join(res)
            import numpy as np

            from plink_tpu.dataset import load_dataset

            a = load_dataset(out_prefix)
            b = load_dataset(os.path.join(BENCH_DIR, "p10000x32768"))
            if a.raw_variant_ct != b.raw_variant_ct:
                return "fail:variant-ct"
            return "ok" if np.array_equal(a.all_packed(), b.all_packed()) \
                else "fail:genotypes"
    except Exception as e:  # parity must never sink a landed timing
        return f"skipped:{type(e).__name__}"
    return "skipped"


def _drift_guard(name, parity):
    """Append :panel-drift if the input bytes differ from what the golden
    artifacts were measured on."""
    walls = _walls()
    rec = walls.get(_wall_key(name), {})
    try:
        if name == "vcf_import":
            want = rec.get("vcf_content_sha")
            have = _vcf_content_sha(os.path.join(BENCH_DIR, "imp10k.vcf.gz"))
        else:
            want = rec.get("panel_sha")
            pfx = _panel_prefix(name)
            have = _panel_sha(pfx) if pfx else None
        if want and have and want != have:
            return f"{parity}:panel-drift"
    except Exception:
        pass
    return parity


def _panel_prefix(name):
    return {
        "glm": os.path.join(BENCH_DIR, f"p{GLM_SAMPLES}x{GLM_VARIANTS}"),
        "indep_10k": os.path.join(BENCH_DIR, "p10000x32768"),
        "king_50k": os.path.join(BENCH_DIR, "p50000x32768"),
        "grm_50k": os.path.join(BENCH_DIR, "p50000x32768"),
        "pca_100k": os.path.join(BENCH_DIR, "p100000x32768s"),
    }.get(name)


def _wall_key(name):
    return {"glm": f"glm_{GLM_SAMPLES}x{GLM_VARIANTS}"}.get(name, name)


# --------------------------------------------------------------------------
# worker mode: one config, inside its own process
# --------------------------------------------------------------------------

def _worker(name):
    """Run one config (optional warmup + timed); print one JSON line."""
    # /tmp persists across checkouts on the bench host, .bench does not;
    # a warm XLA cache only shortens the warmup pass, never the timing
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        "/tmp/plink_tpu_jaxcache-"
        + (os.environ.get("JAX_PLATFORMS") or "default"))
    from plink_tpu.cli import main as cli_main

    spec = _configs()[name]
    argv, out_prefix, warmup = spec["argv"], spec["out"], spec["warmup"]
    if warmup:
        log(f"bench [{name}]: warmup ...")
        rc = cli_main(list(argv) + ["--out", out_prefix + ".warm", "--silent"])
        if rc != 0:
            print(json.dumps({"ok": False, "err": f"warmup rc={rc}"}))
            return 1
    log(f"bench [{name}]: timed ...")
    t0 = time.time()
    rc = cli_main(list(argv) + ["--out", out_prefix + ".timed", "--silent"])
    dt = time.time() - t0
    if rc != 0:
        print(json.dumps({"ok": False, "err": f"timed rc={rc}"}))
        return 1
    print(json.dumps({"ok": True, "timed_s": dt}))
    return 0


def _configs():
    toy = os.path.join(BENCH_DIR, "toy")
    p2 = os.path.join(BENCH_DIR, "p10000x32768")
    p3 = os.path.join(BENCH_DIR, "p50000x32768")
    p4 = os.path.join(BENCH_DIR, "p100000x32768s")  # structured (planted PCs)
    p5 = os.path.join(BENCH_DIR, f"p{GLM_SAMPLES}x{GLM_VARIANTS}")
    return {
        "glm": {
            "argv": ["--pfile", p5, "--glm", "hide-covar",
                     "--covar", p5 + ".cov"],
            "out": os.path.join(RUNS, "glm"), "warmup": True, "budget": 900,
        },
        "freq_toy": {
            "argv": ["--pfile", toy, "--freq", "--missing", "--hardy"],
            "out": os.path.join(RUNS, "toy"), "warmup": True, "budget": 240,
        },
        "indep_10k": {
            "argv": ["--pfile", p2, "--indep-pairwise", "200", "50", "0.2"],
            "out": os.path.join(RUNS, "indep"), "warmup": True, "budget": 420,
        },
        "king_50k": {
            "argv": ["--pfile", p3, "--make-king-table",
                     "--king-table-filter", "0.044"],
            "out": os.path.join(RUNS, "king"), "warmup": True, "budget": 420,
        },
        "grm_50k": {
            "argv": ["--pfile", p3, "--make-grm-bin"],
            "out": os.path.join(RUNS, "grm"), "warmup": False, "budget": 600,
        },
        "pca_100k": {
            "argv": ["--pfile", p4, "--pca", "10", "approx", "--seed", "13"],
            "out": os.path.join(RUNS, "pca"), "warmup": True, "budget": 700,
        },
        "vcf_import": {
            "argv": ["--vcf", os.path.join(BENCH_DIR, "imp10k.vcf.gz"),
                     "--make-pgen"],
            "out": os.path.join(RUNS, "vcfimp"), "warmup": True,
            "budget": 420,
        },
    }


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

def _preflight(env):
    """Tiny jitted op in a subprocess under a hard timeout.  Returns True
    iff the default backend initializes and computes."""
    code = (
        "import jax, jax.numpy as jnp;"
        "print('devices:', jax.devices());"
        "x = jnp.ones((128,128), jnp.bfloat16);"
        "print('preflight-sum', jax.jit(lambda a: (a@a).sum())(x))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], env=env,
            capture_output=True, timeout=PREFLIGHT_S, text=True,
        )
        if r.returncode == 0 and "preflight-sum" in r.stdout:
            log("bench: backend preflight OK: " + r.stdout.splitlines()[0])
            return True
        log(f"bench: preflight failed rc={r.returncode}: "
            + (r.stderr or "")[-400:])
        return False
    except subprocess.TimeoutExpired:
        log(f"bench: preflight TIMED OUT after {PREFLIGHT_S:.0f}s")
        return False


def _run_config(name, env, deadline):
    spec = _configs()[name]
    budget = min(spec["budget"], max(30, deadline - time.time()))
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", name],
            env=env, capture_output=True, timeout=budget, text=True,
        )
    except subprocess.TimeoutExpired:
        log(f"bench [{name}] TIMED OUT after {budget:.0f}s")
        return None
    sys.stderr.write(r.stderr or "")
    for line in reversed((r.stdout or "").splitlines()):
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if rec.get("ok"):
            rec["parity"] = _drift_guard(
                name, _parity(name, spec["out"] + ".timed"))
            log(f"bench [{name}]: {rec['timed_s']:.2f}s parity={rec['parity']}")
            return rec
        log(f"bench [{name}] FAILED: {rec.get('err')}")
        return None
    log(f"bench [{name}] FAILED rc={r.returncode}: " + (r.stderr or "")[-400:])
    return None


def _emit(metric, value, unit, vs, parity, suffix=""):
    print(json.dumps({
        "metric": metric + suffix,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "parity": parity,
    }), flush=True)


def main():
    if "--worker" in sys.argv:
        raise SystemExit(_worker(sys.argv[sys.argv.index("--worker") + 1]))

    os.makedirs(RUNS, exist_ok=True)
    deadline = time.time() + TOTAL_BUDGET
    walls = _walls()

    # Panels + covariates (seconds on a cold cache -- native generator).
    p5 = os.path.join(BENCH_DIR, f"p{GLM_SAMPLES}x{GLM_VARIANTS}")
    _gen_panel(p5, GLM_SAMPLES, GLM_VARIANTS, SEED, cov=True)
    _ensure_toy()

    env = dict(os.environ)
    suffix = ""
    if not _preflight(env):
        log("bench: retrying preflight once ...")
        if not _preflight(env):
            log("bench: TPU backend unavailable -> JAX_PLATFORMS=cpu fallback")
            env = _cpu_env(env)
            suffix = "_cpu_fallback"
            if not _preflight(env):
                _emit("backend_unavailable", 0.0, "none", None, "skipped")
                return

    # Headline config FIRST; its JSON line is printed LAST.
    rec = _run_config("glm", env, deadline)
    headline = None
    if rec:
        vps = GLM_VARIANTS / rec["timed_s"]
        base = walls.get(_wall_key("glm"), {}).get("wall_s")
        base_vps = (GLM_VARIANTS / base) if base else None
        headline = (
            f"glm_logistic_hybrid_variants_per_sec_{GLM_SAMPLES}samples",
            vps, "variants/sec",
            (vps / base_vps) if base_vps else None, rec["parity"])

    # Breadth configs (skipped past the deadline — headline already landed).
    breadth = [
        ("freq_toy", "freq_missing_hardy_toy_wall"),
        ("indep_10k", "indep_pairwise_10000x32768_wall"),
        ("king_50k", "king_table_50000x32768_wall"),
        ("grm_50k", "grm_bin_50000x32768_wall"),
        ("pca_100k", "pca_approx10_100000x32768_wall"),
        ("vcf_import", "vcf_bgzf_import_10000x32768_wall"),
    ]
    breadth_panels = {
        "indep_10k": (os.path.join(BENCH_DIR, "p10000x32768"),
                      10000, 32768, SEED, 0),
        "king_50k": (os.path.join(BENCH_DIR, "p50000x32768"),
                     50000, 32768, SEED, 0),
        "grm_50k": (os.path.join(BENCH_DIR, "p50000x32768"),
                    50000, 32768, SEED, 0),
        "pca_100k": (os.path.join(BENCH_DIR, "p100000x32768s"),
                     100000, 32768, 7, 10),
    }
    for name, metric in breadth:
        if time.time() > deadline - 60:
            log(f"bench [{name}]: skipped (deadline)")
            continue
        if name in breadth_panels:
            pfx, ns_, nv_, seed_, k_ = breadth_panels[name]
            _gen_panel(pfx, ns_, nv_, seed_, miss=0.02 if not k_ else 0.0,
                       k=k_)
        if name == "vcf_import":
            # the 10k source panel must exist for the export
            _gen_panel(os.path.join(BENCH_DIR, "p10000x32768"),
                       10000, 32768, SEED)
            _ensure_import_vcf()
        rec = _run_config(name, env, deadline)
        if rec:
            base = walls.get(_wall_key(name), {}).get("wall_s")
            vs = (base / rec["timed_s"]) if base else None
            _emit(metric, rec["timed_s"], "seconds", vs, rec["parity"],
                  suffix)

    # Headline line LAST (the driver parses the final JSON line).
    if headline:
        m, v, u, vs, par = headline
        _emit(m, v, u, vs, par, suffix)
    else:
        _emit("glm_headline_failed", 0.0, "none", None, "skipped", suffix)


if __name__ == "__main__":
    main()
