#!/usr/bin/env python
"""Headline benchmark: warm-started full-λ-path Lasso (BASELINE.json metric).

Problem: dense Gaussian design, n=10K, p=100K, s=100, 100-point log-spaced
λ path solved with warm starts by the block-CD engine (the reference's
LassoPath workload, lasso.jl:229-260, at the BASELINE.json scale).

Prints ONE JSON line:
  {"metric": ..., "value": <path wall-seconds>, "unit": "s",
   "vs_baseline": <speedup vs the NumPy sequential-CD oracle on the
                   reference's own cd_bench shape n=3000/p=5000>, ...}

The reference publishes no performance numbers (BASELINE.md), so
``vs_baseline`` is measured against this repo's NumPy re-derivation of the
reference's exact sequential algorithm (tests/oracle.py) on the reference's
benchmark shape (benchmark/cd_bench.jl:8-14), same λ and tolerance, same
machine/host.  Env knobs: BENCH_SMALL=1 (tiny smoke shapes),
BENCH_SKIP_ORACLE=1 (report vs_baseline=-1).
"""

import json
import os
import sys
import time


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _mem_report(tag):
    """BENCH_DEBUG_MEM=1: live device-array census at section boundaries
    (the 16 GB chip runs the heavy sections back-to-back with thin
    margins — a lingering GB-scale buffer OOMs a later section and the
    error surfaces far from the leak)."""
    if os.environ.get("BENCH_DEBUG_MEM") != "1":
        return
    import jax
    tot = 0
    big = []
    for a in jax.live_arrays():
        nb = a.size * a.dtype.itemsize
        tot += nb
        if nb > 50e6:
            big.append((round(nb / 1e9, 2), tuple(a.shape), str(a.dtype)))
    _log(f"mem[{tag}]: live {tot/1e9:.2f} GB; big: "
         f"{sorted(big, reverse=True)[:10]}")

import numpy as np


def main():
    import jax

    # persistent compilation cache (VERDICT r3 weak 5: compile_plus_run_s
    # grew 6 → 23 s as the bench gained programs; a 23 s one-time compile
    # for a 0.26 s solve is a real deployment cost).  First run populates
    # the cache; later runs reload compiled executables instead of
    # recompiling.  BENCH_NO_CACHE=1 opts out (to measure cold compiles).
    if os.environ.get("BENCH_NO_CACHE") != "1":
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/tmp/cdjl_tpu_jax_cache")
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              -1)
        except Exception as e:  # pragma: no cover - jax-version-specific
            _log(f"bench: compilation cache unavailable ({e})")

    # device-heavy self-contained sections (roofline, sharded 10K×100K,
    # p=1M) run in a CHILD process that owns the chip ALONE, spawned
    # BEFORE this process attaches to the backend: the tunnel session
    # never reclaims HBM while its process lives (measured: 0.04 GB of
    # live arrays yet RESOURCE_EXHAUSTED late in the run; a fresh
    # process alone on the chip allocates 10 GB fine, but a child
    # spawned while the parent is attached inherits the exhausted chip)
    heavy_extra = None
    if (not os.environ.get("BENCH_ONLY", "").startswith("heavy")
            and os.environ.get("BENCH_SMALL") != "1"
            and os.environ.get("BENCH_NO_ISOLATE") != "1"):
        try:
            import subprocess as _sp
            # ONE child per section, each a fresh process that owns the
            # chip alone: the tunnel leaks a few GB per big
            # build/release cycle within a session, so even two
            # full-shape sections in one process can exhaust it.  Retry
            # once per section (the tunnel reclaims a dead session's
            # HBM asynchronously; a re-run after a wait passes).
            heavy_extra = {}
            for section in ("roofline", "sharded", "p1m"):
                env = dict(os.environ)
                env["BENCH_ONLY"] = f"heavy:{section}"
                for attempt in range(2):
                    out = _sp.run([sys.executable,
                                   os.path.abspath(__file__)],
                                  env=env, capture_output=True,
                                  text=True, timeout=2400)
                    for line in out.stderr.splitlines():
                        _log(line)
                    hx = None
                    for line in out.stdout.splitlines():
                        if line.startswith('{"heavy_extra"'):
                            hx = json.loads(line)["heavy_extra"]
                    if hx is None:
                        _log(f"bench: heavy child [{section}] produced "
                             f"no result (rc={out.returncode})")
                        break
                    oom = any("RESOURCE_EXHAUSTED" in str(v)
                              for k, v in hx.items()
                              if k.endswith("_error"))
                    if not oom:
                        heavy_extra.update(hx)
                        break
                    if attempt == 0:
                        _log(f"bench: heavy child [{section}] hit "
                             "RESOURCE_EXHAUSTED; re-spawning after "
                             "reclaim wait")
                        time.sleep(45)
                    else:
                        heavy_extra.update(hx)
        except Exception as e:  # pragma: no cover
            _log(f"bench: heavy-sections child failed: {e}")

    # the axon TPU tunnel can be down for hours at a time (observed
    # backend-init UNAVAILABLE); a CPU fallback keeps the bench recording
    # a (small-mode) line instead of crashing the round
    try:
        dev = jax.devices()[0]
    except Exception as e:
        _log(f"bench: TPU backend unavailable ({type(e).__name__}); "
             f"falling back to CPU small mode")
        jax.config.update("jax_platforms", "cpu")
        dev = jax.devices()[0]

    import jax.numpy as jnp

    import coordinatedescent_jl_tpu as cd

    platform = dev.platform
    small = os.environ.get("BENCH_SMALL") == "1" or platform == "cpu"
    if small:
        n, p, s, L = 1000, 5000, 50, 20
    else:
        n, p, s, L = 10_000, 100_000, 100, 100

    if os.environ.get("BENCH_ONLY", "").startswith("heavy"):
        # child mode: ONLY the device-heavy self-contained sections, one
        # JSON line with their extra fields.  Placed BEFORE the headline
        # data generation — the child must not hold the 4 GB design
        # while the roofline/sharded sections build their own
        hx = {}
        which = (os.environ["BENCH_ONLY"].split(":", 1)[1]
                 if ":" in os.environ["BENCH_ONLY"] else None)
        if not small:
            _heavy_sections(
                hx, small, n, p,
                int(os.environ.get("BENCH_BLOCK_SIZE", "128")),
                float(os.environ.get("BENCH_TOL", "1e-6")), which)
        print(json.dumps({"heavy_extra": hx}, default=float), flush=True)
        return

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    X = jax.random.normal(k1, (n, p), dtype)
    # scatter the planted support across the feature range (a contiguous
    # support would sit in one coordinate block — unrealistically easy for
    # the active-set machinery)
    support = jax.random.choice(k4, p, (s,), replace=False)
    beta_true = jnp.zeros((p,), dtype).at[support].set(
        jax.random.normal(k2, (s,), dtype))
    y = (X @ beta_true + jax.random.normal(k3, (n,), dtype)
         ).block_until_ready()
    _log(f"bench: data ready (n={n}, p={p})")

    lammax = float(jax.jit(
        lambda X, y: jnp.max(jnp.abs(jnp.dot(
            y, X, precision=jax.lax.Precision.HIGHEST))) / n)(X, y))
    _log(f"bench: lammax {lammax:.4f}")
    lams = np.exp(np.linspace(np.log(0.5 * lammax),
                              np.log(0.05 * lammax), L))
    opt_tol = float(os.environ.get("BENCH_TOL", "1e-6"))
    block_iters = int(os.environ.get("BENCH_BLOCK_ITERS", "16"))
    inner = os.environ.get("BENCH_INNER", "auto")
    bs = int(os.environ.get("BENCH_BLOCK_SIZE", "128"))
    opts = cd.CDOptions(opt_tol=opt_tol, max_iter=300, block_size=bs,
                        randomize=False, block_iters=block_iters,
                        inner=inner)


    # first call compiles; second call times the cached executable
    t0 = time.perf_counter()
    # path_batch=0 pins the sequential scan: with the auto default the
    # library itself would pick the batched mode here — the bench records
    # BOTH executions (scan for continuity, batched for the headline)
    path = cd.lasso_path(X, y, lams, options=opts, standardize_X=False,
                         path_batch=0)
    jax.block_until_ready(path.beta_path)
    t_with_compile = time.perf_counter() - t0
    _log(f"bench: path compile+run {t_with_compile:.1f}s")

    t_path = float("inf")
    for _ in range(2):  # min-of-2: tunnel throughput varies run-to-run
        t0 = time.perf_counter()
        path = cd.lasso_path(X, y, lams, options=opts, standardize_X=False,
                             path_batch=0)
        jax.block_until_ready(path.beta_path)
        t_path = min(t_path, time.perf_counter() - t0)
    _log(f"bench: path run {t_path:.2f}s")

    # batched-path execution (coarse scan + batched certify/refine over a
    # union working set): one R@X GEMM certifies a whole chunk of λ points
    # per X read.  Config (batch=128 → one chunk, stride=99 = anchors at the
    # endpoints only) is the on-chip A/B winner (PERF.md round 3:
    # 0.25s vs 1.41s scan).  A lane
    # that fails the certify sweep falls back to the scan — that run is
    # recorded as NOT certified and its time is NOT used anywhere.
    import warnings as _warnings

    t_pb = float("inf")
    pb_cert = False
    pb_esc = 0
    pb_diff = float("nan")
    pst = {}
    pstride = min(99, L - 1)  # endpoints-only anchors at any grid length
    try:
        with _warnings.catch_warnings(record=True) as _wl:
            _warnings.simplefilter("always")
            pb = cd.lasso_path(X, y, lams, options=opts,
                               standardize_X=False, path_batch=128,
                               coarse_stride=pstride, stats=pst)  # compile
            float(jnp.sum(pb.beta_path))
            pb_cert = not any("did not certify" in str(w.message)
                              for w in _wl)
            pb_esc = max(pb_esc, pst.get("stall_escaped_lanes", 0))
        # agreement is taken from the compile call: batched and scan both
        # solved the UNPERTURBED grid there — diffing a perturbed-λ timed
        # rep against the unperturbed scan would conflate the λ
        # perturbation with batched-vs-scan divergence (same rationale as
        # the sharded section's same-λ comparison)
        if pb_cert and pb.beta_path.shape == path.beta_path.shape:
            pb_diff = float(jnp.max(jnp.abs(pb.beta_path
                                            - path.beta_path)))
        if pb_cert:
            for rep in range(2):
                t0 = time.perf_counter()
                with _warnings.catch_warnings(record=True) as _wl:
                    _warnings.simplefilter("always")
                    pb = cd.lasso_path(X, y, [l * (1.0 + 1e-7 * (rep + 1))
                                              for l in lams],
                                       options=opts, standardize_X=False,
                                       path_batch=128,
                                       coarse_stride=pstride, stats=pst)
                    float(jnp.sum(pb.beta_path))
                    pb_cert = pb_cert and not any(
                        "did not certify" in str(w.message) for w in _wl)
                    pb_esc = max(pb_esc,
                                 pst.get("stall_escaped_lanes", 0))
                t_pb = min(t_pb, time.perf_counter() - t0)
        _log(f"bench: path(batched) run {t_pb:.2f}s certified={pb_cert} "
             f"stall_escaped_lanes={pb_esc} "
             f"max|diff vs scan|={pb_diff:.2e}")
    except Exception as e:  # pragma: no cover - backend-specific
        _log(f"bench: path(batched) failed: {e}")

    gap, primal = cd.lasso_duality_gap_f64(
        X, y, path.beta_path[-1], float(lams[-1]))
    nnz = int(np.sum(np.asarray(path.beta_path[-1]) != 0))

    # compensated-f64 tier (VERDICT r3 missing 3 / item 4): measurement-
    # grade gap of the f32 point, then the f64 active-set polish to the
    # 1e-7 BASELINE criterion — both entirely on-device f64-accumulated
    # sweeps (ops/compensated.py)
    # the x64 context is SCOPED (jax.enable_x64): a global x64 flip
    # breaks the Pallas engine's index-dtype assumptions, and only the
    # compensated tier needs the wide type
    pol = {}
    try:
        with jax.enable_x64(True):
            gap_c, primal_c = cd.lasso_duality_gap_compensated(
                X, y, path.beta_path[-1], float(lams[-1]))
            pol["final_point_rel_gap_compensated"] = float(
                gap_c / max(primal_c, 1e-300))
            t_pol = float("inf")
            # min-of-2 (first call may absorb compiles / tunnel
            # re-uploads); the perturbed-λ rep runs FIRST so the recorded
            # certificate fields belong to the exact λ
            for lam_fac in (1.0 + 1e-9, 1.0):
                t0 = time.perf_counter()
                res = cd.polish_lasso(X, y, path.beta_path[-1],
                                      float(lams[-1]) * lam_fac,
                                      target_rel_gap=1e-7)
                t_pol = min(t_pol, time.perf_counter() - t0)
        pol["polish_s"] = round(t_pol, 4)
        pol["final_point_rel_gap_polished"] = float(res.rel_gap)
        pol["polish_rounds"] = int(res.rounds)
        pol["polish_converged"] = bool(res.converged)
        # BASELINE.json's stated metric is time-to-1e-7 gap: one warm
        # single solve plus the certifying polish of ITS OWN output (not
        # the path point's — a cold single solve may need more polish
        # work than a 100-point warm-path iterate), as one legible number
        lam_t = float(lams[-1]) * (1.0 + 2e-7)
        sol_t = cd.lasso(X, y, float(lams[-1]) * (1.0 + 1e-7))  # compile
        float(jnp.sum(sol_t.x))
        t0 = time.perf_counter()
        sol_t = cd.lasso(X, y, lam_t)
        float(jnp.sum(sol_t.x))
        t_single = time.perf_counter() - t0
        pol["single_solve_s"] = round(t_single, 4)
        t_pol2 = float("inf")
        with jax.enable_x64(True):
            for _ in range(2):
                t0 = time.perf_counter()
                res2 = cd.polish_lasso(X, y, sol_t.x, lam_t,
                                       target_rel_gap=1e-7)
                t_pol2 = min(t_pol2, time.perf_counter() - t0)
        if res2.converged:
            pol["time_to_1e7_gap_s"] = round(t_single + t_pol2, 4)
        _log(f"bench: polish rel_gap {res.rel_gap:.2e} "
             f"(from {pol['final_point_rel_gap_compensated']:.2e}) in "
             f"{pol['polish_s']}s, {res.rounds} rounds, "
             f"support {res.support_size}")
    except Exception as e:  # pragma: no cover - backend-specific
        pol["polish_error"] = f"{type(e).__name__}: {e}"[:200]
        _log(f"bench: polish failed: {e}")

    # --- estimator-surface timings (reference cd_bench runs multiple
    # configs, benchmark/cd_bench.jl:18-63; we track the whole surface) ----
    extra = {}
    if os.environ.get("BENCH_SKIP_EXTRAS") != "1":
        # sqrt-lasso at the universal level for the engine's |X_j'r| ≤ λ‖r‖
        # rule: λ ≈ 1.1·√(2·log p) (the reference's own test λs follow this
        # scale, test/lasso.jl:114/145; the √(2·log p/n) level of the
        # (1/n)-scaled Lasso is ~√n too small here and lands in a
        # degenerate dense-support regime)
        # PRODUCTION X-traffic of the benchmark solve itself (VERDICT r4
        # weak 6): the engine's in-trace read accounting, so the artifact
        # records what the real solve streams after caching/screening/
        # compaction — alongside the synthetic all-active microbench
        try:
            xt = cd.solve_x_traffic(X, y, float(lams[-1]), options=opts)
            extra["solve_achieved_x_gbs"] = round(xt.achieved_gbps, 2)
            extra["solve_x_bytes"] = int(xt.x_bytes)
            extra["solve_x_dense_equiv_bytes"] = int(xt.dense_equiv_bytes)
            extra["solve_x_traffic_saving"] = round(
                xt.dense_equiv_bytes / max(xt.x_bytes, 1), 2)
            _log(f"bench: solve X-traffic {xt.x_bytes/1e9:.3f} GB in "
                 f"{xt.seconds:.3f}s = {xt.achieved_gbps:.1f} GB/s "
                 f"({xt.dense_equiv_bytes/max(xt.x_bytes,1):.1f}x less "
                 f"than a cache-less engine)")
        except Exception as e:  # pragma: no cover - backend-specific
            extra["solve_x_traffic_error"] = f"{type(e).__name__}: {e}"[:200]
            _log(f"bench: solve_x_traffic failed: {e}")

        _mem_report("pre-sqrt")
        lam_sq = 1.1 * float(np.sqrt(2 * np.log(p)))
        # reference-default semantics: warmStart=true ⇒ ONE direct solve
        # at λ from the supplied (zero) start (utils.jl:19,
        # coordinate_descent.jl:20) — rounds 1-2 benchmarked a 30-step
        # λ-continuation instead, 5× more work than the reference's own
        # default configuration (PERF.md round-3 A/B: 0.73 s → 0.14 s,
        # identical support, coefficient diff ~4e-6 = the f32 floor)
        opts_sq = cd.CDOptions(opt_tol=opt_tol, max_iter=300,
                               randomize=False, block_size=bs)
        # every extra is timed min-of-2 with host-read syncs: the first
        # timed call can absorb a one-time device-side executable
        # re-upload through the tunnel (observed ~10x inflation when many
        # programs are live), and block_until_ready does not reliably
        # wait here (PERF.md)
        sol = cd.sqrt_lasso(X, y, lam_sq, options=opts_sq,
                            standardize_X=False)  # compile
        float(jnp.sum(sol.x))  # host read: the only reliable sync here
        t_sq = float("inf")
        for rep in range(2):
            lam_rep_sq = lam_sq * (1.0 + 1e-7 * (rep + 1))
            t0 = time.perf_counter()
            sol = cd.sqrt_lasso(X, y, lam_rep_sq,
                                options=opts_sq, standardize_X=False)
            nnz_sq = int(jnp.sum(sol.x != 0))  # host read = sync
            t_sq = min(t_sq, time.perf_counter() - t0)
        # scale-free sqrt-KKT residual max(|X_j'r|/‖r‖ − λ, 0) at the
        # solved λ — recorded because the direct solve's certificate sits
        # at the f32 floor (~1e-5 relative) rather than exactly 0
        r_sq = jnp.asarray(sol.residuals)
        c_sq = jax.jit(lambda X, r: jnp.abs(jnp.dot(
            r, X, precision=jax.lax.Precision.HIGHEST)))(X, r_sq)
        rn_sq = float(jnp.sqrt(jnp.dot(
            r_sq, r_sq, precision=jax.lax.Precision.HIGHEST)))
        kkt_sq = float(jnp.max(jnp.maximum(
            c_sq / rn_sq - lam_rep_sq, 0.0)))
        extra["sqrt_lasso_s"] = round(t_sq, 4)
        extra["sqrt_lasso_nnz"] = nnz_sq
        extra["sqrt_lasso_kkt_residual"] = kkt_sq
        # measurement-grade (f64-accumulated, hybrid-sweep) relative
        # sqrt-KKT — the f32 on-device certificate above saturates at
        # the dtype floor; this records the true value
        try:
            with jax.enable_x64(True):
                kkt_c, _ = cd.sqrt_lasso_kkt_compensated(
                    X, y, sol.x, lam_rep_sq)
            extra["sqrt_lasso_kkt_rel_compensated"] = float(kkt_c)
        except Exception as e:  # pragma: no cover - backend-specific
            extra["sqrt_kkt_compensated_error"] = str(e)[:120]
        _log(f"bench: sqrt-lasso {extra['sqrt_lasso_s']}s nnz={nnz_sq} "
             f"kkt={kkt_sq:.2e}")
        # 1e-7 certification tier (VERDICT r4 missing 3): f64 active-set
        # polish with the exact three-branch minimizer
        try:
            t0 = time.perf_counter()
            with jax.enable_x64(True):
                rsq = cd.polish_sqrt_lasso(X, y, sol.x, lam_rep_sq)
            extra["sqrt_polish_s"] = round(time.perf_counter() - t0, 4)
            extra["sqrt_kkt_rel_polished"] = float(rsq.kkt_rel)
            extra["sqrt_polish_converged"] = bool(rsq.converged)
            _log(f"bench: sqrt polish {extra['sqrt_polish_s']}s kkt_rel "
                 f"{rsq.kkt_rel:.2e} conv={rsq.converged}")
        except Exception as e:  # pragma: no cover - backend-specific
            extra["sqrt_polish_error"] = str(e)[:120]

        lam_sc = float(np.sqrt(2 * np.log(p) / n))
        sol = cd.scaled_lasso(X, y, lam_sc)  # compile
        float(jnp.sum(sol.x))
        t_sc = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            sol = cd.scaled_lasso(X, y, lam_sc * (1.0 + 1e-7 * (rep + 1)))
            sig = float(sol.sigma)
            t_sc = min(t_sc, time.perf_counter() - t0)
        extra["scaled_lasso_s"] = round(t_sc, 4)
        _log(f"bench: scaled-lasso {extra['scaled_lasso_s']}s sig={sig:.3f}")
        try:
            t0 = time.perf_counter()
            with jax.enable_x64(True):
                rsc = cd.polish_scaled_lasso(
                    X, y, sol.x, lam_sc * (1.0 + 2e-7))
            extra["scaled_polish_s"] = round(time.perf_counter() - t0, 4)
            extra["scaled_rel_gap_polished"] = float(rsc.rel_gap)
            extra["scaled_sigma_rel_change"] = float(rsc.sigma_rel_change)
            extra["scaled_polish_converged"] = bool(rsc.converged)
            _log(f"bench: scaled polish {extra['scaled_polish_s']}s "
                 f"rel_gap {rsc.rel_gap:.2e} dsig {rsc.sigma_rel_change:.1e} "
                 f"conv={rsc.converged}")
        except Exception as e:  # pragma: no cover - backend-specific
            extra["scaled_polish_error"] = str(e)[:120]

        # feasible (heteroscedastic) lasso at the same shape — the last
        # untimed L4 estimator (VERDICT r3 item 5); loadings fixed point
        # with the screening init, reference lasso.jl:154-194
        sol = cd.feasible_lasso(X, y, lam_sc)  # compile
        float(jnp.sum(sol.x))
        t_fe = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            sol = cd.feasible_lasso(X, y,
                                    lam_sc * (1.0 + 1e-7 * (rep + 1)))
            nnz_fe = int(jnp.sum(sol.x != 0))
            t_fe = min(t_fe, time.perf_counter() - t0)
        extra["feasible_lasso_s"] = round(t_fe, 4)
        _log(f"bench: feasible-lasso {extra['feasible_lasso_s']}s "
             f"nnz={nnz_fe}")
        try:
            t0 = time.perf_counter()
            with jax.enable_x64(True):
                rfe = cd.polish_feasible_lasso(
                    X, y, sol.x, lam_sc * (1.0 + 2e-7))
            extra["feasible_polish_s"] = round(time.perf_counter() - t0, 4)
            extra["feasible_rel_gap_polished"] = float(rfe.rel_gap)
            extra["feasible_loading_rel_change"] = float(
                rfe.loading_rel_change)
            extra["feasible_polish_converged"] = bool(rfe.converged)
            _log(f"bench: feasible polish {extra['feasible_polish_s']}s "
                 f"rel_gap {rfe.rel_gap:.2e} dgam "
                 f"{rfe.loading_rel_change:.1e} conv={rfe.converged}")
        except Exception as e:  # pragma: no cover - backend-specific
            extra["feasible_polish_error"] = str(e)[:120]

        # varying-coefficient grid scan (PERF.md config: 1000 eval points)
        nv, pv, gv = (200, 20, 100) if small else (500, 50, 1000)
        kv = jax.random.split(jax.random.PRNGKey(7), 3)
        zv = jax.random.uniform(kv[0], (nv,), dtype)
        Xv = jax.random.normal(kv[1], (nv, pv), dtype)
        yv = (jnp.sin(2 * jnp.pi * zv) * Xv[:, 0]
              + 0.3 * jax.random.normal(kv[2], (nv,), dtype))
        zgrid = jnp.linspace(0.05, 0.95, gv)
        kern = cd.GaussianKernel(0.1)
        out, _ = cd.locpolyl1(Xv, zv, yv, zgrid, 1, kern, 0.05,
                              grid_batch=0)  # compile (scan)
        float(jnp.sum(out))
        t_vc = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            out, _ = cd.locpolyl1(Xv, zv, yv, zgrid, 1, kern,
                                  0.05 + 1e-7 * (rep + 1), grid_batch=0)
            ok = bool(jnp.all(jnp.isfinite(out)))  # host read = sync
            t_vc = min(t_vc, time.perf_counter() - t0)
        extra["locpolyl1_scan_s"] = round(t_vc, 4)
        # batched grid execution — grid_batch pinned EXPLICITLY (like the
        # λ-path's path_batch=128 above): relying on the auto default
        # would silently time a second scan on CPU runs (where the
        # default resolves to 0) and record it as a certified batched
        # measurement.  Same certified-or-fallback discipline as the
        # λ-path: a fallback rep's time is never recorded
        import warnings as _wv

        t_vb = float("inf")
        vst = {}
        vb_esc = 0
        with _wv.catch_warnings(record=True) as _wsv:
            _wv.simplefilter("always")
            outb, _ = cd.locpolyl1(Xv, zv, yv, zgrid, 1, kern, 0.05,
                                   grid_batch=128, stats=vst)
            float(jnp.sum(outb))
            vb_esc = max(vb_esc, vst.get("stall_escaped_lanes", 0))
            for rep in range(2):
                t0 = time.perf_counter()
                outb, _ = cd.locpolyl1(Xv, zv, yv, zgrid, 1, kern,
                                       0.05 + 1e-7 * (rep + 1),
                                       grid_batch=128, stats=vst)
                float(jnp.sum(outb))
                t_vb = min(t_vb, time.perf_counter() - t0)
                vb_esc = max(vb_esc, vst.get("stall_escaped_lanes", 0))
            vb_cert = not any("falling back" in str(w.message)
                              for w in _wsv)
        extra["locpolyl1_batched_certified"] = bool(vb_cert)
        extra["locpolyl1_stall_escaped_lanes"] = int(vb_esc)
        if vb_cert:
            extra["locpolyl1_batched_s"] = round(t_vb, 4)
            extra["locpolyl1_batched_vs_scan_max_abs_diff"] = float(
                jnp.max(jnp.abs(outb - out)))
            t_vc = min(t_vc, t_vb)
        extra["locpolyl1_s"] = round(t_vc, 4)
        _log(f"bench: locpolyl1 {extra['locpolyl1_s']}s (scan "
             f"{extra['locpolyl1_scan_s']}s, batched "
             f"{extra.get('locpolyl1_batched_s', 'not-recorded')}s "
             f"certified={vb_cert}) finite={ok}")

        # unpenalized local polynomial on the same grid (reference
        # locpoly_bench.jl:188-288 config family; batched weighted lstsq)
        out_lp = cd.locpoly(Xv, zv, yv, zgrid, 1, kern)  # compile
        float(jnp.sum(out_lp))
        t_lp = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            out_lp = cd.locpoly(Xv, zv, yv, zgrid, 1,
                                cd.GaussianKernel(0.1 + 1e-7 * (rep + 1)))
            float(jnp.sum(out_lp))
            t_lp = min(t_lp, time.perf_counter() - t0)
        extra["locpoly_s"] = round(t_lp, 4)
        _log(f"bench: locpoly {extra['locpoly_s']}s")

        # bandwidth LOO-CV — the most expensive reference surface (each
        # bandwidth = n held-out weighted-lasso fits, :82-137) and the
        # 32x batched win of round 3 (VERDICT item 5: previously only in
        # PERF.md).  Sequential timed once (it IS the expensive path);
        # batched min-of-2 with the certified-or-fallback discipline
        h_arr = [0.08, 0.12, 0.2, 0.3]
        ncv = min(nv, 500)
        Xcv, zcv, ycv = Xv[:ncv], zv[:ncv], yv[:ncv]
        t0 = time.perf_counter()
        mse_seq = cd.lvocv_locpolyl1(Xcv, zcv, ycv, 1, h_arr,
                                     cd.GaussianKernel, 0.05, cv_batch=0)
        float(jnp.sum(mse_seq))
        extra["lvocv_locpolyl1_seq_s"] = round(time.perf_counter() - t0, 4)
        cvst = {}
        cv_esc = 0
        cv_res = 0
        t_cvb = float("inf")
        with _wv.catch_warnings(record=True) as _wcv:
            _wv.simplefilter("always")
            # unperturbed compile call — also the comparison point for
            # the vs-seq diff (diffing a perturbed-h timed rep against
            # the unperturbed sequential MSEs would conflate the h
            # perturbation with batched-mode disagreement, same as the
            # path's pb_diff rule)
            mse_b0 = cd.lvocv_locpolyl1(Xcv, zcv, ycv, 1, h_arr,
                                        cd.GaussianKernel, 0.05,
                                        cv_batch=128, stats=cvst)
            float(jnp.sum(mse_b0))
            cv_esc = max(cv_esc, cvst.get("stall_escaped_lanes", 0))
            for rep in range(2):
                t0 = time.perf_counter()
                mse_b = cd.lvocv_locpolyl1(
                    Xcv, zcv, ycv, 1,
                    [h * (1.0 + 1e-7 * (rep + 1)) for h in h_arr],
                    cd.GaussianKernel, 0.05, cv_batch=128, stats=cvst)
                float(jnp.sum(mse_b))
                t_cvb = min(t_cvb, time.perf_counter() - t0)
                cv_esc = max(cv_esc, cvst.get("stall_escaped_lanes", 0))
                cv_res = max(cv_res,
                             cvst.get("lanes_resolved_sequentially", 0))
            cv_cert = not any("recomputing" in str(w.message)
                              for w in _wcv)
        extra["lvocv_locpolyl1_batched_certified"] = bool(cv_cert)
        # escape-accepted lanes REMAINING in the output (always 0 since
        # round 5 — escaped lanes are re-solved at strict tol; the
        # resolved count is recorded for observability)
        extra["lvocv_stall_escaped_lanes"] = int(cv_esc)
        extra["lvocv_lanes_resolved_sequentially"] = int(cv_res)
        if cv_cert:
            extra["lvocv_locpolyl1_batched_s"] = round(t_cvb, 4)
            extra["lvocv_batched_vs_seq_max_rel_diff"] = float(
                jnp.max(jnp.abs(mse_b0 - mse_seq) / mse_seq))
        extra["lvocv_locpolyl1_s"] = round(
            min(extra["lvocv_locpolyl1_seq_s"],
                t_cvb if cv_cert else float("inf")), 4)
        _log(f"bench: lvocv_locpolyl1 {extra['lvocv_locpolyl1_s']}s (seq "
             f"{extra['lvocv_locpolyl1_seq_s']}s, batched "
             f"{extra.get('lvocv_locpolyl1_batched_s', 'not-recorded')}s "
             f"certified={cv_cert})")

        _mem_report("pre-group")
        # group lasso (AtomIterate surface) at the BASELINE shape
        # (VERDICT r2 item 5): G=8 groups, scattered support, λ at
        # 0.3·group-λmax (sparse-recovery regime).  Free the 4 GB path
        # design first (keeps HBM headroom for the group build's blocked
        # layout + batched Gram einsum)
        del X, y, beta_true, path, sol, out
        ngrp, pgrp, Ggrp = (500, 2000, 8) if small else (10_000, 100_000, 8)
        n_act = 12
        kg = jax.random.split(jax.random.PRNGKey(11), 3)
        Xg = jax.random.normal(kg[0], (ngrp, pgrp), dtype)
        bg = jnp.zeros((pgrp,), dtype)
        gsup = jax.random.choice(kg[1], pgrp // Ggrp, (n_act,),
                                 replace=False)
        for gix in np.asarray(gsup):
            bg = bg.at[gix * Ggrp:(gix + 1) * Ggrp].set(1.0)
        yg = Xg @ bg + 0.3 * jax.random.normal(kg[2], (ngrp,), dtype)
        cg = jax.jit(lambda A, b: jnp.dot(
            A.T, b, precision=jax.lax.Precision.HIGHEST))(Xg, yg)
        gn = jnp.sqrt(jnp.sum(jnp.reshape(cg, (-1, Ggrp)) ** 2,
                              axis=1)) / ngrp
        lam_g = 0.3 * float(jnp.max(gn))
        og = cd.CDOptions(opt_tol=opt_tol, randomize=False)
        sol = cd.group_lasso(Xg, yg, lam_g, Ggrp, options=og)  # compile
        float(jnp.sum(sol.x))
        t_g = float("inf")
        for rep in range(2):
            lam_rep_g = lam_g * (1.0 + 1e-7 * (rep + 1))
            t0 = time.perf_counter()
            sol = cd.group_lasso(Xg, yg, lam_rep_g, Ggrp, options=og)
            nzg = int(jnp.sum(jnp.any(
                jnp.reshape(sol.x, (-1, Ggrp)) != 0, axis=1)))
            t_g = min(t_g, time.perf_counter() - t0)
        extra["group_lasso_s"] = round(t_g, 4)
        extra["group_lasso_shape"] = {"n": ngrp, "p": pgrp, "G": Ggrp,
                                      "active_groups": n_act}
        # measurement-grade relative group-KKT (f64-accumulated hybrid
        # sweep) — the third iterate kind's certificate
        try:
            with jax.enable_x64(True):
                kkt_g, _ = cd.group_lasso_kkt_compensated(
                    Xg, yg, sol.x, lam_rep_g, Ggrp)
            extra["group_kkt_rel_compensated"] = float(kkt_g)
        except Exception as e:  # pragma: no cover - backend-specific
            extra["group_kkt_compensated_error"] = str(e)[:120]
        _log(f"bench: group-lasso {extra['group_lasso_s']}s "
             f"(n={ngrp}, p={pgrp}) nnz_groups={nzg} kkt_c="
             f"{extra.get('group_kkt_rel_compensated', 'n/a')}")
        try:
            t0 = time.perf_counter()
            with jax.enable_x64(True):
                rgl = cd.polish_group_lasso(Xg, yg, sol.x, lam_rep_g,
                                            Ggrp)
            extra["group_polish_s"] = round(time.perf_counter() - t0, 4)
            extra["group_kkt_rel_polished"] = float(rgl.kkt_rel)
            extra["group_polish_converged"] = bool(rgl.converged)
            _log(f"bench: group polish {extra['group_polish_s']}s "
                 f"kkt_rel {rgl.kkt_rel:.2e} conv={rgl.converged}")
        except Exception as e:  # pragma: no cover - backend-specific
            extra["group_polish_error"] = str(e)[:120]

        # free the 4 GB group design before the host-side sections and
        # the heavy-tier child spawn
        del Xg, yg, bg, cg, sol
        # multi-process strong-scaling artifact (VERDICT r4 missing 2):
        # 2-process Gloo CPU mesh vs 1-process, 1 pinned core each, plus
        # the compiled program's static collective schedule — runs on
        # the host CPU, so it records regardless of TPU availability
        try:
            if small and os.environ.get("BENCH_MULTIPROC") != "1":
                raise RuntimeError("skipped in small mode "
                                   "(BENCH_MULTIPROC=1 forces)")
            import subprocess as _sp
            out = _sp.run([sys.executable,
                           os.path.join(os.path.dirname(
                               os.path.abspath(__file__)),
                               "tools", "multiproc_bench.py")],
                          capture_output=True, text=True, timeout=1200)
            mp = json.loads(out.stdout.strip().splitlines()[-1])
            extra["multiproc_efficiency"] = mp.get("efficiency")
            extra["multiproc_detail"] = mp
            _log(f"bench: multiproc 2-proc efficiency "
                 f"{mp.get('efficiency')} (T1 {mp.get('t_1proc_s')}s, "
                 f"T2 {mp.get('t_2proc_s')}s)")
        except Exception as e:  # pragma: no cover - spawn-restricted envs
            extra["multiproc_error"] = f"{type(e).__name__}: {e}"[:200]
            _log(f"bench: multiproc measurement failed: {e}")

        if heavy_extra is not None:
            extra.update(heavy_extra)
        elif small or os.environ.get("BENCH_NO_ISOLATE") == "1":
            _heavy_sections(extra, small, n, p, bs, opt_tol)
        else:
            # the start-of-run child failed — last-resort inline attempt
            extra["heavy_sections_child_failed"] = True
            _heavy_sections(extra, small, n, p, bs, opt_tol)

    # --- vs_baseline: NumPy sequential-CD oracle on the reference's
    # cd_bench shape (benchmark/cd_bench.jl:8-14), same λ / tolerance ------
    speedup = -1.0
    oracle_s = ours_small_s = -1.0
    load1 = -1.0
    if os.environ.get("BENCH_SKIP_ORACLE") != "1":
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests"))
        from oracle import cd_lasso

        no, po, so = (500, 1000, 20) if small else (3000, 5000, 100)
        rng = np.random.default_rng(1)
        Xo = rng.standard_normal((no, po))
        bo = np.zeros(po)
        bo[:so] = rng.standard_normal(so)
        yo = Xo @ bo + rng.standard_normal(no)
        lam_o = 0.1 * float(np.max(np.abs(Xo.T @ yo)) / no)
        tol_o = 1e-6

        # median-of-5 with a recorded host-load estimate: the oracle's wall
        # time varies several-fold with host load (PERF.md), and the
        # recorded vs_baseline should not inherit that noise
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            beta_np, _ = cd_lasso(Xo, yo, lam_o, max_epochs=200, tol=tol_o)
            times.append(time.perf_counter() - t0)
        oracle_s = float(np.median(times))
        oracle_times = [round(t, 3) for t in times]
        try:
            load1 = float(os.getloadavg()[0])
        except OSError:
            pass
        _log(f"bench: oracle median {oracle_s:.2f}s "
             f"(all {oracle_times}, load {load1:.1f})")

        opts_o = cd.CDOptions(opt_tol=tol_o, max_iter=200, block_size=128,
                              randomize=False)
        Xo_d = jnp.asarray(Xo, dtype)
        yo_d = jnp.asarray(yo, dtype)
        sol = cd.lasso(Xo_d, yo_d, lam_o, options=opts_o)  # compile
        float(jnp.sum(sol.x))
        ours_small_s = float("inf")
        for rep in range(2):   # min-of-2: see the extras comment
            t0 = time.perf_counter()
            sol = cd.lasso(Xo_d, yo_d, lam_o * (1.0 + 1e-7 * rep),
                           options=opts_o)
            float(jnp.sum(sol.x))
            ours_small_s = min(ours_small_s, time.perf_counter() - t0)
        agree = float(np.max(np.abs(np.asarray(sol.x) - beta_np)))
        speedup = oracle_s / ours_small_s

    # headline = the best CERTIFIED configuration: the batched path's
    # output passes the same order-independent full-KKT certification as
    # the scan (and the recorded max|diff| is ~solver tolerance), so when
    # it certifies AND wins it IS the framework's path time; a fallback
    # run never contributes a time anywhere
    t_best = min(t_path, t_pb) if pb_cert else t_path
    metric = ("lasso_path_wall_time_n10k_p100k_100pts"
              if not small else "lasso_path_wall_time_small")

    # Long-form details go on a SEPARATE line printed FIRST: the driver
    # tail-captures ~2,000 chars and parses the last JSON line, and in r4
    # the single giant line pushed `value`/`vs_baseline` out of the
    # capture window (VERDICT r4 weak 2 / next-item 1).  The final line
    # below is a compact headline kept well under the window.
    full_details = {
        "platform": platform,
        "shape": {"n": n, "p": p, "s": s, "path_points": L},
        "opt_tol": opt_tol,
        "inner": inner,
        "path_points_per_s": round(L / t_best, 3),
        "path_scan_s": round(t_path, 4),
        "path_batched_s": (round(t_pb, 4)
                           if t_pb != float("inf") else None),
        "path_batched_certified": bool(pb_cert),
        "path_stall_escaped_lanes": int(pb_esc),
        "path_batched_vs_scan_max_abs_diff":
            (None if not np.isfinite(pb_diff) else pb_diff),
        "compile_plus_run_s": round(t_with_compile, 4),
        "final_point_duality_gap": float(gap),
        "final_point_rel_gap": float(gap / max(primal, 1e-300)),
        "final_point_nnz": nnz,
        **pol,
        "oracle_cd_bench_s": round(oracle_s, 4),
        "ours_cd_bench_s": round(ours_small_s, 4),
        "oracle_host_load1": round(load1, 2),
        "oracle_times_s": oracle_times if oracle_s > 0 else None,
        "oracle_solution_max_abs_diff":
            float(agree) if speedup > 0 else None,
        **extra,
        "note": "vs_baseline = NumPy sequential-CD oracle time / ours "
                "on reference cd_bench shape; reference publishes no "
                "numbers (BASELINE.md).  final_point_rel_gap is the "
                "f32 engine's floor (~1e-6); the compensated-f64 "
                "active-set polish (models/polish.py) certifies "
                "final_point_rel_gap_polished, meeting the 1e-7 "
                "BASELINE criterion on-chip by measurement",
    }
    print(json.dumps({"metric": metric, "full_details": full_details}),
          flush=True)

    # one number per surface + certified flags; anything absent is
    # silently skipped so small/CPU mode stays compact too
    _compact_keys = [
        "path_scan_s", "path_batched_s", "path_batched_certified",
        "compile_plus_run_s", "single_solve_s",
        "final_point_rel_gap_polished", "time_to_1e7_gap_s",
        "sqrt_lasso_s", "sqrt_kkt_rel_polished",
        "scaled_lasso_s", "scaled_rel_gap_polished",
        "feasible_lasso_s", "feasible_rel_gap_polished",
        "locpoly_s", "locpolyl1_s", "locpolyl1_batched_certified",
        "lvocv_locpolyl1_s", "lvocv_locpolyl1_batched_certified",
        "group_lasso_s", "group_kkt_rel_polished",
        "sharded_1dev_s", "group_sharded_1dev_s",
        "sharded_path_1dev_s", "sharded_path_batched_certified",
        "row_sharded_1dev_s",
        "sharded_p1m_s", "sharded_p1m_certified",
        "sharded_path_p1m_s", "sharded_path_p1m_certified",
        "pass_roofline_gbs", "pass_roofline_frac_measured",
        "pass_roofline_stream_gbs", "pass_roofline_stream_frac_measured",
        "solve_achieved_x_gbs",
        "multiproc_efficiency",
        "oracle_cd_bench_s",
    ]
    merged = {**pol, **extra, **{
        "path_scan_s": round(t_path, 4),
        "path_batched_s": (round(t_pb, 4)
                           if t_pb != float("inf") else None),
        "path_batched_certified": bool(pb_cert),
        "compile_plus_run_s": round(t_with_compile, 4),
        "oracle_cd_bench_s": round(oracle_s, 4),
    }}
    compact = {k: merged[k] for k in _compact_keys if k in merged}
    print(json.dumps({
        "metric": metric,
        "value": round(t_best, 4),
        "unit": "s",
        "vs_baseline": round(speedup, 2),
        "details": compact,
    }), flush=True)




def _heavy_sections(extra, small, n, p, bs, opt_tol, which=None):
    """Device-heavy self-contained sections (roofline, 10Kx100K sharded
    tier, p=1M): normally executed in a CHILD process via BENCH_ONLY=heavy
    — the long-lived bench session exhausts tunnel-device HBM that neither
    array deletion nor jax.clear_caches() reclaims (measured: 0.04 GB of
    live arrays yet RESOURCE_EXHAUSTED on a 4 GB alloc, while a fresh
    process allocates 10 GB fine).  Each section builds its own data."""
    import jax
    import jax.numpy as jnp

    import coordinatedescent_jl_tpu as cd  # noqa: F401 (section imports)

    if which in (None, "roofline"):
        _roofline_section(extra, small, n, p, bs)
    if which in (None, "sharded"):
        _sharded_section(extra, small, opt_tol)
    if which in (None, "p1m"):
        _p1m_section(extra, small, opt_tol)


def _roofline_section(extra, small, n, p, bs):
    import jax  # noqa: F401
    import jax.numpy as jnp  # noqa: F401

    import coordinatedescent_jl_tpu as cd

    dtype = jnp.float32  # noqa: F841

    # fused-pass roofline at the headline shape (the north-star
    # kernel-level metric, VERDICT r3 weak 1: pass_roofline existed
    # but was never driver-captured).  pass_roofline builds its OWN
    # (n, p) design + blocked layout, so the group design (4 GB at
    # full scale) is freed first.  The measured-peak fraction is the
    # honest number on the virtualized tunnel (its deliverable
    # bandwidth is ~0.2-0.3 of spec and fluctuates run-to-run);
    # spec-fraction is recorded for cross-device comparability
    try:
        if small:
            # small-mode slopes (ms-scale passes through the tunnel)
            # are noise-dominated and print absurd numbers; the
            # roofline is a full-shape metric only
            raise RuntimeError("skipped in small mode (noise-dominated)")
        rr, rs = cd.pass_roofline_multi(n, p, block_size=bs,
                                        iters_list=(16, 1))
        extra["pass_roofline_gbs"] = round(rr.achieved_gbps, 2)
        extra["pass_roofline_frac_measured"] = round(
            rr.fraction_of_measured_peak, 4)
        extra["pass_roofline_frac_spec"] = round(
            rr.fraction_of_roofline, 4)
        extra["pass_roofline_measured_peak_gbs"] = round(
            rr.measured_peak_gbps, 2)
        extra["pass_roofline_seconds_per_pass"] = round(
            rr.seconds_per_pass, 6)
        _log(f"bench: pass_roofline {rr.achieved_gbps:.1f} GB/s "
             f"({rr.fraction_of_measured_peak:.2f}x measured peak "
             f"{rr.measured_peak_gbps:.1f} GB/s, "
             f"{rr.fraction_of_roofline:.2f} of spec)")
        # streaming-bound configuration (iters=1): the production
        # pass does 16 inner FISTA steps per block read and is
        # compute-rich — this line is the pure-bandwidth roofline
        # (shares the build + peak with the line above)
        extra["pass_roofline_stream_gbs"] = round(rs.achieved_gbps, 2)
        extra["pass_roofline_stream_frac_measured"] = round(
            rs.fraction_of_measured_peak, 4)
        _log(f"bench: pass_roofline(iters=1) "
             f"{rs.achieved_gbps:.1f} GB/s "
             f"({rs.fraction_of_measured_peak:.2f}x measured peak)")
    except Exception as e:  # pragma: no cover - backend-specific
        extra["pass_roofline_error"] = f"{type(e).__name__}: {e}"[:200]
        _log(f"bench: pass_roofline failed: {e}")




def _sharded_section(extra, small, opt_tol):
    import jax
    import jax.numpy as jnp

    import coordinatedescent_jl_tpu as cd

    dtype = jnp.float32
    _mem_report("pre-sharded")
    # feature-sharded solver on a 1-dev mesh: exercises the real
    # shard_map + collective composition on the actual backend
    # (VERDICT r1 item 4).  Certificates use all_gather+max instead of
    # pmax (parallel/sharded_cd._pmax_scalar) so the axon AOT compiler
    # accepts the program; gated because sharded support through the
    # tunnel is still the least-proven surface
    try:
        from jax.sharding import Mesh
        mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("feature",))
        # headline shape (VERDICT r3 item 2 closed): the sharded
        # programs now pad X INSIDE the trace (XLA fuses the pad into
        # the blockify copy), so the live set is X + blocked layout —
        # 10K×100K fits one v5e chip (measured 0.13 s solve / 0.25 s
        # 100-pt batched path; rounds 1-3 OOMed above 5K×50K)
        ns, ps = (500, 2000) if small else (10_000, 100_000)
        ks = jax.random.split(jax.random.PRNGKey(13), 3)
        Xs = jax.random.normal(ks[0], (ns, ps), dtype)
        bs_true = jnp.zeros((ps,), dtype).at[:40].set(
            jax.random.normal(ks[1], (40,), dtype))
        ys = Xs @ bs_true + 0.3 * jax.random.normal(ks[2], (ns,), dtype)
        lam_s = 0.1 * float(jnp.max(jnp.abs(jnp.dot(
            ys, Xs, precision=jax.lax.Precision.HIGHEST))) / ns)
        os_ = cd.CDOptions(opt_tol=opt_tol, randomize=False)
        sol_sh = cd.parallel.lasso_sharded(Xs, ys, lam_s, mesh1,
                                           options=os_)  # compile
        float(jnp.sum(sol_sh.x))
        t_sh = float("inf")
        lam_rep = lam_s
        for rep in range(2):
            lam_rep = lam_s * (1.0 + 1e-7 * (rep + 1))
            t0 = time.perf_counter()
            sol_sh = cd.parallel.lasso_sharded(Xs, ys, lam_rep, mesh1,
                                               options=os_)
            nnz_sh = int(jnp.sum(sol_sh.x != 0))
            t_sh = min(t_sh, time.perf_counter() - t0)
        # agreement at the SAME λ as the last timed rep — otherwise
        # the metric conflates the λ perturbation with divergence
        sol_ref = cd.lasso(Xs, ys, lam_rep, options=os_)
        agree_sh = float(jnp.max(jnp.abs(sol_sh.x - sol_ref.x)))
        extra["sharded_1dev_s"] = round(t_sh, 4)
        extra["sharded_vs_single_max_abs_diff"] = agree_sh
        _log(f"bench: sharded(1-dev mesh) {extra['sharded_1dev_s']}s "
             f"nnz={nnz_sh} vs-single {agree_sh:.2e}")

        # sharded GROUP engine on the same 1-device mesh (round-3
        # surface: whole groups per shard + safeguarded merge).
        # λ from the data (0.3·group-λmax, the single-device group
        # section's sparse-recovery regime) — the old hardcoded 0.1
        # was scale-appropriate only at the 5K×50K shape
        bg_s = jnp.zeros((Xs.shape[1],), dtype).at[:8].set(1.0)
        ys_g = Xs @ bg_s + 0.3 * jax.random.normal(ks[2], (ns,), dtype)
        cg_s = jax.jit(lambda A, b: jnp.dot(
            A.T, b, precision=jax.lax.Precision.HIGHEST))(Xs, ys_g)
        lam_gs = 0.3 * float(jnp.max(jnp.sqrt(jnp.sum(
            jnp.reshape(cg_s, (-1, 4)) ** 2, axis=1)) / ns))
        sol_g = cd.parallel.group_lasso_sharded(Xs, ys_g, lam_gs, 4,
                                                mesh1, options=os_)
        float(jnp.sum(sol_g.x))
        t_gs = float("inf")
        lam_rep = lam_gs
        for rep in range(2):
            lam_rep = lam_gs * (1.0 + 1e-7 * (rep + 1))
            t0 = time.perf_counter()
            sol_g = cd.parallel.group_lasso_sharded(
                Xs, ys_g, lam_rep, 4, mesh1, options=os_)
            float(jnp.sum(sol_g.x))
            t_gs = min(t_gs, time.perf_counter() - t0)
        ref_g = cd.group_lasso(Xs, ys_g, lam_rep, 4, options=os_)
        agree_g = float(jnp.max(jnp.abs(sol_g.x - ref_g.x)))
        extra["group_sharded_1dev_s"] = round(t_gs, 4)
        extra["group_sharded_vs_single_max_abs_diff"] = agree_g
        _log(f"bench: group-sharded(1-dev mesh) "
             f"{extra['group_sharded_1dev_s']}s vs-single "
             f"{agree_g:.2e}")

        # batched sharded λ-path on the same 1-device mesh (round-3
        # surface: distributed certify GEMM + distributed-top-k union
        # working set), at the headline shape since round 4 (in-trace
        # padding); certified-or-fallback contract is the
        # single-device one
        import warnings as _w

        Lsp = 20 if small else 100
        lam_hi_s = float(jnp.max(jnp.abs(jnp.dot(
            ys, Xs, precision=jax.lax.Precision.HIGHEST))) / ns)
        lams_sp = jnp.asarray(
            lam_hi_s * np.logspace(-0.05, -1.6, Lsp), dtype)
        # warmup + timed reps all inside the warnings catcher: a
        # fallback during ANY rep means the rep timed batched-attempt
        # + scan (+ scan compile) — such a time is never recorded
        # (same policy as the single-device batched headline)
        t_sp = float("inf")
        sst = {}
        sp_esc = 0
        with _w.catch_warnings(record=True) as _ws:
            _w.simplefilter("always")
            psh = cd.parallel.lasso_path_sharded(
                Xs, ys, lams_sp, mesh1, options=os_,
                standardize_X=False, path_batch=min(128, Lsp),
                coarse_stride=Lsp - 1, stats=sst)  # compile
            float(jnp.sum(psh.beta_path))
            sp_esc = max(sp_esc, sst.get("stall_escaped_lanes", 0))
            for rep in range(2):
                lams_rep = lams_sp * (1.0 + 1e-7 * (rep + 1))
                t0 = time.perf_counter()
                psh = cd.parallel.lasso_path_sharded(
                    Xs, ys, lams_rep, mesh1, options=os_,
                    standardize_X=False, path_batch=min(128, Lsp),
                    coarse_stride=Lsp - 1, stats=sst)
                float(jnp.sum(psh.beta_path))
                t_sp = min(t_sp, time.perf_counter() - t0)
                sp_esc = max(sp_esc,
                             sst.get("stall_escaped_lanes", 0))
            sp_cert = not any("falling back" in str(w.message)
                              for w in _ws)
        extra["sharded_path_batched_certified"] = bool(sp_cert)
        extra["sharded_path_stall_escaped_lanes"] = int(sp_esc)
        extra["sharded_path_1dev_points"] = int(psh.beta_path.shape[0])
        if sp_cert:
            extra["sharded_path_1dev_s"] = round(t_sp, 4)
        _log(f"bench: sharded-path(1-dev mesh) "
             f"{extra.get('sharded_path_1dev_s', 'not-recorded')}s "
             f"({extra['sharded_path_1dev_points']} pts, "
             f"certified={sp_cert})")

        # observation-sharded (data-parallel) tier on a 1-device
        # 'obs' mesh: tall-data shape, row psums + replicated β
        nr, pr_ = (2000, 200) if small else (50_000, 2000)
        kr = jax.random.split(jax.random.PRNGKey(29), 3)
        Xr = jax.random.normal(kr[0], (nr, pr_), dtype)
        br_true = jnp.zeros((pr_,), dtype).at[:20].set(
            jax.random.normal(kr[1], (20,), dtype))
        yr = Xr @ br_true + 0.3 * jax.random.normal(kr[2], (nr,),
                                                    dtype)
        lam_r = 0.3 * float(jnp.max(jnp.abs(jnp.dot(
            yr, Xr, precision=jax.lax.Precision.HIGHEST))) / nr)
        mesh_o = Mesh(np.asarray(jax.devices()[:1]), ("obs",))
        sol_r = cd.parallel.lasso_row_sharded(Xr, yr, lam_r, mesh_o,
                                              options=os_)  # compile
        float(jnp.sum(sol_r.x))
        t_r = float("inf")
        for rep in range(2):
            lam_rep = lam_r * (1.0 + 1e-7 * (rep + 1))
            t0 = time.perf_counter()
            sol_r = cd.parallel.lasso_row_sharded(
                Xr, yr, lam_rep, mesh_o, options=os_)
            float(jnp.sum(sol_r.x))
            t_r = min(t_r, time.perf_counter() - t0)
        ref_r = cd.lasso(Xr, yr, lam_rep, options=os_)
        agree_r = float(jnp.max(jnp.abs(sol_r.x - ref_r.x)))
        extra["row_sharded_1dev_s"] = round(t_r, 4)
        extra["row_sharded_vs_single_max_abs_diff"] = agree_r
        _log(f"bench: row-sharded(1-dev obs mesh, n={nr}) "
             f"{extra['row_sharded_1dev_s']}s vs-single "
             f"{agree_r:.2e}")
    except Exception as e:  # pragma: no cover - backend-specific
        extra["sharded_1dev_error"] = f"{type(e).__name__}: {e}"[:200]
        _log(f"bench: sharded(1-dev mesh) failed: {e}")



def _p1m_section(extra, small, opt_tol):
    import jax
    import jax.numpy as jnp

    import coordinatedescent_jl_tpu as cd

    dtype = jnp.float32
    _mem_report("pre-p1m")
    # p = 1M feature axis (VERDICT r4 missing 1 / item 3): the
    # north-star column count (BASELINE.json config 5) on one chip —
    # X is 4 GB (n=1K), the same budget as the 10K×100K sharded line.
    # nb = 7813 blocks exercises index arithmetic / top-k working
    # sets / padding at scale.  Certification is the duality gap of
    # the sharded output directly (a single-device reference solve
    # would double the footprint for no extra information — the
    # sharded-vs-single equivalence is pinned at 10K×100K above and
    # in the p=1M CPU-mesh suite test).
    try:
        if small:
            raise RuntimeError("skipped in small mode")
        # rebind to drop the 4 GB 10K×100K design (and friends) before
        # allocating the p=1M one — ``del`` would raise on names the
        # previous section's try left unbound
        Xs = ys = sol_sh = sol_ref = psh = None
        Xr = yr = sol_r = ref_r = ys_g = sol_g = None
        from jax.sharding import Mesh
        mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("feature",))
        n1, p1, s1 = 1000, 1_000_000, 100
        km = jax.random.split(jax.random.PRNGKey(31), 3)
        X1 = jax.random.normal(km[0], (n1, p1), dtype)
        idx1 = jax.random.choice(km[2], p1, (s1,), replace=False)
        b1_true = jnp.zeros((p1,), dtype).at[idx1].set(
            jax.random.normal(km[1], (s1,), dtype))
        y1 = (X1 @ b1_true
              + 0.3 * jax.random.normal(km[2], (n1,), dtype))
        lam_1 = 0.1 * float(jnp.max(jnp.abs(jnp.dot(
            y1, X1, precision=jax.lax.Precision.HIGHEST))) / n1)
        os1 = cd.CDOptions(opt_tol=opt_tol, randomize=False)
        sol_1 = cd.parallel.lasso_sharded(X1, y1, lam_1, mesh1,
                                          options=os1)  # compile
        float(jnp.sum(sol_1.x))
        t_1m = float("inf")
        for rep in range(2):
            lam_rep = lam_1 * (1.0 + 1e-7 * (rep + 1))
            t0 = time.perf_counter()
            sol_1 = cd.parallel.lasso_sharded(X1, y1, lam_rep, mesh1,
                                              options=os1)
            nnz_1 = int(jnp.sum(sol_1.x != 0))
            t_1m = min(t_1m, time.perf_counter() - t0)
        gap_1, primal_1 = cd.lasso_duality_gap_f64(
            X1, y1, sol_1.x, lam_rep)
        rel_1 = float(gap_1) / max(float(primal_1), 1e-300)
        extra["sharded_p1m_s"] = round(t_1m, 4)
        extra["sharded_p1m_nnz"] = nnz_1
        extra["sharded_p1m_rel_gap"] = rel_1
        extra["sharded_p1m_certified"] = bool(rel_1 < 100 * opt_tol)
        _log(f"bench: sharded p=1M (n={n1}) {t_1m:.3f}s nnz={nnz_1} "
             f"rel_gap={rel_1:.2e}")

        # batched sharded λ-path at p=1M (20 points)
        import warnings as _w
        L1 = 20
        lam_hi1 = float(jnp.max(jnp.abs(jnp.dot(
            y1, X1, precision=jax.lax.Precision.HIGHEST))) / n1)
        lams_1 = jnp.asarray(lam_hi1 * np.logspace(-0.05, -1.3, L1),
                             dtype)
        t_p1 = float("inf")
        s1m = {}
        with _w.catch_warnings(record=True) as _ws:
            _w.simplefilter("always")
            pp1 = cd.parallel.lasso_path_sharded(
                X1, y1, lams_1, mesh1, options=os1,
                standardize_X=False, path_batch=L1,
                coarse_stride=L1 - 1, stats=s1m)  # compile
            float(jnp.sum(pp1.beta_path))
            for rep in range(2):
                lams_rep = lams_1 * (1.0 + 1e-7 * (rep + 1))
                t0 = time.perf_counter()
                pp1 = cd.parallel.lasso_path_sharded(
                    X1, y1, lams_rep, mesh1, options=os1,
                    standardize_X=False, path_batch=L1,
                    coarse_stride=L1 - 1, stats=s1m)
                float(jnp.sum(pp1.beta_path))
                t_p1 = min(t_p1, time.perf_counter() - t0)
            p1_cert = not any("falling back" in str(w.message)
                              for w in _ws)
        extra["sharded_path_p1m_certified"] = bool(p1_cert)
        if p1_cert:
            extra["sharded_path_p1m_s"] = round(t_p1, 4)
        _log(f"bench: sharded-path p=1M ({L1} pts) "
             f"{extra.get('sharded_path_p1m_s', 'not-recorded')}s "
             f"certified={p1_cert}")
        del X1, y1, sol_1, pp1
    except Exception as e:  # pragma: no cover - backend-specific
        extra["sharded_p1m_error"] = f"{type(e).__name__}: {e}"[:200]
        _log(f"bench: sharded p=1M failed: {e}")

if __name__ == "__main__":
    main()
