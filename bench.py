"""Benchmark: element-residual evals/sec at 512^2 Poisson (BASELINE.json
north-star metric).

Times the full assembled Galerkin residual of the Poisson weak form
(eval u_x,u_y,nu at all Gauss points -> physics -> Galerkin projection ->
scatter assembly -> Dirichlet masking) on a 512^2 node grid, batched.

``vs_baseline`` is the speedup of the fused gather+matmul engine over a
faithful same-hardware port of the reference *algorithm* (one separate
XLA convolution per Gauss point per quantity re-reading u each time —
DiffNet/DiffNetFEM.py:7-18): the reference publishes no numbers
(BASELINE.md), so the comparison is algorithm-vs-algorithm on this chip.

Prints ONE JSON line.
"""

import functools
import json
import os
import subprocess
import sys
import time

import numpy as np


def _timeit(fn, *args, iters=30, warmup=5):
    import jax

    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def _timeit_chained(fn, u, *args, iters=30, warmup=5):
    """Time with the output fed back into the next call's input (requires
    output shape == u shape). Repeated identical calls can be served from a
    result cache by this image's experimental TPU relay, inflating plain
    loop timings; chaining forces every iteration to compute."""
    import jax

    r = u
    for _ in range(warmup):
        r = fn(r, *args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(r, *args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    if os.environ.get("DIFFNET_BENCH_CPU"):
        # explicit CPU pin for hermetic testing of the harness itself
        # (JAX_PLATFORMS in the env is overridden by this image's
        # sitecustomize; only the config update sticks — CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffnet_tpu.core import fem
    from diffnet_tpu.core.quadrature import make_basis

    n = int(os.environ.get("DIFFNET_BENCH_SIZE", "512"))
    # batch 32: at batch 8 the measurement is dominated by this image's
    # relay round-trip latency (~2 ms/call regardless of content), which
    # also inflates vs_baseline by hobbling the many-kernel reference port
    # more than our fused path; 32 amortizes it for both sides
    bs = int(os.environ.get("DIFFNET_BENCH_BATCH", "32"))
    # optional dtype variant (e.g. DIFFNET_BENCH_DTYPE=bfloat16); accuracy
    # impact of bf16 is measured in docs/MIXED_PRECISION.md
    dt = jnp.dtype(os.environ.get("DIFFNET_BENCH_DTYPE", "float32"))
    h = 1.0 / (n - 1)
    basis = make_basis(2, 1, h=(h, h))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((bs, n, n)), dt)
    nu = jnp.asarray(rng.random((bs, n, n)), dt)
    f_gp = jnp.asarray(rng.random((bs, n - 1, n - 1, 4)), dt)
    bc = jnp.zeros((n, n)).at[0, :].set(1.0).at[-1, :].set(1.0)

    @jax.jit
    def residual_fused(u, nu, f_gp):
        gp = fem.gp_eval(u, basis, ("dx", "dy"))
        nu_gp = fem.gp_eval(nu, basis, ("N",))["N"]
        R = fem.galerkin_project_multi(
            [(nu_gp * gp["dx"], "dx"), (nu_gp * gp["dy"], "dy"),
             (-f_gp, "N")], basis, (n, n))
        return jnp.where(bc > 0.5, 0.0, R)

    # production default (round 2): element-tensor formulation — the static
    # [4,4,4] element tensor expanded as one fused stencil expression over
    # shifted u/nu views; zero Gauss-point intermediates in HBM
    # (pde/poisson.py::poisson_resmin_residual_et, core/fem.py::element_action)
    A = fem.element_tensor(basis, ("dx", "dy"))

    @jax.jit
    def residual_et(u, nu, f_gp):
        R = fem.element_action(u, nu, A, basis, (n, n),
                               gp_terms=[(-f_gp, "N")])
        return jnp.where(bc > 0.5, 0.0, R)

    # round 3: the HEADLINE iteration precomputes the nodal RHS Nf — the
    # forcing projection is constant across solver iterations, and the
    # REFERENCE itself precomputes it (Nf "precomputable RHS",
    # e2_manufactured_resmin.py:270-271). Dropping the per-call f_gp read
    # removes 4 element-grid channels (~133 MB at 512^2/bs32) from the
    # per-iteration HBM traffic (VERDICT r2 item 1b). The f_gp-per-call
    # variant stays as a supplementary key.
    Nf_rhs = jax.jit(lambda f: fem.galerkin_project(f, basis, "N",
                                                    (n, n)))(f_gp)

    @jax.jit
    def residual_et_nf(u, nu, Nf):
        R = fem.element_action(u, nu, A, basis, (n, n)) - Nf
        return jnp.where(bc > 0.5, 0.0, R)

    # reference-algorithm port: one conv per gauss point per quantity
    # (12 convs for dx/dy/N here), then the same projection/assembly
    tabs = {q: np.asarray(basis.tables[q], np.float32) for q in ("N", "dx", "dy")}

    def conv_gp(x, table):
        # table [ngp, nbf_tot] -> ngp separate 2x2 convs, like the reference's
        # gauss_pt_eval loop (DiffNetFEM.py:7-18)
        outs = []
        x4 = x[:, None, :, :]  # NCHW
        for g in range(table.shape[0]):
            k = jnp.asarray(table[g].reshape(1, 1, 2, 2), x.dtype)
            outs.append(jax.lax.conv_general_dilated(
                x4, k, window_strides=(1, 1), padding="VALID"))
        return jnp.concatenate(outs, 1)  # [B, ngp, nelY, nelX]

    # SYMMETRIC comparison: the reference ALSO precomputes its RHS
    # projection (Nf, e2_manufactured_resmin.py:270-271), so the baseline
    # port subtracts the same precomputed nodal Nf as the headline path
    # rather than re-projecting f_gp per call
    @jax.jit
    def residual_reference_style(u, nu, Nf):
        u_x = conv_gp(u, tabs["dx"])
        u_y = conv_gp(u, tabs["dy"])
        nu_g = conv_gp(nu, tabs["N"])
        gp_x = jnp.moveaxis(u_x, 1, -1)
        gp_y = jnp.moveaxis(u_y, 1, -1)
        nu_gp = jnp.moveaxis(nu_g, 1, -1)
        R = (fem.galerkin_project(nu_gp * gp_x, basis, "dx", (n, n))
             + fem.galerkin_project(nu_gp * gp_y, basis, "dy", (n, n))
             - Nf)
        return jnp.where(bc > 0.5, 0.0, R)

    def chained(fn):
        # feed the residual back into u so no two iterations are identical
        # (see _timeit_chained); the extra axpy is negligible
        return jax.jit(lambda u, nu, f_gp: fn(u, nu, f_gp) * 1e-6 + u)

    elems = bs * (n - 1) * (n - 1)
    suffix = "" if dt == jnp.float32 else f"_{dt.name}"
    t_et_nf = _timeit_chained(chained(residual_et_nf), u, nu, Nf_rhs)
    # bank the headline IMMEDIATELY — the remaining three comparison
    # timings are a relay-wedge window in which an unprinted run loses
    # everything (each later print supersedes this line cumulatively)
    print(json.dumps({
        "metric": "element_residual_evals_per_sec_512sq_poisson" + suffix,
        "value": float(f"{elems / t_et_nf:.4g}"), "unit": "elem/s",
        "vs_baseline": 0.0, "batch": bs, "timing": "chained",
        "rhs": "precomputed_nodal_Nf",
        "note": "comparison timings pending"}), flush=True)
    # SCAN-LOOP variant: K chained residual applications inside ONE
    # dispatch (lax.scan), scalar readback at the end. This is the
    # PRODUCTION iteration pattern — jax.scipy's CG/GMRES run their
    # iterations as on-device while_loops under jit — so it measures
    # on-chip residual throughput with the per-dispatch relay round trip
    # (~2-3 ms here, comparable to the whole computation) amortized away.
    K = 20

    @jax.jit
    def residual_scanK(u, nu, Nf):
        def body(carry, _):
            R = fem.element_action(carry, nu, A, basis, (n, n)) - Nf
            R = jnp.where(bc > 0.5, 0.0, R)
            return R * 1e-6 + carry, None

        out, _ = jax.lax.scan(body, u, None, length=K)
        return out

    r = residual_scanK(u, nu, Nf_rhs)
    _ = float(jnp.sum(r))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        r = residual_scanK(r, nu, Nf_rhs)
    _ = float(jnp.sum(r))
    t_scan = (time.perf_counter() - t0) / (reps * K)
    print(json.dumps({
        "metric": "element_residual_evals_per_sec_512sq_poisson" + suffix,
        "value": float(f"{elems / t_et_nf:.4g}"), "unit": "elem/s",
        "vs_baseline": 0.0, "batch": bs, "timing": "chained",
        "rhs": "precomputed_nodal_Nf",
        "elem_per_sec_scan_loop": float(f"{elems / t_scan:.4g}"),
        "note": "comparison timings pending"}), flush=True)

    t_et = _timeit_chained(chained(residual_et), u, nu, f_gp)
    t_fused = _timeit_chained(chained(residual_fused), u, nu, f_gp)
    t_ref = _timeit_chained(chained(residual_reference_style), u, nu,
                            Nf_rhs)

    # opt-in: time the fully-fused Pallas kernel (ops/poisson_residual.py).
    # NOT in the default run — compiled Pallas launches hang this image's
    # axon relay (CLAUDE.md); set DIFFNET_BENCH_PALLAS=1 on a standard TPU
    # runtime (on CPU it falls back to interpret mode, correctness only).
    t_pallas = None
    if os.environ.get("DIFFNET_BENCH_PALLAS"):
        import functools

        from jax.experimental import pallas as pl

        from diffnet_tpu.ops import poisson_residual_fused

        if jax.devices()[0].platform == "cpu":
            pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)
        Nf = jax.jit(lambda f: fem.galerkin_project(f, basis, "N", (n, n)))(
            f_gp)
        # chained like every other variant — unchained repeats can be
        # served from the relay result cache (traps 1/4, CLAUDE.md)
        pallas_fn = jax.jit(
            lambda u, nu: poisson_residual_fused(u, nu, Nf, bc, basis)
            * 1e-6 + u)
        t_pallas = _timeit_chained(pallas_fn, u, nu, iters=10, warmup=2)

    evals_per_sec = elems / t_et_nf
    result = {
        "metric": "element_residual_evals_per_sec_512sq_poisson" + suffix,
        "value": float(f"{evals_per_sec:.4g}"),
        "unit": "elem/s",
        "vs_baseline": float(f"{t_ref / t_et_nf:.4g}"),
        "elem_per_sec_scan_loop": float(f"{elems / t_scan:.4g}"),
        "elem_per_sec_gp_forcing": float(f"{elems / t_et:.4g}"),
        "gp_pipeline_elem_per_sec": float(f"{elems / t_fused:.4g}"),
        "batch": bs,
        "timing": "chained",
        "rhs": "precomputed_nodal_Nf",
    }
    if t_pallas is not None:
        result["pallas_fused_elem_per_sec"] = float(
            f"{elems / t_pallas:.4g}")
    # emit the primary metric IMMEDIATELY: the relay can wedge mid-run (see
    # CLAUDE.md) and the guarded wrapper salvages the LAST complete JSON line
    # from a timed-out subprocess. Each supplementary phase re-prints the
    # cumulative result, so whatever finished before a wedge is preserved.
    print(json.dumps(result), flush=True)
    if os.environ.get("DIFFNET_BENCH_PRIMARY_ONLY"):
        return
    # supplementary metrics from BASELINE.json ("training steps/sec; final
    # L2 error") — default-on, each in its OWN watchdogged subprocess: the
    # relay can wedge under sustained load, and a per-phase subprocess
    # keeps one wedged phase from eating the others (VERDICT r1 item 2).
    # The L2 phase is an ACCURACY metric, so it runs CPU-pinned and
    # completes even with the relay down.
    #
    # ORDER: flagship numbers first, conv-net (wedge-class) phases last
    # among the TPU phases — an IBN steps hang degrades the relay for
    # subsequent processes for several minutes (measured 2026-08-17), so
    # it must not run before the context metrics are banked.
    #
    # GLOBAL DEADLINE (round 5 — VERDICT r4 weak 1): BENCH_r04 died rc=124
    # because recovery waits + late-ordered flagship phases overran the
    # driver's outer kill. Every phase now checks the remaining budget
    # first, its subprocess timeout is capped to what is left, and the
    # chain is ordered FLAGSHIP-FIRST so an early wedge starves the
    # context metrics, never the headline ones.
    guard = int(os.environ.get("DIFFNET_BENCH_TIMEOUT", "3300"))
    inner_budget = int(os.environ.get("DIFFNET_BENCH_INNER_BUDGET",
                                      str(guard)))
    deadline = _PROC_T0 + inner_budget - 45   # 45 s teardown margin

    def run_next(flag, tmo, tpu=True, probe_timeout=45):
        left = deadline - time.monotonic()
        key = flag.strip("-").replace("-", "_") + "_error"
        if left < min(tmo, 90) + 30:
            result[key] = "skipped: global bench deadline"
            print(json.dumps(result), flush=True)
            return
        tmo = int(min(tmo, left - 30))
        if tpu:
            result.update(_run_tpu_phase(flag, tmo,
                                         probe_timeout=probe_timeout))
        else:
            result.update(_run_phase(flag, tmo))
        print(json.dumps(result), flush=True)

    # FLAGSHIP TIER FIRST (VERDICT r4 #1): the Pallas 2D scan headline,
    # the assembled-stencil apply kernel, and the IBN bs4 one-dispatch
    # scan tier — the three numbers that existed only in BENCH_MEASURED
    # self-reports last round — bank before anything else can wedge.
    run_next("--flagship-only", 360)
    # safe stencil-class training steps (reference
    # e2_manufactured_resmin.py:543 configuration)
    run_next("--steps-field-only", 240)
    # end-to-end time-to-solution (MG-CG, whole solve in one dispatch;
    # setup is CPU-side so the relay only sees the solve)
    run_next("--solve-only", 420)
    # accuracy metric — CPU-pinned, immune to the relay
    run_next("--l2-only", 420, tpu=False)
    # serve is the LIGHTEST TPU phase (tiny AE dispatches)
    run_next("--serve-only", 240)
    # assembled-stencil XLA iteration (train/stencil.py)
    run_next("--stencil-only", 300)
    # beyond-baseline perf context: the hardest residual (NS full VMS, 13
    # GP quantities + stabilization + 3 assemblies), 3D, bf16, largegrid
    run_next("--ns-only", 360)
    run_next("--p3d-only", 300)
    run_next("--bf16-only", 240)
    run_next("--largegrid-only", 300)
    # IBN conv-net tier escalation (bs4->512 scan, then loop tiers) —
    # the wedge-prone class runs AFTER every context metric is banked;
    # in-tier probes + streamed JSON bound the loss to one tier
    run_next("--steps-only", 600, probe_timeout=90)
    # full Pallas tier matrix (3D, NS, bf16, 1024^2, 128^3)
    run_next("--pallas-probe-only", 560, probe_timeout=90)
    # remaining stencil-apply tiers (3D 128^3; 512^2 banked by flagship)
    run_next("--stencil-apply-only", 300, probe_timeout=90)

    # END-OF-CHAIN SALVAGE (round 4): a mid-chain wedge skips every later
    # phase in ~45-90 s each (measured 2026-08-18: a stencil-phase wedge
    # cost solve/ns/p3d/bf16/largegrid/steps their numbers), and today's
    # wedges cleared in 20-40 min. If the relay is healthy again once the
    # chain is done and the deadline has room, re-run each skipped or
    # timed-out TPU phase once, flagship first; stop at the first sign of
    # a re-wedge.
    for flag, tmo in (("--flagship-only", 360),
                      ("--steps-field-only", 240),
                      ("--solve-only", 420), ("--serve-only", 240),
                      ("--stencil-only", 300), ("--ns-only", 360),
                      ("--p3d-only", 300), ("--bf16-only", 240),
                      ("--largegrid-only", 300), ("--steps-only", 600),
                      ("--pallas-probe-only", 560),
                      ("--stencil-apply-only", 300)):
        key = flag.strip("-").replace("-", "_") + "_error"
        if key not in result:
            continue
        left = deadline - time.monotonic()
        if left < 120:
            break
        if not _probe_relay(45):
            break
        got = _run_phase(flag, int(min(tmo, left - 30)))
        if set(got) != {key}:
            result.pop(key, None)   # the retry banked something real
        result.update(got)
        print(json.dumps(result), flush=True)


def _probe_relay(timeout=45):
    """True iff the TPU relay answers a tiny matmul within `timeout` s
    (when wedged, ALL device ops in ALL processes hang — CLAUDE.md).

    The budget covers only the DEVICE work: the probe child measures its
    own elapsed time after the jax import and reports it. On a loaded
    single-core builder box a cold jax import alone can exceed 30 s, and
    counting it produced false 'relay wedged' skips while the relay was
    fine (round-4 observation: steps tiers skipped minutes after a
    successful on-chip run). The OUTER kill (import stall + device hang)
    is timeout + 90 s."""
    # honor the hermetic CPU pin here too: the snippet does not go through
    # this file's __main__, and sitecustomize force-registers the axon
    # backend, so without the config update the probe would still hit (and
    # hang on) a wedged relay even when every phase runs on CPU
    pin = ("import jax; jax.config.update('jax_platforms', 'cpu');"
           if os.environ.get("DIFFNET_BENCH_CPU") else "")
    code = (pin + "import jax, jax.numpy as jnp, time;"
            "t0 = time.monotonic();"
            "x = jnp.ones((128, 128));"
            "s = float(jnp.sum(x @ x));"
            "print('PROBE_S', time.monotonic() - t0)")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout + 90)
        if out.returncode != 0:
            return False
        for line in out.stdout.splitlines():
            if line.startswith("PROBE_S"):
                return float(line.split()[1]) <= timeout
        return False
    except subprocess.TimeoutExpired:
        return False


_RECOVERY_BUDGET = [None]  # shared across phases; seconds of wait left
_PROC_T0 = time.monotonic()


def _run_tpu_phase(flag, timeout, probe_timeout=45):
    """_run_phase gated by a relay hang-probe: when the relay is wedged a
    probe fails in `probe_timeout` s instead of the phase eating its full
    timeout, keeping the whole run inside the outer 3600 s guard.

    On probe failure the phase WAITS for relay recovery on a shared
    budget (DIFFNET_BENCH_RECOVERY_WAIT, default 600 s total across the
    whole run, probe time counted): measured 2026-08-17, the relay wedged
    immediately after the primary metric and starved every later phase —
    short wedges DO clear within minutes, and the budget bounds the cost
    when they don't (long outages skip the remaining phases as before).
    Waiting is also cut off once this process has used half the outer
    DIFFNET_BENCH_TIMEOUT guard: the phase timeouts alone sum to ~3800 s
    against the 3600 s guard (deliberately overcommitted — healthy phases
    finish far under their caps), and a late wedge+recovery must not push the
    deliberately-last steps/pallas phases past the outer kill."""
    if _RECOVERY_BUDGET[0] is None:
        _RECOVERY_BUDGET[0] = int(
            os.environ.get("DIFFNET_BENCH_RECOVERY_WAIT", "420"))
    half_guard = 0.5 * int(os.environ.get(
        "DIFFNET_BENCH_INNER_BUDGET",
        os.environ.get("DIFFNET_BENCH_TIMEOUT", "3300")))
    ok = _probe_relay(probe_timeout)
    while (not ok and _RECOVERY_BUDGET[0] > 0
           and time.monotonic() - _PROC_T0 < half_guard):
        wait = min(60, _RECOVERY_BUDGET[0])
        time.sleep(wait)
        _RECOVERY_BUDGET[0] -= wait + probe_timeout
        ok = _probe_relay(probe_timeout)
    if not ok:
        key = flag.strip("-").replace("-", "_") + "_error"
        return {key: "skipped: relay wedged (hang-probe timed out)"}
    return _run_phase(flag, timeout)


def _run_phase(flag, timeout):
    """Run `python bench.py <flag>` in a subprocess; return its last JSON
    line, or an error marker on timeout/failure.

    Phases that can wedge mid-run (largegrid, pallas probe) print the
    CUMULATIVE JSON after each banked step, so on timeout the killed
    child's captured stdout is still parsed — whatever banked before the
    hang is salvaged alongside the timeout marker."""
    key = flag.strip("-").replace("-", "_") + "_error"

    def _last_json(stdout):
        if isinstance(stdout, bytes):
            stdout = stdout.decode("utf-8", "replace")
        for line in reversed((stdout or "").splitlines()):
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    return json.loads(line)
                except ValueError:
                    continue
        return None

    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True, text=True, timeout=timeout)
        got = _last_json(out.stdout)
        if got is not None:
            return got
        return {key: f"no JSON: {out.stdout[-200:]} {out.stderr[-200:]}"}
    except subprocess.TimeoutExpired as e:
        got = _last_json(e.stdout) or {}
        got[key] = "phase timed out (relay wedge?)"
        return got
    except Exception as e:
        return {key: str(e)[:200]}


def _flagship():
    """FLAGSHIP tier (round 5, VERDICT r4 #1): the three headline numbers
    that round 4 banked only in BENCH_MEASURED self-reports, measured
    FIRST so no later wedge can starve them:

      1. fused Pallas 2D residual, 512^2/bs32, scan-chained (the 1.1e10
         elem/s kernel headline; ops/poisson_residual.py 'dma')
      2. assembled-stencil apply kernel, 512^2/bs32 scan-chained (the
         production fixed-operator Krylov/MG iteration,
         ops/stencil_apply.py 'dma')
      3. IBN conv-net training, bs4 x 10 Adam steps in ONE lax.scan
         dispatch (the reference flagship config at its smallest banked
         tier — IBN_2D.py:174-216)

    Streams cumulative JSON after each banked metric; ordered
    stencil-class first, conv-net class (the wedge class) last. Perf-only:
    returns immediately on CPU (numerics are pinned by the test suite)."""
    import jax
    import jax.numpy as jnp

    out = {}
    if jax.devices()[0].platform == "cpu":
        return out

    def bank(key, val):
        out[key] = val
        print(json.dumps(out), flush=True)

    from diffnet_tpu.core import fem
    from diffnet_tpu.core.quadrature import make_basis
    from diffnet_tpu.ops import poisson_residual_fused
    from diffnet_tpu.ops.stencil_apply import stencil_apply

    # --- 1. fused Pallas 2D scan headline ---
    n, bs, K, reps = 512, 32, 20, 3
    h = 1.0 / (n - 1)
    basis = make_basis(2, 1, h=(h, h))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((bs, n, n)), jnp.float32)
    nu = jnp.asarray(rng.random((bs, n, n)), jnp.float32)
    f_gp = jnp.asarray(rng.random((bs, n - 1, n - 1, 4)), jnp.float32)
    bc = jnp.zeros((n, n)).at[0, :].set(1.0).at[-1, :].set(1.0)
    Nf = jax.jit(lambda f: fem.galerkin_project(f, basis, "N", (n, n)))(
        f_gp)

    def body(carry, _):
        R = poisson_residual_fused(carry, nu, Nf, bc, basis, variant="dma")
        return R * 1e-6 + carry, None

    scan_fn = jax.jit(lambda r: jax.lax.scan(body, r, None, length=K)[0])
    r = scan_fn(u)
    _ = float(jnp.sum(r))
    bank("pallas_probe_dma_512_ok", True)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = scan_fn(r)
    _ = float(jnp.sum(r))
    t = (time.perf_counter() - t0) / (reps * K)
    bank("pallas_fused_elem_per_sec_512sq_dma_scan",
         float(f"{bs * (n - 1) ** 2 / t:.4g}"))

    # --- 2. assembled-stencil apply kernel (fixed-operator iteration) ---
    # random C planes = identical bytes/FLOPs to extracted ones; C must
    # be a runtime ARG (closures >100 MB trip the relay's compile-payload
    # limit, HTTP 413 — round-4 note)
    C = jnp.asarray(rng.random((9, bs, n, n)), jnp.float32)

    def abody(C, carry, _):
        return stencil_apply(C, carry, 2, None, "dma") * 1e-6 + carry, None

    ascan = jax.jit(lambda r, C: jax.lax.scan(
        functools.partial(abody, C), r, None, length=K)[0])
    r = ascan(u, C)
    _ = float(jnp.sum(r))
    bank("pallas_stencil_apply_dma_512_ok", True)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = ascan(r, C)
    _ = float(jnp.sum(r))
    t = (time.perf_counter() - t0) / (reps * K)
    bank("pallas_stencil_apply_elem_per_sec_512sq_dma_scan",
         float(f"{bs * (n - 1) ** 2 / t:.4g}"))

    # --- 3. IBN conv-net bs4 scan tier (the wedge class; last) ---
    if not _probe_relay(30):
        bank("flagship_ibn_skip", "relay wedged after kernel tiers")
        return out
    import optax

    from diffnet_tpu.models.networks import AE
    from diffnet_tpu.pde.ibn import IBNPoisson2D

    ng = 32
    net = AE(out_channels=1, dims=8, n_downsample=2)
    bs4 = 4
    module = IBNPoisson2D(net, source_from="inputs", domain_size=ng,
                          batch_size=bs4)
    inputs = jnp.asarray(rng.random((bs4, ng, ng, 3)), jnp.float32)
    forcing = jnp.asarray(rng.random((bs4, ng, ng, 1)), jnp.float32)
    params = net.init(jax.random.key(0), inputs)
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)

    def loss_fn(params):
        u = net.apply(params, inputs)
        return module.loss(u, inputs, forcing)

    def sbody(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), loss

    Ks = 10

    @jax.jit
    def steps(params, opt_state):
        (p, s), losses = jax.lax.scan(sbody, (params, opt_state), None,
                                      length=Ks)
        return p, s, losses[-1]

    params, opt_state, l = steps(params, opt_state)
    _ = float(l)
    sreps = 3
    t0 = time.perf_counter()
    for _ in range(sreps):
        params, opt_state, l = steps(params, opt_state)
    _ = float(l)
    bank("ibn32_train_steps_per_sec_bs4_scan10",
         float(f"{sreps * Ks / (time.perf_counter() - t0):.4g}"))
    return out


def _steps_per_sec():
    """Flagship IBN conv-net training steps/sec (reference config: 32^2
    grid, AE net, Adam 3e-4 — IBN_2D.py:174-216), banked TIER BY TIER
    (VERDICT r3 #2): conv-net training loops are THE relay-wedge class on
    this image, and the all-or-nothing phase lost its number two rounds
    running. Tiers escalate bs 4 -> 16 -> 64 -> 128 (device-resident Adam
    steps), streaming cumulative JSON after every banked tier and
    re-probing the relay (30 s matmul subprocess) between tiers, so a
    wedge mid-tier loses only that tier. The largest surviving tier is
    aliased to ibn32_train_steps_per_sec. After the device-resident
    tiers: the loader-driven reference config and the scanned-K variant."""
    import jax
    import jax.numpy as jnp
    import optax

    from diffnet_tpu.models.networks import AE
    from diffnet_tpu.pde.ibn import IBNPoisson2D

    out = {}

    def bank(key, val):
        out[key] = val
        print(json.dumps(out), flush=True)

    n = 32
    net = AE(out_channels=1, dims=8, n_downsample=2)
    on_tpu = jax.devices()[0].platform != "cpu"
    rng = np.random.default_rng(0)

    def tier(bs, iters):
        module = IBNPoisson2D(net, source_from="inputs", domain_size=n,
                              batch_size=bs)
        inputs = jnp.asarray(rng.random((bs, n, n, 3)), jnp.float32)
        forcing = jnp.asarray(rng.random((bs, n, n, 1)), jnp.float32)
        params = net.init(jax.random.key(0), inputs)
        opt = optax.adam(3e-4)
        opt_state = opt.init(params)

        def loss_fn(params):
            u = net.apply(params, inputs)
            return module.loss(u, inputs, forcing)

        @jax.jit
        def step(params, opt_state):
            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params, opt_state, l = step(params, opt_state)  # compile + warm
        _ = float(l)
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, l = step(params, opt_state)
        _ = float(l)  # host scalar readback closes the chain
        return float(f"{iters / (time.perf_counter() - t0):.4g}")

    def tier_scan(bs, K, reps):
        # K optimizer steps inside ONE lax.scan dispatch: if the per-step
        # dispatch LOOP is what degrades the relay (round-4 observation:
        # the bs4 loop banked but poisoned the next probe), this variant
        # issues 1/K as many dispatches for the same step count
        module = IBNPoisson2D(net, source_from="inputs", domain_size=n,
                              batch_size=bs)
        inputs = jnp.asarray(rng.random((bs, n, n, 3)), jnp.float32)
        forcing = jnp.asarray(rng.random((bs, n, n, 1)), jnp.float32)
        params = net.init(jax.random.key(0), inputs)
        opt = optax.adam(3e-4)
        opt_state = opt.init(params)

        def loss_fn(params):
            u = net.apply(params, inputs)
            return module.loss(u, inputs, forcing)

        def body(carry, _):
            params, opt_state = carry
            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(g, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        @jax.jit
        def steps(params, opt_state):
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=K)
            return params, opt_state, losses[-1]

        params, opt_state, l = steps(params, opt_state)
        _ = float(l)
        t0 = time.perf_counter()
        for _ in range(reps):
            params, opt_state, l = steps(params, opt_state)
        _ = float(l)
        return float(f"{reps * K / (time.perf_counter() - t0):.4g}")

    # the SCAN tiers go first: round-4 on-chip runs showed the per-step
    # dispatch LOOP is what wedges the relay (the bs4 loop banked once,
    # then poisoned the next probe; a later run wedged before banking
    # anything; a bs4_scan10 run banked 850.5 steps/s and the relay
    # wedged only when the loop tier started) — the scan variant issues
    # 1/K as many dispatches, so escalate batch size within scan mode
    # before touching the loop tiers at all
    def probe_with_recovery(tries=3, wait=60):
        # a conv-net tier often leaves the relay degraded for ~1-2 min
        # AFTER banking successfully (observed twice on 2026-08-18:
        # bs4_scan10 banked 850/823 steps/s, the immediate next probe
        # failed, a manual probe 2 min later passed) — give it a bounded
        # drain window instead of abandoning the remaining tiers
        for attempt in range(tries):
            if _probe_relay(30):
                return True
            if attempt < tries - 1:
                time.sleep(wait)
        return False

    if on_tpu:
        # escalate to the reference's flagship batch (IBN_2D.py:216 trains
        # 32^2/bs512 — VERDICT r4 #5): each tier is ONE lax.scan dispatch
        # per rep, probed + banked independently, so the largest surviving
        # tier is recorded even when a later one wedges
        for bs, K, reps in ((4, 10, 3), (16, 10, 2), (64, 10, 2),
                            (256, 10, 2), (512, 10, 2)):
            if not probe_with_recovery():
                bank("steps_wedge_before_tier", f"bs{bs}_scan{K}")
                return out
            bank(f"ibn32_train_steps_per_sec_bs{bs}_scan{K}",
                 tier_scan(bs, K, reps))

    best = None
    for bs, iters in ((4, 10), (16, 20), (64, 40), (128, 40)):
        if on_tpu and not probe_with_recovery():
            bank("steps_wedge_before_tier", f"bs{bs}")
            return out
        sps = tier(bs, iters)
        bank(f"ibn32_train_steps_per_sec_bs{bs}", sps)
        best = (bs, sps)
    # headline alias = the largest banked device-resident tier
    bank("ibn32_train_steps_per_sec", best[1])
    bank("train_steps_per_sec", best[1])

    # scanned-K variant on the bs=128 tier: K optimizer steps inside ONE
    # lax.scan dispatch (the steps_per_call trainer mode's claimed TPU
    # win). TPU-only: XLA:CPU runs scan bodies single-threaded.
    if on_tpu and _probe_relay(30):
        module = IBNPoisson2D(net, source_from="inputs", domain_size=n,
                              batch_size=128)
        inputs = jnp.asarray(rng.random((128, n, n, 3)), jnp.float32)
        forcing = jnp.asarray(rng.random((128, n, n, 1)), jnp.float32)
        params = net.init(jax.random.key(0), inputs)
        opt = optax.adam(3e-4)
        opt_state = opt.init(params)

        def loss_fn(params):
            u = net.apply(params, inputs)
            return module.loss(u, inputs, forcing)

        K = 10

        @jax.jit
        def stepK(params, opt_state):
            def body(c, _):
                p, s = c
                loss, g = jax.value_and_grad(loss_fn)(p)
                updates, s = opt.update(g, s, p)
                return (optax.apply_updates(p, updates), s), loss

            (p, s), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=K)
            return p, s, losses[-1]

        params, opt_state, l = stepK(params, opt_state)
        _ = float(l)
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            params, opt_state, l = stepK(params, opt_state)
        _ = float(l)
        bank("ibn32_train_steps_per_sec_scan10",
             float(f"{reps * K / (time.perf_counter() - t0):.4g}"))

    # loader-driven reference config LAST (adds the data pipeline +
    # winding path on top of the conv-net dispatch loop)
    if on_tpu and not _probe_relay(30):
        bank("steps_wedge_before_tier", "loader_bs128")
        return out
    from diffnet_tpu.data.loader import NumpyLoader
    from diffnet_tpu.data.parametric import SyntheticPointClouds
    from diffnet_tpu.train.trainer import Trainer

    full = bool(os.environ.get("DIFFNET_BENCH_FULL"))
    bs = 512 if full else 128
    n_timed_epochs = 5 if full else 3
    ds = SyntheticPointClouds(n_samples=2 * bs, n_points=120, domain_size=n)
    loader = NumpyLoader(ds, batch_size=bs, shuffle=False)
    module = IBNPoisson2D(net, domain_size=n, batch_size=bs)

    tr = Trainer(max_epochs=1, optimizer="adam", learning_rate=3e-4)
    tr.fit(module, loader)  # compile + warm (step fn cached after this)
    t0 = time.perf_counter()
    n_steps = 0
    for _ in range(n_timed_epochs):
        tr.fit(module, loader, params=tr.state.params)
        n_steps += len(loader)
    bank("ibn32_train_steps_per_sec_loader" + ("" if full else "_bs128"),
         float(f"{n_steps / (time.perf_counter() - t0):.4g}"))
    return out


def _steps_fallback():
    """Device-resident IBN-AE training steps/sec (chi -> AE -> immersed
    energy loss; no loader, no winding einsum) + the scanned-K-steps A/B
    the steps_per_call feature claims (VERDICT r2 items 2+7).

    NOT in the default phase chain on this image: conv-net training wedges
    the axon relay reliably (round-3 isolation — this exact workload hung
    at 60 AND at 20 steps while the stencil field workload banked 458
    steps/s in the same window). Run manually on a standard TPU runtime:
    `python bench.py --steps-fallback-only`."""
    import jax
    import jax.numpy as jnp
    import optax

    from diffnet_tpu.models.networks import AE
    from diffnet_tpu.pde.ibn import IBNPoisson2D

    n, bs = 32, 64
    net = AE(out_channels=1, dims=8, n_downsample=2)
    module = IBNPoisson2D(net, source_from="inputs", domain_size=n,
                          batch_size=bs)
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.random((bs, n, n, 3)), jnp.float32)
    forcing = jnp.asarray(rng.random((bs, n, n, 1)), jnp.float32)
    params = net.init(jax.random.key(0), inputs)
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)

    def loss_fn(params):
        u = net.apply(params, inputs)
        return module.loss(u, inputs, forcing)

    @jax.jit
    def step(params, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, l = step(params, opt_state)  # compile + warm
    _ = float(l)
    iters = int(os.environ.get("DIFFNET_BENCH_STEPS_ITERS", "60"))
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, l = step(params, opt_state)
    _ = float(l)  # host scalar readback closes the chain
    sps = iters / (time.perf_counter() - t0)
    out = {"train_steps_per_sec_fallback": float(f"{sps:.4g}"),
           "steps_fallback_workload": "ibn_ae32_bs64_device_resident"}

    # scanned variant: K optimizer steps inside ONE lax.scan dispatch —
    # the steps_per_call trainer mode's claimed TPU win, measured on the
    # actual chip at last. TPU-only like the trainer's guard: XLA:CPU runs
    # scan bodies single-threaded (measured 16x slower than eager steps)
    if jax.devices()[0].platform == "cpu":
        return out
    K = 10

    @jax.jit
    def stepK(params, opt_state):
        def body(c, _):
            p, s = c
            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (p, s), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=K)
        return p, s, losses[-1]

    params, opt_state, l = stepK(params, opt_state)
    _ = float(l)
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt_state, l = stepK(params, opt_state)
    _ = float(l)
    out["train_steps_per_sec_scan10"] = float(
        f"{reps * K / (time.perf_counter() - t0):.4g}")
    return out


def _steps_field_fallback():
    """Tier-3 steps/sec workload: direct-FIELD Poisson resmin Adam steps
    (params = the nodal field, reference e2_manufactured_resmin.py:543 —
    a real training configuration in the reference's own sense). No conv
    network at all: round-3 relay observations show conv-net training
    (even device-resident, winding-free) wedges the relay, while pure
    stencil/matmul residual chains survive. Chained via the evolving field
    + scalar readback."""
    import jax
    import jax.numpy as jnp
    import optax

    from diffnet_tpu.core import fem
    from diffnet_tpu.core.quadrature import make_basis

    n, bs = 64, 8
    h = 1.0 / (n - 1)
    basis = make_basis(2, 1, h=(h, h))
    A = fem.element_tensor(basis, ("dx", "dy"))
    rng = np.random.default_rng(0)
    nu = jnp.ones((bs, n, n), jnp.float32)
    f_gp = jnp.asarray(rng.random((bs, n - 1, n - 1, 4)), jnp.float32)
    bc = jnp.zeros((n, n)).at[0, :].set(1.0).at[-1, :].set(1.0)
    bc = bc.at[:, 0].set(1.0).at[:, -1].set(1.0)

    def loss_fn(u):
        R = fem.element_action(u, nu, A, basis, (n, n),
                               gp_terms=[(-f_gp, "N")])
        R = jnp.where(bc > 0.5, 0.0, R)
        return jnp.sum(R * R)

    opt = optax.adam(1e-3)
    u = jnp.asarray(rng.random((bs, n, n)), jnp.float32)
    opt_state = opt.init(u)

    @jax.jit
    def step(u, opt_state):
        l, g = jax.value_and_grad(loss_fn)(u)
        updates, opt_state = opt.update(g, opt_state, u)
        return optax.apply_updates(u, updates), opt_state, l

    u, opt_state, l = step(u, opt_state)
    _ = float(l)
    iters = int(os.environ.get("DIFFNET_BENCH_STEPS_ITERS", "60"))
    t0 = time.perf_counter()
    for _ in range(iters):
        u, opt_state, l = step(u, opt_state)
    _ = float(l)
    sps = iters / (time.perf_counter() - t0)
    out = {"train_steps_per_sec_field_fallback": float(f"{sps:.4g}"),
           "steps_field_workload": "poisson64_direct_field_resmin_bs8"}

    # scanned-K A/B on the SAME (relay-safe, stencil-only) workload: K
    # optimizer steps inside one lax.scan dispatch — the steps_per_call
    # trainer feature's claimed TPU win (VERDICT r2 item 7). TPU-only:
    # XLA:CPU runs scan bodies single-threaded.
    import jax as _jax

    if _jax.devices()[0].platform == "cpu":
        return out
    K = 10

    @jax.jit
    def stepK(u, opt_state):
        def body(c, _):
            uu, s = c
            l, g = jax.value_and_grad(loss_fn)(uu)
            updates, s = opt.update(g, s, uu)
            return (optax.apply_updates(uu, updates), s), l

        (uu, s), ls = jax.lax.scan(body, (u, opt_state), None, length=K)
        return uu, s, ls[-1]

    u, opt_state, l = stepK(u, opt_state)
    _ = float(l)
    reps = max(2, iters // K)
    t0 = time.perf_counter()
    for _ in range(reps):
        u, opt_state, l = stepK(u, opt_state)
    _ = float(l)
    out["train_steps_per_sec_field_scan10"] = float(
        f"{reps * K / (time.perf_counter() - t0):.4g}")
    # stream before the Pallas tier: a wedge there must not lose the
    # banked XLA tiers (the all-or-nothing pattern cost r3 two phases)
    print(json.dumps(out), flush=True)

    # PALLAS training tier (round 4): the same resmin training step with
    # the fused kernel as the residual — its custom VJP composes the
    # kernel for the backward stiffness action too, so forward+grad is
    # two kernel passes instead of the XLA element-stencil chains. At
    # 512^2 (where the kernel's HBM win shows) with scan-10 dispatch.
    from diffnet_tpu.ops import poisson_residual_fused

    np_ = 512
    hp = 1.0 / (np_ - 1)
    basis_p = make_basis(2, 1, h=(hp, hp))
    nu_p = jnp.ones((bs, np_, np_), jnp.float32)
    f_gp_p = jnp.asarray(rng.random((bs, np_ - 1, np_ - 1, 4)), jnp.float32)
    bc_p = jnp.zeros((np_, np_)).at[0, :].set(1.0).at[-1, :].set(1.0)
    bc_p = bc_p.at[:, 0].set(1.0).at[:, -1].set(1.0)
    Nf_p = jax.jit(lambda f: fem.galerkin_project(
        f, basis_p, "N", (np_, np_)))(f_gp_p)

    def loss_pallas(u):
        R = poisson_residual_fused(u, nu_p, Nf_p, bc_p, basis_p,
                                   variant="blockspec")
        return jnp.sum(R * R)

    opt_p = optax.adam(1e-3)
    up = jnp.asarray(rng.random((bs, np_, np_)), jnp.float32)
    sp = opt_p.init(up)

    @jax.jit
    def stepK_pallas(u, s):
        def body(c, _):
            uu, ss = c
            l, g = jax.value_and_grad(loss_pallas)(uu)
            updates, ss = opt_p.update(g, ss, uu)
            return (optax.apply_updates(uu, updates), ss), l

        (uu, ss), ls = jax.lax.scan(body, (u, s), None, length=K)
        return uu, ss, ls[-1]

    up, sp, l = stepK_pallas(up, sp)
    _ = float(l)
    t0 = time.perf_counter()
    reps_p = 3
    for _ in range(reps_p):
        up, sp, l = stepK_pallas(up, sp)
    _ = float(l)
    out["train_steps_per_sec_field512_pallas_scan10"] = float(
        f"{reps_p * K / (time.perf_counter() - t0):.4g}")
    print(json.dumps(out), flush=True)

    # single-launch fused loss+grad (round 5, VERDICT r4 #6): the whole
    # value_and_grad is ONE kernel pass — no second sweep, no XLA glue
    from diffnet_tpu.ops import poisson_resmin_loss_fused

    def loss_lg(u):
        return poisson_resmin_loss_fused(u, nu_p, Nf_p, bc_p, basis_p)

    ug = jnp.asarray(rng.random((bs, np_, np_)), jnp.float32)
    sg = opt_p.init(ug)

    @jax.jit
    def stepK_lg(u, s):
        def body(c, _):
            uu, ss = c
            l, g = jax.value_and_grad(loss_lg)(uu)
            updates, ss = opt_p.update(g, ss, uu)
            return (optax.apply_updates(uu, updates), ss), l

        (uu, ss), ls = jax.lax.scan(body, (u, s), None, length=K)
        return uu, ss, ls[-1]

    ug, sg, l = stepK_lg(ug, sg)
    _ = float(l)
    t0 = time.perf_counter()
    for _ in range(reps_p):
        ug, sg, l = stepK_lg(ug, sg)
    _ = float(l)
    out["train_steps_per_sec_field512_fusedlg_scan10"] = float(
        f"{reps_p * K / (time.perf_counter() - t0):.4g}")
    print(json.dumps(out), flush=True)

    # XLA A/B at the same 512^2 shape (element-tensor stencil path)
    A512 = fem.element_tensor(basis_p, ("dx", "dy"))

    def loss_xla512(u):
        R = fem.element_action(u, nu_p, A512, basis_p, (np_, np_),
                               gp_terms=[(-f_gp_p, "N")])
        R = jnp.where(bc_p > 0.5, 0.0, R)
        return jnp.sum(R * R)

    ux = jnp.asarray(rng.random((bs, np_, np_)), jnp.float32)
    sx = opt_p.init(ux)

    @jax.jit
    def stepK_xla512(u, s):
        def body(c, _):
            uu, ss = c
            l, g = jax.value_and_grad(loss_xla512)(uu)
            updates, ss = opt_p.update(g, ss, uu)
            return (optax.apply_updates(uu, updates), ss), l

        (uu, ss), ls = jax.lax.scan(body, (u, s), None, length=K)
        return uu, ss, ls[-1]

    ux, sx, l = stepK_xla512(ux, sx)
    _ = float(l)
    t0 = time.perf_counter()
    for _ in range(reps_p):
        ux, sx, l = stepK_xla512(ux, sx)
    _ = float(l)
    out["train_steps_per_sec_field512_xla_scan10"] = float(
        f"{reps_p * K / (time.perf_counter() - t0):.4g}")
    return out


def _largegrid():
    """Grid-scaling re-measure with the round-2+ methodology (chained
    inputs + scalar readback + ET stencil path + precomputed Nf): 1024^2
    and 2048^2 2D, 128^3 3D. The round-1 flatness table predates the
    chained methodology (VERDICT r2 item 8). Flat elem/s across sizes =
    HBM-bandwidth-bound as designed; a drop pinpoints layout/tiling work."""
    import jax
    import jax.numpy as jnp

    from diffnet_tpu.core import fem
    from diffnet_tpu.core.quadrature import make_basis

    out = {}
    for n, bs in ((1024, 8), (2048, 2)):
        h = 1.0 / (n - 1)
        basis = make_basis(2, 1, h=(h, h))
        A = fem.element_tensor(basis, ("dx", "dy"))
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.random((bs, n, n)), jnp.float32)
        nu = jnp.asarray(rng.random((bs, n, n)), jnp.float32)
        Nf = jnp.asarray(rng.random((bs, n, n)), jnp.float32)
        bc = jnp.zeros((n, n)).at[0, :].set(1.0).at[-1, :].set(1.0)

        @jax.jit
        def step(u, nu, Nf, A=A, basis=basis, n=n, bc=bc):
            R = fem.element_action(u, nu, A, basis, (n, n)) - Nf
            return jnp.where(bc > 0.5, 0.0, R) * 1e-6 + u

        r = u
        for _ in range(3):
            r = step(r, nu, Nf)
        _ = float(jnp.sum(r))
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            r = step(r, nu, Nf)
        _ = float(jnp.sum(r))
        t = (time.perf_counter() - t0) / iters
        out[f"elem_per_sec_{n}sq"] = float(f"{bs * (n-1)**2 / t:.4g}")
        # cumulative print per size: a relay wedge mid-phase must not
        # lose the sizes already measured (the phase runner takes the
        # last JSON line)
        print(json.dumps(out), flush=True)

    # 3D 128^3 (GP pipeline — the production 3D path)
    n, bs = 128, 1
    h = 1.0 / (n - 1)
    basis = make_basis(3, 1, h=(h, h, h))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((bs, n, n, n)), jnp.float32)
    nu = jnp.asarray(rng.random((bs, n, n, n)), jnp.float32)
    Nf = jnp.asarray(rng.random((bs, n, n, n)), jnp.float32)
    bc = jnp.zeros((n, n, n)).at[0].set(1.0).at[-1].set(1.0)

    @jax.jit
    def step3(u, nu, Nf):
        gp = fem.gp_eval(u, basis, ("dx", "dy", "dz"))
        nu_gp = fem.gp_eval(nu, basis, ("N",))["N"]
        R = fem.galerkin_project_multi(
            [(nu_gp * gp["dx"], "dx"), (nu_gp * gp["dy"], "dy"),
             (nu_gp * gp["dz"], "dz")], basis, (n, n, n)) - Nf
        return jnp.where(bc > 0.5, 0.0, R) * 1e-6 + u

    r = u
    for _ in range(3):
        r = step3(r, nu, Nf)
    _ = float(jnp.sum(r))
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        r = step3(r, nu, Nf)
    _ = float(jnp.sum(r))
    t = (time.perf_counter() - t0) / iters
    out["elem_per_sec_3d_128"] = float(f"{bs * (n-1)**3 / t:.4g}")
    return out


def _pallas_probe():
    """Watchdogged compiled-Pallas attempts (VERDICT r2 #1a / r3 #1a): the
    fused kernels, tiny-shape probes first, streaming cumulative JSON per
    banked step. Ordering (advisor r3): ALL BlockSpec-only attempts (2D
    64/512 + scan-chained, 3D 64^3 + scan, NS 256^2) run before the
    manual-DMA attempts — dma is the historical relay-wedge trigger, so a
    dma hang only loses dma numbers. Runs LAST in the phase chain; the
    subprocess timeout contains any hang and salvages the last JSON."""
    import jax
    import jax.numpy as jnp

    from diffnet_tpu.core import fem
    from diffnet_tpu.core.quadrature import make_basis
    from diffnet_tpu.ops import poisson_residual_fused

    if jax.devices()[0].platform == "cpu":
        # correctness-only on CPU (interpret mode); perf numbers are
        # meaningful on the TPU only
        import functools

        from jax.experimental import pallas as pl

        pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)

    out = {}

    def _bank(key, val):
        out[key] = val
        print(json.dumps(out), flush=True)  # stream per-banked-step JSON

    # ALL blockspec attempts run before ANY manual-DMA attempt (advisor r3):
    # the DMA variant is the historical relay-wedge trigger (hung at its
    # first cp.wait()); ordering it last means a dma hang only loses dma
    # numbers, not the 3D/NS blockspec metrics.
    def _probe_2d(variant):
        # 1024^2 tier = the largegrid-droop check with the kernel on
        # (VERDICT r3 #1d); the blockspec VMEM guard rejects it -> banked
        # as a skip marker and only the dma variant carries the number
        for n, bs, iters in ((64, 4, 5), (512, 32, 10), (1024, 8, 5)):
            if n > 64 and jax.devices()[0].platform == "cpu":
                continue   # interpret mode: hours at this size
            h = 1.0 / (n - 1)
            basis = make_basis(2, 1, h=(h, h))
            rng = np.random.default_rng(0)
            u = jnp.asarray(rng.random((bs, n, n)), jnp.float32)
            nu = jnp.asarray(rng.random((bs, n, n)), jnp.float32)
            f_gp = jnp.asarray(rng.random((bs, n-1, n-1, 4)), jnp.float32)
            bc = jnp.zeros((n, n)).at[0, :].set(1.0).at[-1, :].set(1.0)
            Nf = jax.jit(lambda f: fem.galerkin_project(
                f, basis, "N", (n, n)))(f_gp)
            fn = jax.jit(lambda u, nu, Nf=Nf, bc=bc, basis=basis:
                         poisson_residual_fused(u, nu, Nf, bc, basis,
                                                variant=variant)
                         * 1e-6 + u)
            try:
                r = fn(u, nu)
            except ValueError as e:   # VMEM-budget guard
                _bank(f"pallas_probe_{variant}_{n}_skip", str(e)[:90])
                continue
            _ = float(jnp.sum(r))  # compile + execute + readback
            _bank(f"pallas_probe_{variant}_{n}_ok", True)
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(r, nu)
            _ = float(jnp.sum(r))
            t = (time.perf_counter() - t0) / iters
            _bank(f"pallas_fused_elem_per_sec_{n}sq_{variant}",
                  float(f"{bs * (n-1)**2 / t:.4g}"))
            if n < 512 or jax.devices()[0].platform == "cpu":
                continue
            # SCAN-CHAINED (VERDICT r3 #1a): K residual applications inside
            # ONE dispatch, so kernel time is separated from the ~2-3 ms
            # relay round trip — same protocol as elem_per_sec_scan_loop.
            K = 20

            def body(carry, _, nu=nu, Nf=Nf, bc=bc, basis=basis):
                R = poisson_residual_fused(carry, nu, Nf, bc, basis,
                                           variant=variant)
                return R * 1e-6 + carry, None

            scan_fn = jax.jit(lambda r: jax.lax.scan(
                body, r, None, length=K)[0])
            r = scan_fn(u)
            _ = float(jnp.sum(r))
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                r = scan_fn(r)
            _ = float(jnp.sum(r))
            t = (time.perf_counter() - t0) / (reps * K)
            _bank(f"pallas_fused_elem_per_sec_{n}sq_{variant}_scan",
                  float(f"{bs * (n-1)**2 / t:.4g}"))
            if n != 512:
                continue
            # bf16 scan tier: every kernel byte halves (the XLA path
            # measured exactly x2 from bf16 — BENCH_MEASURED round 3)
            ub = u.astype(jnp.bfloat16)
            nub = nu.astype(jnp.bfloat16)
            Nfb = Nf.astype(jnp.bfloat16)

            def bodyb(carry, _, nub=nub, Nfb=Nfb, bc=bc, basis=basis):
                R = poisson_residual_fused(carry, nub, Nfb, bc, basis,
                                           variant=variant)
                return R * jnp.bfloat16(1e-3) + carry, None

            scanb = jax.jit(lambda r: jax.lax.scan(
                bodyb, r, None, length=K)[0])
            rb = scanb(ub)
            _ = float(jnp.sum(rb.astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(reps):
                rb = scanb(rb)
            _ = float(jnp.sum(rb.astype(jnp.float32)))
            t = (time.perf_counter() - t0) / (reps * K)
            _bank(f"pallas_fused_elem_per_sec_{n}sq_{variant}_scan_bf16",
                  float(f"{bs * (n-1)**2 / t:.4g}"))

    _probe_2d("blockspec")

    if jax.devices()[0].platform == "cpu":
        # correctness smoke only: the 64^2 tiers above ran in interpret
        # mode; 3D/NS interpret tiers cost minutes-hours each — covered
        # by tests/test_pallas_kernel.py instead
        _probe_2d("dma")
        return out

    # 3D blockspec attempt at the reference's voxel scale (64^3)
    from diffnet_tpu.ops import poisson_residual_fused_3d

    n, bs, iters = 64, 4, 5
    h = 1.0 / (n - 1)
    basis = make_basis(3, 1, h=(h, h, h))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((bs, n, n, n)), jnp.float32)
    nu = jnp.asarray(rng.random((bs, n, n, n)), jnp.float32)
    Nf = jnp.zeros((bs, n, n, n), jnp.float32)
    bc = jnp.zeros((n, n, n)).at[0].set(1.0).at[-1].set(1.0)
    fn = jax.jit(lambda u, nu: poisson_residual_fused_3d(
        u, nu, Nf, bc, basis, variant="blockspec") * 1e-6 + u)
    r = fn(u, nu)
    _ = float(jnp.sum(r))
    _bank("pallas_probe_blockspec_3d64_ok", True)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(r, nu)
    _ = float(jnp.sum(r))
    t = (time.perf_counter() - t0) / iters
    _bank("pallas_fused_elem_per_sec_3d64_blockspec",
          float(f"{bs * (n-1)**3 / t:.4g}"))

    # scan-chained 3D (same RTT-amortization protocol as 2D)
    def body3(carry, _):
        R = poisson_residual_fused_3d(carry, nu, Nf, bc, basis,
                                      variant="blockspec")
        return R * 1e-6 + carry, None

    scan3 = jax.jit(lambda r: jax.lax.scan(body3, r, None, length=10)[0])
    r = scan3(u)
    _ = float(jnp.sum(r))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = scan3(r)
    _ = float(jnp.sum(r))
    t = (time.perf_counter() - t0) / (reps * 10)
    _bank("pallas_fused_elem_per_sec_3d64_blockspec_scan",
          float(f"{bs * (n-1)**3 / t:.4g}"))

    # FOLDED-Z 3D variant (round 5, VERDICT r4 #3: (z,y) collapsed into
    # one row axis so the body runs in the 2D kernel's rank-2 regime) —
    # A/B against the rank-3 blockspec number above
    def body3f(carry, _):
        R = poisson_residual_fused_3d(carry, nu, Nf, bc, basis,
                                      variant="bsf")
        return R * 1e-6 + carry, None

    scan3f = jax.jit(lambda r: jax.lax.scan(body3f, r, None, length=10)[0])
    r = scan3f(u)
    _ = float(jnp.sum(r))
    _bank("pallas_probe_bsf_3d64_ok", True)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = scan3f(r)
    _ = float(jnp.sum(r))
    t = (time.perf_counter() - t0) / (reps * 10)
    _bank("pallas_fused_elem_per_sec_3d64_bsf_scan",
          float(f"{bs * (n-1)**3 / t:.4g}"))

    # NS VMS blockspec attempt (the 13-GP-quantity chain in one kernel)
    from diffnet_tpu.ops import ns_vms_residual_fused

    n, bs, iters = 256, 8, 5
    h = 1.0 / (n - 1)
    basis = make_basis(2, 1, h=(h, h))
    rng = np.random.default_rng(0)
    u, v, p = (jnp.asarray(rng.random((bs, n, n)), jnp.float32)
               for _ in range(3))
    fn = jax.jit(lambda u, v, p: [r * 1e-6 + a for r, a in zip(
        ns_vms_residual_fused(u, v, p, None, None, basis, 0.01,
                              variant="blockspec"), (u, v, p))])
    u, v, p = fn(u, v, p)
    _ = float(jnp.sum(p))
    _bank("pallas_probe_blockspec_ns256_ok", True)
    t0 = time.perf_counter()
    for _ in range(iters):
        u, v, p = fn(u, v, p)
    _ = float(jnp.sum(p))
    t = (time.perf_counter() - t0) / iters
    _bank("pallas_ns_vms_elem_per_sec_256sq_blockspec",
          float(f"{bs * (n-1)**2 / t:.4g}"))

    # scan-chained NS (RTT-amortized, same protocol as 2D/3D)
    def bodyn(carry, _):
        cu, cv, cp_ = carry
        R1, R2, R3 = ns_vms_residual_fused(cu, cv, cp_, None, None, basis,
                                           0.01, variant="blockspec")
        return (R1 * 1e-6 + cu, R2 * 1e-6 + cv, R3 * 1e-6 + cp_), None

    scann = jax.jit(lambda c: jax.lax.scan(bodyn, c, None, length=10)[0])
    c = scann((u, v, p))
    _ = float(jnp.sum(c[2]))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        c = scann(c)
    _ = float(jnp.sum(c[2]))
    t = (time.perf_counter() - t0) / (reps * 10)
    _bank("pallas_ns_vms_elem_per_sec_256sq_blockspec_scan",
          float(f"{bs * (n-1)**2 / t:.4g}"))

    # manual-DMA variant LAST (the historical wedge trigger)
    _probe_2d("dma")

    # 3D 128^3 via the DMA variant (blockspec holds the full volume in
    # VMEM and is guarded to 64^3) — the VERDICT r3 #3 scale point; very
    # last because dma is the wedge class
    if jax.devices()[0].platform == "cpu":
        return out   # interpret mode: hours at this size
    n, bs = 128, 1
    h = 1.0 / (n - 1)
    basis = make_basis(3, 1, h=(h, h, h))
    rng = np.random.default_rng(0)
    u3 = jnp.asarray(rng.random((bs, n, n, n)), jnp.float32)
    nu3 = jnp.asarray(rng.random((bs, n, n, n)), jnp.float32)
    Nf3 = jnp.zeros((bs, n, n, n), jnp.float32)
    bc3 = jnp.zeros((n, n, n)).at[0].set(1.0).at[-1].set(1.0)

    def body3l(carry, _):
        R = poisson_residual_fused_3d(carry, nu3, Nf3, bc3, basis,
                                      variant="dma")
        return R * 1e-6 + carry, None

    scan3l = jax.jit(lambda r: jax.lax.scan(body3l, r, None, length=5)[0])
    r3 = scan3l(u3)
    _ = float(jnp.sum(r3))
    _bank("pallas_probe_dma_3d128_ok", True)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r3 = scan3l(r3)
    _ = float(jnp.sum(r3))
    t = (time.perf_counter() - t0) / (reps * 5)
    _bank("pallas_fused_elem_per_sec_3d128_dma_scan",
          float(f"{bs * (n-1)**3 / t:.4g}"))

    # folded-z manual-DMA variant at 128^3 (round 5)
    def body3lf(carry, _):
        R = poisson_residual_fused_3d(carry, nu3, Nf3, bc3, basis,
                                      variant="dmaf")
        return R * 1e-6 + carry, None

    scan3lf = jax.jit(lambda r: jax.lax.scan(body3lf, r, None, length=5)[0])
    r3 = scan3lf(u3)
    _ = float(jnp.sum(r3))
    _bank("pallas_probe_dmaf_3d128_ok", True)
    t0 = time.perf_counter()
    for _ in range(reps):
        r3 = scan3lf(r3)
    _ = float(jnp.sum(r3))
    t = (time.perf_counter() - t0) / (reps * 5)
    _bank("pallas_fused_elem_per_sec_3d128_dmaf_scan",
          float(f"{bs * (n-1)**3 / t:.4g}"))
    return out


def _stencil_apply_probe():
    """ASSEMBLED-stencil apply kernel tiers (ops/stencil_apply.py): the
    production Krylov/MG iteration once the operator is extracted —
    9/27 FMA per node against width**nsd + 2 fields of traffic,
    bandwidth-bound where the nu-form kernels are VPU-compute-bound.
    Random C planes = identical bytes/FLOPs to extracted ones. Own phase
    (streamed JSON) so a pallas-probe timeout cannot eat these numbers;
    blockspec tier first, manual-DMA tiers last (the wedge class)."""
    import jax
    import jax.numpy as jnp

    from diffnet_tpu.ops.stencil_apply import stencil_apply

    out = {}

    def _bank(key, val):
        out[key] = val
        print(json.dumps(out), flush=True)

    if jax.devices()[0].platform == "cpu":
        # numerics pinned by tests/test_stencil_apply_kernel.py; perf
        # tiers are TPU-only (interpret mode costs hours at 512^2)
        return out

    def tier_2d(variant):
        n, bs, K, reps = 512, 32, 20, 3
        rng = np.random.default_rng(0)
        C = jnp.asarray(rng.random((9, bs, n, n)), jnp.float32)
        u = jnp.asarray(rng.random((bs, n, n)), jnp.float32)

        # C must be a runtime ARG, not a closure: a closed-over 301 MB
        # array bakes into the compile payload and the relay's
        # remote_compile rejects it (HTTP 413, measured 2026-08-18)
        def body(C, carry, _):
            return stencil_apply(C, carry, 2, None, variant) * 1e-6 \
                + carry, None

        scan_fn = jax.jit(lambda r, C: jax.lax.scan(
            functools.partial(body, C), r, None, length=K)[0])
        try:
            r = scan_fn(u, C)
        except ValueError as e:   # VMEM-budget guard
            _bank(f"pallas_stencil_apply_{variant}_{n}_skip", str(e)[:90])
            return
        _ = float(jnp.sum(r))
        _bank(f"pallas_stencil_apply_{variant}_{n}_ok", True)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = scan_fn(r, C)
        _ = float(jnp.sum(r))
        t = (time.perf_counter() - t0) / (reps * K)
        _bank(f"pallas_stencil_apply_elem_per_sec_{n}sq_{variant}_scan",
              float(f"{bs * (n - 1) ** 2 / t:.4g}"))

    tier_2d("blockspec")
    tier_2d("dma")

    # 3D 27-point apply at 128^3: the fixed-operator iteration the
    # z-layer-serialized nu-form kernel cannot reach (gather form, no
    # read-modify-write into out planes) — the candidate fix for the
    # "3D caps at ~9e8" structure problem
    n, bs, K = 128, 1, 5
    rng = np.random.default_rng(1)
    C3 = jnp.asarray(rng.random((27, bs, n, n, n)), jnp.float32)
    u3 = jnp.asarray(rng.random((bs, n, n, n)), jnp.float32)

    def body3(C, carry, _):
        return stencil_apply(C, carry, 3, None, "dma") * 1e-6 \
            + carry, None

    scan3 = jax.jit(lambda r, C: jax.lax.scan(
        functools.partial(body3, C), r, None, length=K)[0])
    r3 = scan3(u3, C3)
    _ = float(jnp.sum(r3))
    _bank("pallas_stencil_apply_dma_3d128_ok", True)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r3 = scan3(r3, C3)
    _ = float(jnp.sum(r3))
    t = (time.perf_counter() - t0) / (reps * K)
    _bank("pallas_stencil_apply_elem_per_sec_3d128_dma_scan",
          float(f"{bs * (n-1)**3 / t:.4g}"))

    # folded-z 3D apply (round 5): all 27 gather windows as rank-2 row
    # slices — A/B against the rank-3 tier above
    def body3f(C, carry, _):
        return stencil_apply(C, carry, 3, None, "dmaf") * 1e-6 \
            + carry, None

    scan3f = jax.jit(lambda r, C: jax.lax.scan(
        functools.partial(body3f, C), r, None, length=K)[0])
    r3 = scan3f(u3, C3)
    _ = float(jnp.sum(r3))
    _bank("pallas_stencil_apply_dmaf_3d128_ok", True)
    t0 = time.perf_counter()
    for _ in range(reps):
        r3 = scan3f(r3, C3)
    _ = float(jnp.sum(r3))
    t = (time.perf_counter() - t0) / (reps * K)
    _bank("pallas_stencil_apply_elem_per_sec_3d128_dmaf_scan",
          float(f"{bs * (n-1)**3 / t:.4g}"))
    return out


def _final_l2():
    """Final L2 error, Poisson 64^2 MMS resmin + LBFGS (the reference
    acceptance criterion, e2_manufactured_resmin.py:575)."""
    from diffnet_tpu.data.single_instances import RectangleManufactured
    from diffnet_tpu.models.field import DirectField
    from diffnet_tpu.pde.poisson import Poisson2D
    from diffnet_tpu.train.trainer import Trainer

    n = 64
    exact = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)
    forcing = lambda x, y: 2 * np.pi**2 * np.sin(np.pi * x) * np.sin(
        np.pi * y)
    dsm = RectangleManufactured(domain_size=n)
    dsm.n_samples = 1
    m = Poisson2D(DirectField((n, n), init=np.zeros((n, n))), dsm,
                  domain_size=n, batch_size=1, loss_type="resmin",
                  exact_solution=exact, forcing=forcing, mms_dirichlet=True)
    st = Trainer(max_epochs=80, optimizer="lbfgs", lbfgs_max_iter=10).fit(m)
    eL2, _, uex = m.calc_l2_err(m.network.apply(st.params)[0])
    rel = float(f"{float(eL2 / uex):.4g}")
    return {"final_rel_l2": rel, "poisson64_final_rel_l2": rel}


def _ns_throughput():
    """Full-VMS Navier-Stokes 3-residual assembly throughput at 512^2
    (the 13-GP-quantity hot path, reference e1_ns_ldc_resmin.py:217-306).
    Chained timing: each iteration feeds the residuals back into the
    fields so the relay cannot serve results from its cache."""
    import jax
    import jax.numpy as jnp

    from diffnet_tpu.data.flow import NSLDCDataset
    from diffnet_tpu.pde.flow import NavierStokes

    n = int(os.environ.get("DIFFNET_BENCH_SIZE", "512"))
    bs = 8
    ds = NSLDCDataset(domain_sizes=(n, n), Re=100)
    m = NavierStokes(None, ds, domain_size=n, batch_size=bs, Re=100)
    inputs, forcing = ds[0]
    inputs = jnp.asarray(np.broadcast_to(
        inputs[None], (bs,) + inputs.shape), jnp.float32)
    forcing = jnp.asarray(np.broadcast_to(
        forcing[None], (bs,) + forcing.shape), jnp.float32)
    rng = np.random.default_rng(0)
    uvp = jnp.asarray(rng.random((3, bs, n, n)), jnp.float32) * 0.1

    @jax.jit
    def step(uvp, inputs, forcing):
        R1, R2, R3 = m.calc_residuals(
            (uvp[0], uvp[1], uvp[2]), inputs, forcing)
        return uvp + 1e-6 * jnp.stack([R1, R2, R3])

    # chained timing + a host SCALAR readback closing the chain: on this
    # image's relay, block_until_ready alone can return before the chain
    # actually executed (measured 6.9e10 "elem/s", 40x the physical bound);
    # pulling a value that depends on every iteration forces real execution
    import time as _time

    r = uvp
    for _ in range(3):
        r = step(r, inputs, forcing)
    _ = float(jnp.sum(r))
    iters = 15
    t0 = _time.perf_counter()
    r2 = r
    for _ in range(iters):
        r2 = step(r2, inputs, forcing)
    _ = float(jnp.sum(r2))
    t = (_time.perf_counter() - t0) / iters
    eps = float(f"{bs * (n - 1) * (n - 1) / t:.4g}")
    return {f"ns_vms_residual_elem_per_sec_{n}sq": eps}


def _serve_latency():
    """Serving-path latency: export the flagship IBN forward (AE on the
    chi mask, params baked in) to StableHLO, reload it model-code-free,
    and time single-sample inference (the production serving story;
    reference counterpart is torch.load of a pickled module,
    query.py:207)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from diffnet_tpu.models.networks import AE
    from diffnet_tpu.utils.export import (export_forward, load_exported,
                                          save_exported)

    n = 32
    net = AE(out_channels=1, dims=8, n_downsample=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, n, n, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    with tempfile.NamedTemporaryFile(suffix=".stablehlo") as f:
        save_exported(export_forward(net, params, x), f.name)
        served = load_exported(f.name)
    call = jax.jit(served.call)
    r = call(x)
    jax.block_until_ready(r)
    iters = 50
    # chain the output straight back in (shapes match): one dispatch per
    # iteration, fresh input each call. On this image the number is
    # dominated by the relay round-trip (~2-12 ms), not the model.
    t0 = time.perf_counter()
    for _ in range(iters):
        r = call(r)
    _ = float(jnp.sum(r))
    t = (time.perf_counter() - t0) / iters
    out = {"serve_latency_ms_ibn32_bs1": float(f"{t * 1e3:.4g}")}
    print(json.dumps(out), flush=True)  # wedge-proof: bank per metric

    # ON-CHIP serving numbers (VERDICT r2 weak 5: the per-dispatch figure
    # above is ~90% relay round-trip on this image — it measures the
    # tunnel). K chained forwards inside ONE lax.scan dispatch + scalar
    # readback amortize the RTT away: this is the model's own latency, and
    # what a production serving loop (requests queued on device) sees.
    def _scan_rate(call, x0, K):
        fn = jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (call(c), None), x, None, length=K)[0])
        r = fn(x0)
        _ = float(jnp.sum(r))  # compile + execute + readback
        t0 = time.perf_counter()
        _ = float(jnp.sum(fn(r)))
        return (time.perf_counter() - t0) / K

    t1 = _scan_rate(call, x, 200)
    out["serve_latency_ms_ibn32_bs1_onchip"] = float(f"{t1 * 1e3:.4g}")
    print(json.dumps(out), flush=True)
    # batched serving throughput (the export is shape-specific; re-export
    # at bs=64 — export cost is offline, not part of the serving loop)
    xb = jnp.asarray(rng.random((64, n, n, 1)), jnp.float32)
    with tempfile.NamedTemporaryFile(suffix=".stablehlo") as f:
        save_exported(export_forward(net, params, xb), f.name)
        call_b = jax.jit(load_exported(f.name).call)
    tb = _scan_rate(call_b, xb, 50)
    out["serve_throughput_samples_per_sec_ibn32_bs64"] = float(
        f"{64 / tb:.4g}")
    return out


def _p3d_throughput():
    """3D Poisson residual throughput at 64^3 (the reference's voxel-solve
    scale, IBN/poisson-3d/*; trilinear deg-1, 2x2x2 GP). Chained + scalar
    readback, streaming cumulative JSON per banked variant (VERDICT r3
    #3+#7): GP pipeline per-dispatch (the r02/r03 metric), then its
    scan-chained rate (separates the 64^3-regression question from relay
    RTT noise), then the element-tensor matmul form and the trilinear
    stencil expansion ON-CHIP — the 'stencil slower than GP' decision in
    core/fem.py was CPU-measured only."""
    import jax
    import jax.numpy as jnp

    from diffnet_tpu.core import fem
    from diffnet_tpu.core.quadrature import make_basis

    n, bs = 64, 4
    h = 1.0 / (n - 1)
    basis = make_basis(3, 1, h=(h, h, h))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((bs, n, n, n)), jnp.float32)
    nu = jnp.asarray(rng.random((bs, n, n, n)), jnp.float32)
    f_gp = jnp.asarray(rng.random((bs, n - 1, n - 1, n - 1, 8)), jnp.float32)
    bc = jnp.zeros((n, n, n)).at[0].set(1.0).at[-1].set(1.0)
    Nf = jax.jit(lambda f: fem.galerkin_project(f, basis, "N",
                                                (n, n, n)))(f_gp)
    A_el = fem.element_tensor(basis, ("dx", "dy", "dz"))
    elems = bs * (n - 1) ** 3
    out = {}

    def bank(key, val):
        out[key] = val
        print(json.dumps(out), flush=True)

    def gp_res_fgp(u, nu):
        # the r02/r03 headline formula: f_gp (8 element-grid channels)
        # projected per call — kept verbatim so the 64^3 regression trail
        # stays comparable across rounds
        gp = fem.gp_eval(u, basis, ("dx", "dy", "dz"))
        nu_gp = fem.gp_eval(nu, basis, ("N",))["N"]
        R = fem.galerkin_project_multi(
            [(nu_gp * gp["dx"], "dx"), (nu_gp * gp["dy"], "dy"),
             (nu_gp * gp["dz"], "dz"), (-f_gp, "N")], basis, (n, n, n))
        return jnp.where(bc > 0.5, 0.0, R)

    def gp_res(u, nu):
        # precomputed-Nf variant (the 2D headline's r3 convention)
        gp = fem.gp_eval(u, basis, ("dx", "dy", "dz"))
        nu_gp = fem.gp_eval(nu, basis, ("N",))["N"]
        R = fem.galerkin_project_multi(
            [(nu_gp * gp["dx"], "dx"), (nu_gp * gp["dy"], "dy"),
             (nu_gp * gp["dz"], "dz")], basis, (n, n, n)) - Nf
        return jnp.where(bc > 0.5, 0.0, R)

    def et_res(u, nu):
        R = fem.element_action(u, nu, A_el, basis, (n, n, n)) - Nf
        return jnp.where(bc > 0.5, 0.0, R)

    def st_res(u, nu):
        R = fem._element_action_stencil(u, nu, A_el, basis,
                                        (n, n, n)) - Nf
        return jnp.where(bc > 0.5, 0.0, R)

    def perdispatch(resfn, iters=15):
        fn = jax.jit(lambda u, nu: resfn(u, nu) * 1e-6 + u)
        r = fn(u, nu)
        for _ in range(2):
            r = fn(r, nu)
        _ = float(jnp.sum(r))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(r, nu)
        _ = float(jnp.sum(r))
        return float(f"{elems / ((time.perf_counter() - t0) / iters):.4g}")

    def scanK(resfn, K=15, reps=3):
        fn = jax.jit(lambda r: jax.lax.scan(
            lambda c, _: (resfn(c, nu) * 1e-6 + c, None),
            r, None, length=K)[0])
        r = fn(u)
        _ = float(jnp.sum(r))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(r)
        _ = float(jnp.sum(r))
        return float(
            f"{elems / ((time.perf_counter() - t0) / (reps * K)):.4g}")

    bank("poisson3d_elem_per_sec_64cubed", perdispatch(gp_res_fgp))
    bank("poisson3d_elem_per_sec_64cubed_nf", perdispatch(gp_res))
    bank("poisson3d_elem_per_sec_64cubed_scan", scanK(gp_res))
    bank("poisson3d_elem_per_sec_64cubed_et", perdispatch(et_res))
    bank("poisson3d_elem_per_sec_64cubed_et_scan", scanK(et_res))
    bank("poisson3d_elem_per_sec_64cubed_etstencil_scan", scanK(st_res))
    return out


def _stencil_throughput():
    """Assembled-stencil production iteration (train/stencil.py): the
    operator is extracted ONCE (9 coloring probes) into explicit
    width-3 coefficient maps, and every subsequent Krylov/smoother
    iteration is a single fused pad+FMA stencil pass. Per-iteration HBM
    traffic drops from the element-tensor path's ~1.2 GB/call (XLA
    materializes ~15 element-grid pieces — docs/KERNELS.md accounting)
    to ~(9+3) fields = ~0.40 GB at 512^2/bs32: the XLA-reachable version
    of the fused Pallas kernel's VMEM chain. Chained + scalar readback,
    plus a scan-K in-dispatch variant (the actual jax.scipy solver
    iteration pattern, relay RTT amortized)."""
    import jax
    import jax.numpy as jnp

    from diffnet_tpu.core import fem
    from diffnet_tpu.core.quadrature import make_basis
    from diffnet_tpu.train.stencil import extract_stencil, stencil_matvec

    n = int(os.environ.get("DIFFNET_BENCH_SIZE", "512"))
    bs = int(os.environ.get("DIFFNET_BENCH_BATCH", "32"))
    h = 1.0 / (n - 1)
    basis = make_basis(2, 1, h=(h, h))
    rng = np.random.default_rng(0)
    u_np = rng.random((bs, n, n)).astype(np.float32)
    nu_np = rng.random((bs, n, n)).astype(np.float32)
    f_np = rng.random((bs, n - 1, n - 1, 4)).astype(np.float32)
    bc_np = np.zeros((n, n), np.float32)
    bc_np[[0, -1], :] = 1.0
    A_el = fem.element_tensor(basis, ("dx", "dy"))

    # extraction is SETUP — run it on the CPU backend so the relay only
    # ever sees the iteration kernel (9 vmapped element_action probes at
    # 512^2/bs32 are exactly the sustained-load profile that wedges it)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        nu_c = jnp.asarray(nu_np)
        bc_c = jnp.asarray(bc_np)

        def Afn(v):
            R = fem.element_action(v, nu_c, A_el, basis, (n, n))
            return jnp.where(bc_c > 0.5, 0.0, R)

        C_np = np.asarray(extract_stencil(Afn, (bs, n, n), nsd=2))
        Nf_np = np.asarray(fem.galerkin_project(
            jnp.asarray(f_np), basis, "N", (n, n)))
        Nf_np = np.where(bc_np > 0.5, 0.0, Nf_np).astype(np.float32)

    dev = jax.devices()[0]
    C = jax.device_put(C_np, dev)
    Nfm = jax.device_put(Nf_np, dev)
    u = jax.device_put(u_np, dev)

    @jax.jit
    def step(v):
        R = stencil_matvec(C, v, nsd=2) - Nfm
        return R * 1e-6 + v

    r = u
    for _ in range(5):
        r = step(r)
    _ = float(jnp.sum(r))
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        r = step(r)
    _ = float(jnp.sum(r))
    t = (time.perf_counter() - t0) / iters
    elems = bs * (n - 1) * (n - 1)
    # bank the per-dispatch number before the scan variant (wedge-proofing:
    # this phase lost its whole r03 result to an all-or-nothing timeout)
    print(json.dumps({"stencil_matvec_elem_per_sec_512sq":
                      float(f"{elems / t:.4g}")}), flush=True)

    K = 20

    @jax.jit
    def stepK(v):
        def body(c, _):
            R = stencil_matvec(C, c, nsd=2) - Nfm
            return R * 1e-6 + c, None

        out, _ = jax.lax.scan(body, v, None, length=K)
        return out

    r = stepK(r)
    _ = float(jnp.sum(r))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        r = stepK(r)
    _ = float(jnp.sum(r))
    t_scan = (time.perf_counter() - t0) / (reps * K)
    return {"stencil_matvec_elem_per_sec_512sq":
            float(f"{elems / t:.4g}"),
            "stencil_matvec_elem_per_sec_scan_loop":
            float(f"{elems / t_scan:.4g}")}


def _solve_time():
    """End-to-end TIME-TO-SOLUTION: variable-coefficient (54x-contrast)
    Poisson at the headline grid scale, solved by assembled-stencil MG-CG
    with the ENTIRE solve inside one jitted dispatch (device while_loop)
    + scalar readback. This is the conventional-solver capability the
    reference lacks — its route to the same field is hundreds-to-
    thousands of Adam/LBFGS epochs (e2_manufactured_resmin.py:543).
    Setup (operator extraction, MG hierarchy, coarse pinv, power
    iterations) runs on the CPU backend; the relay only ever sees the
    one solve dispatch."""
    import jax
    import jax.numpy as jnp

    from diffnet_tpu.models.field import DirectField
    from diffnet_tpu.pde import Poisson2D
    from diffnet_tpu.train import multigrid_preconditioner

    n = int(os.environ.get("DIFFNET_BENCH_SOLVE_SIZE", "513"))
    iters = int(os.environ.get("DIFFNET_BENCH_SOLVE_ITERS", "14"))

    # smooth ~54x-contrast coefficient (exp(2g), g in [-1, 1]) — no
    # per-level dataset can re-synthesize it; the restrict path feeds it
    x = np.linspace(0.0, 1.0, n)
    X, Y = np.meshgrid(x, x, indexing="xy")
    g = (np.cos(2 * np.pi * X) * np.cos(np.pi * Y)
         + 0.5 * np.sin(3 * np.pi * X * Y))
    nu = np.exp(2.0 * g / np.abs(g).max()).astype(np.float32)

    class _DS:
        def __init__(self, nu):
            m = nu.shape[0]
            b1 = np.zeros((m, m), np.float32); b1[:, 0] = 1
            b2 = np.zeros((m, m), np.float32); b2[:, -1] = 1
            self.inputs = np.stack([nu, b1, b2], -1).astype(np.float32)
            self.forcing = np.zeros((m, m, 1), np.float32)

        def __len__(self):
            return 1

        def __getitem__(self, idx):
            return self.inputs, self.forcing

    ds_fine = _DS(nu)

    def factory(m_n, _cache={}):
        if m_n not in _cache:
            ds = ds_fine if m_n == n else _DS(np.ones((m_n, m_n),
                                                      np.float32))
            _cache[m_n] = Poisson2D(DirectField((m_n, m_n)), ds,
                                    domain_size=m_n, batch_size=1,
                                    loss_type="resmin")
        return _cache[m_n]

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        M, info = multigrid_preconditioner(
            factory, n, n_coarse=min(33, n), inputs_per_level="restrict")
        m = factory(n)
        inputs = jnp.asarray(ds_fine.inputs)[None]
        forcing = jnp.asarray(ds_fine.forcing)[None]
        bc = np.zeros((n, n), np.float32)
        bc[:, [0, -1]] = 1.0
        rng = np.random.default_rng(0)
        b_np = np.where(bc > 0.5, 0.0,
                        rng.standard_normal((n, n))).astype(np.float32)

        def Afn(v):
            return m.residual_for_field(v[None], inputs, forcing)[0]

        z = jnp.zeros((n, n), jnp.float32)
        b0 = Afn(z)  # affine part; A_lin(v) = Afn(v) - b0

    dev = jax.devices()[0]
    b = jax.device_put(jnp.asarray(b_np), dev)

    @jax.jit
    def solve(b):
        A = lambda v: Afn(v) - b0
        u, _ = jax.scipy.sparse.linalg.cg(A, b, tol=0.0, maxiter=iters,
                                          M=M)
        r = A(u) - b
        return u, jnp.linalg.norm(r) / jnp.linalg.norm(b)

    _, rel = solve(b)
    rel0 = float(rel)  # compile + execute + readback
    reps = 3
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        # scale b each rep: repeated identical dispatches can be served
        # from the relay result cache (trap #1, CLAUDE.md)
        _, rel = solve(b * (1.0 + 1e-3 * i))
        rel0 = float(rel)
    t = (time.perf_counter() - t0) / reps
    out = {"poisson_varnu_mgcg_solve_ms": float(f"{t * 1e3:.4g}"),
           "poisson_varnu_mgcg_solve_relres": float(f"{rel0:.3g}"),
           "poisson_varnu_mgcg_solve_n": n,
           "poisson_varnu_mgcg_solve_iters": iters}
    # bank the stencil solve IMMEDIATELY: the Pallas variant below is a
    # potential relay-wedge trigger and must not lose this number
    print(json.dumps(out), flush=True)

    # PALLAS-fine-level variant (VERDICT r3 #1c): the outer CG matvec AND
    # the V-cycle's fine-level matvecs go through the fused kernel (u+nu
    # in / R out — ~3 fields of HBM traffic vs ~11 for the assembled
    # stencil). MG setup stays on CPU with the XLA operator; only the one
    # solve dispatch runs Pallas. Skipped on CPU (compiled Pallas needs
    # the TPU backend; numerics are pinned by tests in interpret mode).
    if jax.devices()[0].platform == "cpu":
        return out
    m_f = Poisson2D(DirectField((n, n)), ds_fine, domain_size=n,
                    batch_size=1, loss_type="resmin", fused_kernels=True,
                    fused_variant="blockspec")

    def Af(v):
        return m_f.residual_for_field(v[None], inputs, forcing)[0] - b0

    with jax.default_device(cpu):
        M2, _ = multigrid_preconditioner(
            factory, n, n_coarse=min(33, n), inputs_per_level="restrict",
            fine_matvec=Af)

    @jax.jit
    def solve_pallas(b):
        u, _ = jax.scipy.sparse.linalg.cg(Af, b, tol=0.0, maxiter=iters,
                                          M=M2)
        r = Af(u) - b
        return u, jnp.linalg.norm(r) / jnp.linalg.norm(b)

    _, rel = solve_pallas(b)
    relp = float(rel)
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        _, rel = solve_pallas(b * (1.0 + 1e-3 * i))
        relp = float(rel)
    t = (time.perf_counter() - t0) / reps
    out["poisson_varnu_mgcg_solve_ms_pallas"] = float(f"{t * 1e3:.4g}")
    out["poisson_varnu_mgcg_solve_relres_pallas"] = float(f"{relp:.3g}")
    print(json.dumps(out), flush=True)

    # ASSEMBLED-STENCIL-KERNEL variant (round 4): outer CG matvec AND
    # every assembled V-cycle level go through the Pallas gather apply
    # (ops.stencil_apply 'dma') on the one-time extracted planes — the
    # fixed-operator iteration form. Setup (extraction, hierarchy,
    # pinv, power iterations) stays on CPU; banked last (manual-DMA
    # kernel = the wedge class).
    from diffnet_tpu.train.stencil import extract_verified, stencil_matvec

    with jax.default_device(cpu):
        M3, _ = multigrid_preconditioner(
            factory, n, n_coarse=min(33, n), inputs_per_level="restrict",
            stencil_kernel="dma")
        Cf, defect = extract_verified(lambda v: Afn(v) - b0, (n, n))
    if defect > 1e-4:
        out["poisson_varnu_mgcg_stencil_kernel_skip"] = \
            f"fine-operator stencil defect {defect:.2e}"
        return out

    def Ak(v):
        return stencil_matvec(Cf, v, kernel="dma")

    @jax.jit
    def solve_sk(b):
        u, _ = jax.scipy.sparse.linalg.cg(Ak, b, tol=0.0, maxiter=iters,
                                          M=M3)
        r = Ak(u) - b
        return u, jnp.linalg.norm(r) / jnp.linalg.norm(b)

    _, rel = solve_sk(b)
    rels = float(rel)
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        _, rel = solve_sk(b * (1.0 + 1e-3 * i))
        rels = float(rel)
    t = (time.perf_counter() - t0) / reps
    out["poisson_varnu_mgcg_solve_ms_stencil_kernel"] = \
        float(f"{t * 1e3:.4g}")
    out["poisson_varnu_mgcg_solve_relres_stencil_kernel"] = \
        float(f"{rels:.3g}")
    return out


def _bf16_primary():
    """The primary element-residual metric with bfloat16 fields (halves the
    HBM traffic; accuracy study in docs/MIXED_PRECISION.md)."""
    os.environ["DIFFNET_BENCH_DTYPE"] = "bfloat16"
    os.environ["DIFFNET_BENCH_PRIMARY_ONLY"] = "1"
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main()
    d = json.loads(buf.getvalue().strip().splitlines()[-1])
    return {"elem_per_sec_bf16": d["value"]}


def _guarded():
    """Run the measurement in a subprocess with a hard timeout: this image's
    TPU relay can wedge (all device ops hang indefinitely — see CLAUDE.md);
    a benchmark that hangs is worse than one that reports the failure.

    The inner process prints CUMULATIVE JSON lines (primary first, then
    one per phase); each is re-printed IMMEDIATELY as it arrives — an
    external kill (the driver's own timeout) at any point still leaves
    the most recent cumulative line on stdout. (The buffered version
    printed nothing until the inner completed, so an outer kill lost
    every banked metric.)"""
    import select as _select
    import tempfile

    # the deadline is set BEFORE any startup wait so waiting counts
    # against the budget (round-4 bug: the wait ran first, so a wedged
    # start pushed the whole chain past the driver's outer kill — rc 124)
    guard = int(os.environ.get("DIFFNET_BENCH_TIMEOUT", "3300"))
    t_start = time.monotonic()
    deadline = t_start + guard

    # relay wedged BEFORE the run even starts (observed: outages of
    # 30 min - 9 h that recover by themselves): wait a bounded time for
    # recovery rather than burning the whole guard hanging inside the
    # primary phase with zero metrics banked. Non-JSON progress lines —
    # the driver takes the last JSON line as the result. Default capped
    # at 300 s / <=20% of the guard (VERDICT r4 #1b: 900 s ate a third
    # of the round-4 budget).
    if not os.environ.get("DIFFNET_BENCH_CPU"):
        wait_budget = min(int(os.environ.get("DIFFNET_BENCH_STARTUP_WAIT",
                                             "300")), int(0.2 * guard))
        t_w0 = time.monotonic()
        while (not _probe_relay(45)
               and time.monotonic() - t_w0 < wait_budget):
            print(f"# relay wedged at bench start; waiting for recovery "
                  f"({int(time.monotonic() - t_w0)}s / {wait_budget}s)",
                  flush=True)
            time.sleep(60)

    # tell the inner process how much wall is actually left (its own
    # monotonic clock starts after the jax import, so it cannot know)
    os.environ["DIFFNET_BENCH_INNER_BUDGET"] = str(
        int(deadline - time.monotonic() - 30))
    err_file = tempfile.TemporaryFile()
    # bufsize=0 + raw os.read: select() and the reader see the SAME fd
    # with no Python-level buffer in between, so a complete line can
    # never be stranded in a TextIOWrapper while select() blocks
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--inner"],
        stdout=subprocess.PIPE, stderr=err_file, bufsize=0)
    fd = proc.stdout.fileno()
    last_line = None
    timed_out = False
    buf = b""
    try:
        eof = False
        while not eof:
            left = deadline - time.monotonic()
            if left <= 0:
                timed_out = True
                break
            r, _, _ = _select.select([fd], [], [], min(left, 30))
            if not r:
                if proc.poll() is not None:
                    break
                continue
            chunk = os.read(fd, 65536)
            if not chunk:
                eof = True
            buf += chunk
            while b"\n" in buf:
                raw, buf = buf.split(b"\n", 1)
                line = raw.decode("utf-8", "replace").strip()
                if line.startswith("{"):
                    print(line, flush=True)
                    last_line = line
    finally:
        if proc.poll() is None:
            # EOF can arrive while the inner is still tearing down the
            # jax runtime — give it a moment before calling it hung
            try:
                proc.wait(timeout=min(30, max(1, deadline
                                              - time.monotonic())))
            except subprocess.TimeoutExpired:
                pass
        if proc.poll() is None:
            proc.kill()
            if last_line is not None:
                # re-print the last cumulative snapshot WITH the truncation
                # note, so a consumer taking the final JSON line still gets
                # every banked metric
                try:
                    d = json.loads(last_line)
                    d["note"] = ("bench timed out mid-run (relay wedge?) — "
                                 "this is the last complete snapshot")
                    print(json.dumps(d), flush=True)
                except json.JSONDecodeError:
                    pass
    if last_line is None:
        # distinguish "the inner crashed before printing JSON" (exit code +
        # stderr tail survive) from "the relay wedged and we timed out"
        rc = proc.poll()
        try:
            err_file.seek(0, os.SEEK_END)
            size = err_file.tell()
            err_file.seek(max(0, size - 500))
            err_tail = err_file.read().decode("utf-8", "replace")
        except Exception:
            err_tail = "<stderr unavailable>"
        if timed_out or rc is None:
            msg = ("TPU device hung (relay wedge) — bench timed out; "
                   f"stderr tail: {err_tail!r}")
        else:
            msg = (f"inner bench exited rc={rc} before printing JSON; "
                   f"stderr tail: {err_tail!r}")
        print(json.dumps({
            "metric": "element_residual_evals_per_sec_512sq_poisson",
            "value": 0.0, "unit": "elem/s", "vs_baseline": 0.0,
            "error": msg}))
    err_file.close()


if __name__ == "__main__":
    if os.environ.get("DIFFNET_BENCH_CPU"):
        # hermetic-harness pin honored by EVERY phase (sitecustomize
        # force-registers the axon TPU plugin; only this config update
        # overrides it — CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
    if "--flagship-only" in sys.argv:
        print(json.dumps(_flagship()), flush=True)
    elif "--steps-only" in sys.argv:
        print(json.dumps(_steps_per_sec()), flush=True)
    elif "--steps-fallback-only" in sys.argv:
        print(json.dumps(_steps_fallback()), flush=True)
    elif "--steps-field-only" in sys.argv:
        print(json.dumps(_steps_field_fallback()), flush=True)
    elif "--largegrid-only" in sys.argv:
        print(json.dumps(_largegrid()), flush=True)
    elif "--pallas-probe-only" in sys.argv:
        print(json.dumps(_pallas_probe()), flush=True)
    elif "--stencil-apply-only" in sys.argv:
        print(json.dumps(_stencil_apply_probe()), flush=True)
    elif "--ns-only" in sys.argv:
        print(json.dumps(_ns_throughput()), flush=True)
    elif "--solve-only" in sys.argv:
        print(json.dumps(_solve_time()), flush=True)
    elif "--stencil-only" in sys.argv:
        print(json.dumps(_stencil_throughput()), flush=True)
    elif "--p3d-only" in sys.argv:
        print(json.dumps(_p3d_throughput()), flush=True)
    elif "--serve-only" in sys.argv:
        print(json.dumps(_serve_latency()), flush=True)
    elif "--bf16-only" in sys.argv:
        print(json.dumps(_bf16_primary()), flush=True)
    elif "--l2-only" in sys.argv:
        # accuracy metric — pin CPU BEFORE any jax computation so it
        # completes even when the TPU relay is wedged (sitecustomize
        # force-registers the axon plugin; the config update overrides it)
        import jax

        jax.config.update("jax_platforms", "cpu")
        print(json.dumps(_final_l2()), flush=True)
    elif "--inner" in sys.argv:
        main()
    else:
        _guarded()
