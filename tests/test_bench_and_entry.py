"""Driver-facing artifacts: bench JSON contract and graft entry points."""

import json
import os
import subprocess
import sys


def test_bench_inner_json_contract():
    """bench.py --inner emits the contracted JSON fields (tiny CPU config)."""
    env = dict(os.environ, DIFFNET_BENCH_SIZE="33", DIFFNET_BENCH_BATCH="1",
               DIFFNET_BENCH_PRIMARY_ONLY="1",
               JAX_PLATFORMS="cpu")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['bench.py','--inner'];"
        "exec(open('bench.py').read())"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=600,
                         cwd=os.path.join(os.path.dirname(__file__), ".."))
    lines = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
    assert lines, out.stdout[-500:] + out.stderr[-500:]
    d = json.loads(lines[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in d
    assert d["value"] > 0 and d["vs_baseline"] > 1.0


import pytest


@pytest.mark.parametrize("flag,key", [
    ("--ns-only", "ns_vms_residual_elem_per_sec_33sq"),
    ("--p3d-only", "poisson3d_elem_per_sec_64cubed"),
    ("--bf16-only", "elem_per_sec_bf16"),
    ("--serve-only", "serve_latency_ms_ibn32_bs1"),
    ("--solve-only", "poisson_varnu_mgcg_solve_ms"),
])
def test_bench_phase_contracts(flag, key):
    """Each supplementary bench phase emits its contracted key (tiny CPU
    config; the 3D phase has a fixed 64^3 size — still CPU-feasible)."""
    env = dict(os.environ, DIFFNET_BENCH_SIZE="33", DIFFNET_BENCH_BATCH="1",
               DIFFNET_BENCH_SOLVE_SIZE="33", JAX_PLATFORMS="cpu")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.argv=['bench.py','{flag}'];"
        "exec(open('bench.py').read())"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=600,
                         cwd=os.path.join(os.path.dirname(__file__), ".."))
    lines = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
    assert lines, out.stdout[-500:] + out.stderr[-500:]
    d = json.loads(lines[-1])
    assert d.get(key, 0) > 0, d


def test_graft_entry_compiles():
    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert float(out) == float(out)  # finite-ish scalar loss
