#!/usr/bin/env bash
# Smoke-run EVERY example CLI (counterpart of the reference run*.sh
# orchestration scripts, e.g. examples/poisson/parametric/run-multiple.sh).
# Small configs; pass OUT=dir to redirect outputs.
#
# QUICK=1 runs a representative subset (one CLI per family, ~10 min on a
# 1-core box) — full sweep is ~1 h there.
set -e
cd "$(dirname "$0")/.."
OUT="${OUT:-runs}"

time python examples/poisson_mms_2d.py    --domain-size 32 --max-epochs 40 --out-dir "$OUT"
time python examples/ns_ldc.py            --domain-size 33 --solver newton --out-dir "$OUT"
time python examples/eikonal_reconstruction.py --domain-size 32 --max-epochs 150 --out-dir "$OUT"
time python examples/poisson_ibn_parametric.py -b 16 --n-samples 32 --max-epochs 2 --out-dir "$OUT"
time python examples/more_physics.py helmholtz --domain-size 32 --max-epochs 60 --out-dir "$OUT"
time python examples/multichip_scaling.py --devices 8 --data 4 --space 2 --domain-size 32 --batch-size 8 --steps 5

if [ -n "${QUICK:-}" ]; then
  echo "QUICK EXAMPLES OK (subset; unset QUICK for the full sweep)"
  exit 0
fi

time python examples/poisson_3d.py        --domain-size 9  --max-epochs 30 --out-dir "$OUT"
time python examples/stokes_mms.py        --domain-size 32 --max-epochs 150 --out-dir "$OUT"
time python examples/stokes_mms.py        --domain-size 33 --solver gmres --out-dir "$OUT"
time python examples/ns_ldc.py            --domain-size 32 --max-epochs 100 --out-dir "$OUT"
time python examples/eikonal_reconstruction.py --nsd 3 --domain-size 17 --max-epochs 60 --out-dir "$OUT"
time python examples/ibn_3d.py            --domain-size 16 --batch-size 4 --n-samples 8 --max-epochs 2 --out-dir "$OUT"
time python examples/klsum_uq.py          --n-train 32 --n-query 64 --max-epochs 3 --out-dir "$OUT"
QDIR=$(ls -d "$OUT"/klsum/version_* | sort -V | tail -1)  # latest run
time python examples/query_run.py         "$QDIR" --n-query 64

for PHYS in advdiff allen-cahn burgers fsdt topopt; do
  time python examples/more_physics.py "$PHYS" --domain-size 32 --max-epochs 60 --out-dir "$OUT"
done

time python examples/ns_fpc_parametric.py --max-epochs 2 --n-samples 4 --batch-size 2 --width 64 --height 32 --out-dir "$OUT"
time python examples/eikonal_airfoil.py   --domain-size 32 --max-epochs 60 --out-dir "$OUT"
time python examples/ns_fps.py            --eq stokes --re 1 --h 0.5 --out-dir "$OUT"
time python examples/eikonal_parametric.py --net immdiff --n-train 3 --n-test 1 --domain-size 32 --n-points 48 --max-epochs 20 --out-dir "$OUT"
time python examples/sweep.py --physics klsum --param n_train --values 8,16 --domain-size 16 --max-epochs 2 --out-dir "$OUT"
echo "ALL EXAMPLES OK"
