#!/usr/bin/env bash
# Smoke-run every example (counterpart of the reference run*.sh orchestration
# scripts, e.g. examples/poisson/parametric/run-multiple.sh). Small configs;
# pass OUT=dir to redirect outputs.
set -e
cd "$(dirname "$0")/.."
OUT="${OUT:-runs}"

time python examples/poisson_mms_2d.py    --domain-size 32 --max-epochs 40 --out-dir "$OUT"
time python examples/poisson_3d.py        --domain-size 9  --max-epochs 30 --out-dir "$OUT"
time python examples/stokes_mms.py        --domain-size 32 --max-epochs 150 --out-dir "$OUT"
time python examples/ns_ldc.py            --domain-size 32 --max-epochs 100 --out-dir "$OUT"
time python examples/eikonal_reconstruction.py --domain-size 32 --max-epochs 150 --out-dir "$OUT"
time python examples/poisson_ibn_parametric.py -b 16 --n-samples 32 --max-epochs 2 --out-dir "$OUT"
time python examples/klsum_uq.py          --n-train 32 --n-query 64 --max-epochs 3 --out-dir "$OUT"

time python examples/more_physics.py helmholtz --domain-size 32 --max-epochs 60 --out-dir "$OUT"
echo "ALL EXAMPLES OK"
