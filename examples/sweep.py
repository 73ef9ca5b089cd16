"""Multi-run sweep + statistics driver — the config-driven replacement for
the reference's sed-editing shell loops (examples/poisson/parametric/
run-multiple.sh:17-19 sweeps a sample_size by rewriting source lines;
run-mean-sdev.sh re-walks version dirs to aggregate). One command runs the
sweep, writes versioned run dirs, and produces an aggregate CSV + plot and
cross-run mean/sdev artifacts.

    # the reference's KL-sum sample-size sweep (4096..65536 at full scale)
    python examples/sweep.py --physics klsum --param n_train \
        --values 128,256,512 --max-epochs 5

    # grid-convergence sweep on the Poisson MMS workload
    python examples/sweep.py --physics poisson-mms --param domain_size \
        --values 17,33,65 --max-epochs 60
"""

import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_klsum(value, param, args, run_dir):
    """KL-sum stochastic Poisson training + UQ query (reference
    2_klsum_fem.py workload swept by run-multiple.sh)."""
    from diffnet_tpu.data import NumpyLoader
    from diffnet_tpu.data.gen_input import sobol_coefficients
    from diffnet_tpu.data.parametric import KLSumStochastic
    from diffnet_tpu.models import GoodNetwork
    from diffnet_tpu.pde import Poisson2D
    from diffnet_tpu.train import Trainer, query_statistical

    cfg = {"n_train": args.n_train, "domain_size": args.domain_size,
           "batch_size": args.batch_size, "max_epochs": args.max_epochs,
           param: value}
    n = int(cfg["domain_size"])
    bs = min(int(cfg["batch_size"]), int(cfg["n_train"]))
    train_ds = KLSumStochastic(
        sobol_coefficients(int(cfg["n_train"]), dim=6, seed=0),
        domain_size=n)
    module = Poisson2D(
        GoodNetwork(in_dim=n, out_dim=n, out_channels=1, filters=8),
        train_ds, domain_size=n, batch_size=bs, loss_type="energy",
        bc1_value=1.0, bc2_value=0.0)
    tr = Trainer(max_epochs=int(cfg["max_epochs"]), optimizer="adam",
                 learning_rate=3e-4, run_dir=run_dir, checkpoint=True)
    state = tr.fit(module, NumpyLoader(train_ds, bs, shuffle=True))
    query_ds = KLSumStochastic(
        sobol_coefficients(int(cfg["n_train"]), dim=6, seed=1),
        domain_size=n)
    mean, sdev, _ = query_statistical(module, state.params, query_ds,
                                      batch_size=bs, out_dir=run_dir)
    loss = _final_loss(run_dir)
    return {"final_loss": loss, "mean_mid": float(mean[n // 2, n // 2]),
            "sdev_max": float(sdev.max())}, mean, sdev


def run_poisson_mms(value, param, args, run_dir):
    """Poisson 2D MMS resmin direct solve, final rel-L2 (reference
    e2_manufactured_resmin.py acceptance metric)."""
    from diffnet_tpu.data.single_instances import RectangleManufactured
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import Poisson2D
    from diffnet_tpu.train import Trainer

    cfg = {"domain_size": args.domain_size,
           "max_epochs": args.max_epochs, param: value}
    n = int(cfg["domain_size"])
    exact = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)
    forcing = lambda x, y: 2 * np.pi**2 * np.sin(np.pi * x) * np.sin(
        np.pi * y)
    ds = RectangleManufactured(domain_size=n)
    ds.n_samples = 1
    m = Poisson2D(DirectField((n, n), init=np.zeros((n, n))), ds,
                  domain_size=n, batch_size=1, loss_type="resmin",
                  exact_solution=exact, forcing=forcing, mms_dirichlet=True)
    st = Trainer(max_epochs=int(cfg["max_epochs"]), optimizer="lbfgs",
                 lbfgs_max_iter=10, run_dir=run_dir, checkpoint=True).fit(m)
    u = m.network.apply(st.params)[0]
    eL2, _, uex = m.calc_l2_err(u)
    field = np.asarray(u)
    return {"final_loss": _final_loss(run_dir),
            "rel_l2": float(eL2 / uex)}, field, np.zeros_like(field)


def _final_loss(run_dir):
    with open(os.path.join(run_dir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    return float(rows[-1]["loss"]) if rows else float("nan")


WORKLOADS = {"klsum": run_klsum, "poisson-mms": run_poisson_mms}
# config fields each workload actually reads back out of cfg — a swept
# --param outside this set would silently produce identical runs
SWEEPABLE = {"klsum": {"n_train", "domain_size", "batch_size",
                       "max_epochs"},
             "poisson-mms": {"domain_size", "max_epochs"}}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--physics", choices=sorted(WORKLOADS), default="klsum")
    p.add_argument("--param", default="n_train",
                   help="config field to sweep (e.g. n_train, domain_size)")
    p.add_argument("--values", required=True,
                   help="comma-separated sweep values")
    p.add_argument("--repeats", type=int, default=1,
                   help="independent repeats per value (seeds the "
                        "mean/sdev-across-runs statistics)")
    p.add_argument("--domain-size", type=int, default=32)
    p.add_argument("--n-train", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-epochs", type=int, default=5)
    p.add_argument("--out-dir", default="runs")
    args = p.parse_args()

    from diffnet_tpu.train import make_run_dir

    if args.param not in SWEEPABLE[args.physics]:
        p.error(f"--param {args.param!r} is not swept by "
                f"{args.physics!r}; choose from "
                f"{sorted(SWEEPABLE[args.physics])}")
    values = [int(v) for v in args.values.split(",")]
    sweep_name = f"sweep-{args.physics}-{args.param}"
    sweep_dir = make_run_dir(args.out_dir, sweep_name)
    rows, fields = [], []
    for value in values:
        for rep in range(args.repeats):
            run_dir = os.path.join(sweep_dir, f"{args.param}_{value}",
                                   f"version_{rep}")
            os.makedirs(run_dir, exist_ok=True)
            t0 = time.perf_counter()
            metrics, mean, sdev = WORKLOADS[args.physics](
                value, args.param, args, run_dir)
            wall = time.perf_counter() - t0
            row = {args.param: value, "repeat": rep,
                   "wall_sec": round(wall, 3), **metrics}
            rows.append(row)
            fields.append(mean)
            if args.physics == "poisson-mms":
                # klsum already saved q_mean/q_sdev via query_statistical;
                # the raw field gets a non-misleading name
                np.save(os.path.join(run_dir, "field.npy"), mean)
            print(json.dumps(row))

    # aggregate CSV (the run-mean-sdev.sh equivalent, minus the sed)
    agg_path = os.path.join(sweep_dir, "sweep.csv")
    with open(agg_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    # cross-run statistics of the mean fields (per sweep value)
    per_value = {}
    for row, field in zip(rows, fields):
        per_value.setdefault(row[args.param], []).append(field)
    stats = {v: {"mean_of_means": float(np.mean(fs)),
                 "sdev_across_runs": float(np.std([np.mean(f) for f in fs]))}
             for v, fs in per_value.items()}
    with open(os.path.join(sweep_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)

    try:  # aggregate plot (metric vs sweep value)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        metric = "rel_l2" if "rel_l2" in rows[0] else "final_loss"
        # aggregate per sweep value (repeats would zigzag an 'o-' line)
        byv = {}
        for r in rows:
            byv.setdefault(r[args.param], []).append(r[metric])
        xs = sorted(byv)
        ys = [float(np.mean(byv[v])) for v in xs]
        fig, ax = plt.subplots(figsize=(5, 3.2))
        ax.loglog(xs, ys, "o-")
        ax.set_xlabel(args.param)
        ax.set_ylabel(metric)
        ax.grid(True, which="both", alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(sweep_dir, "sweep.png"), dpi=120)
        plt.close(fig)
    except Exception as e:  # plotting is best-effort
        print(f"plot skipped: {e}")

    print(f"sweep_dir: {sweep_dir}  ({len(rows)} runs -> sweep.csv, "
          f"stats.json, sweep.png)")


if __name__ == "__main__":
    main()
