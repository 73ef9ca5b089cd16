"""Trainer features: round-robin objectives, MultiStepLR, surface traces,
3D winding occupancy."""

import jax
import jax.numpy as jnp
import numpy as np

from diffnet_tpu.core import fem
from diffnet_tpu.core.quadrature import make_basis
from diffnet_tpu.train.trainer import Trainer


def test_round_robin_multi_objective():
    """Alternating per-objective updates (reference optimizer_idx protocol)
    on a toy 2-objective module: both objectives receive updates."""

    class TwoObjective:
        num_objectives = 2
        dataset = None
        batch_size = 1
        learning_rate = 0.1

        class Net:
            def init(self, rng, x):
                return {"a": jnp.ones(()), "b": jnp.ones(())}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def objective_loss(self, idx, params, batch):
            if idx == 0:
                return (params["a"] - 3.0) ** 2
            return (params["b"] + 2.0) ** 2

    module = TwoObjective()
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    ds = InMemoryDataset(np.zeros((1, 1), np.float32),
                         np.zeros((1, 1), np.float32))
    tr = Trainer(max_epochs=200, optimizer="adam", learning_rate=0.1,
                 round_robin=True)
    st = tr.fit(module, NumpyLoader(ds, batch_size=1))
    assert abs(float(st.params["a"]) - 3.0) < 0.1
    assert abs(float(st.params["b"]) + 2.0) < 0.1


def test_multistep_lr_schedule():
    """MultiStepLR milestones shrink the step size (reference
    MultiStepLR(milestones=[10,15,30], gamma=0.1), IBN_2D.py:167)."""

    class Quad:
        dataset = None
        batch_size = 1
        learning_rate = 1.0

        class Net:
            def init(self, rng, x):
                return {"w": jnp.asarray(10.0)}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def training_loss(self, params, batch):
            return params["w"] ** 2

    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    ds = InMemoryDataset(np.zeros((1, 1), np.float32),
                         np.zeros((1, 1), np.float32))
    module = Quad()
    tr = Trainer(max_epochs=40, optimizer="sgd", learning_rate=0.01,
                 lr_milestones=[10], lr_gamma=0.1)
    st = tr.fit(module, NumpyLoader(ds, batch_size=1))
    w_sched = float(st.params["w"])
    tr2 = Trainer(max_epochs=40, optimizer="sgd", learning_rate=0.01)
    st2 = tr2.fit(Quad(), NumpyLoader(ds, batch_size=1))
    w_const = float(st2.params["w"])
    # schedule decays lr after 10 steps -> less progress than constant lr
    assert w_sched > w_const > 0


def test_surface_trace_eval():
    """gp_eval_1d integrates an edge trace exactly for linears."""
    n = 9
    b = make_basis(2, 1, h=(1 / (n - 1), 1 / (n - 1)))
    x = np.linspace(0, 1, n)
    line = jnp.asarray(2 * x + 1, jnp.float32)
    out = fem.gp_eval_1d(line, b, ("N", "dx"))
    assert out["N"].shape == (n - 1, 2)
    # edge integral: sum over gp of gpw * value * (h/2)
    gw = np.polynomial.legendre.leggauss(2)[1]
    total = float(np.sum(np.asarray(out["N"]) * gw[None, :]
                         * (b.h[0] / 2)))
    assert np.isclose(total, 2.0, atol=1e-5)  # ∫(2x+1) over [0,1]
    np.testing.assert_allclose(np.asarray(out["dx"]), 2 * (n - 1) / (n - 1),
                               atol=1e-4)


def test_winding_3d_sphere():
    from diffnet_tpu.core.geometry import winding_number_3d

    # sample a sphere via fibonacci lattice
    N = 600
    i = np.arange(N) + 0.5
    phi = np.arccos(1 - 2 * i / N)
    theta = np.pi * (1 + 5**0.5) * i
    pts = 0.3 * np.stack([np.sin(phi) * np.cos(theta),
                          np.sin(phi) * np.sin(theta),
                          np.cos(phi)], -1) + 0.5
    nrm = (pts - 0.5) / 0.3
    area = np.full(N, 4 * np.pi * 0.3**2 / N)
    q = jnp.asarray([[0.5, 0.5, 0.5], [0.9, 0.9, 0.9], [0.55, 0.5, 0.5]],
                    jnp.float32)
    w = np.asarray(winding_number_3d(
        jnp.asarray(pts, jnp.float32)[None], jnp.asarray(nrm, jnp.float32)[None],
        jnp.asarray(area, jnp.float32)[None], q, chunk=4))[0]
    assert w[0] > 0.9 and w[2] > 0.9 and abs(w[1]) < 0.1


def test_element_matvec_matches_dense():
    """element_matvec reproduces the reference stiffness_vs_values_conv
    pattern: matches assembled dense element-matrix application."""
    n = 9
    deg = 1
    rng = np.random.default_rng(0)
    K = rng.standard_normal((4, 4)).astype(np.float32)
    u = rng.standard_normal((1, n, n)).astype(np.float32)
    R = np.asarray(fem.element_matvec(jnp.asarray(u), K, deg, 2, (n, n)))[0]
    # dense reference
    Rd = np.zeros((n, n))
    for ey in range(n - 1):
        for ex in range(n - 1):
            ue = np.array([u[0, ey, ex], u[0, ey, ex + 1],
                           u[0, ey + 1, ex], u[0, ey + 1, ex + 1]])
            re = K @ ue
            Rd[ey, ex] += re[0]
            Rd[ey, ex + 1] += re[1]
            Rd[ey + 1, ex] += re[2]
            Rd[ey + 1, ex + 1] += re[3]
    np.testing.assert_allclose(R, Rd, atol=1e-5)


def test_validation_loop():
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    class Quad:
        dataset = None
        batch_size = 1
        learning_rate = 0.1

        class Net:
            def init(self, rng, x):
                return {"w": jnp.asarray(3.0)}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def training_loss(self, params, batch):
            return params["w"] ** 2

    ds = InMemoryDataset(np.zeros((1, 1), np.float32),
                         np.zeros((1, 1), np.float32))
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        tr = Trainer(max_epochs=3, optimizer="sgd", learning_rate=0.1,
                     run_dir=d)
        tr.fit(Quad(), NumpyLoader(ds, 1), val_dataloader=NumpyLoader(ds, 1))
        header = open(os.path.join(d, "metrics.csv")).readline()
        assert "val_loss" in header


def test_review_fix_regressions():
    """Pins for the round-1 code-review fixes."""
    import argparse
    import jax.numpy as jnp
    from diffnet_tpu.config import RunConfig, add_config_args, config_from_args
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    # config bools controllable both ways
    p = add_config_args(argparse.ArgumentParser())
    cfg = config_from_args(p.parse_args(["--no-checkpoint"]))
    assert cfg.checkpoint is False
    cfg2 = config_from_args(p.parse_args([]))
    assert cfg2.checkpoint is True

    # empty loader -> clear error, not StopIteration
    class M:
        dataset = None
        batch_size = 4
        learning_rate = 0.1

        def training_loss(self, p, b):
            return jnp.zeros(())

        def init_params(self, rng, b):
            return {}

    ds = InMemoryDataset(np.zeros((2, 1), np.float32),
                         np.zeros((2, 1), np.float32))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="zero batches"):
        Trainer(max_epochs=1).fit(M(), NumpyLoader(ds, batch_size=8))

    # gp_coords honors lengths
    b = make_basis(2, 1, h=(0.1, 0.1))
    xg1, _ = fem.gp_coords(b, (11, 11))
    xg2, _ = fem.gp_coords(b, (11, 11), lengths=(2.0, 2.0))
    assert abs(xg1.max() - 1.0) < 0.1 and abs(xg2.max() - 2.0) < 0.2


def test_fdm_5pt_loss_runs():
    """stencil_len=5 FDM Poisson no longer crashes (review fix)."""
    from diffnet_tpu.data.single_instances import RectangleManufactured
    from diffnet_tpu.models.field import DirectField
    from diffnet_tpu.pde.poisson import PoissonFDM2D

    n = 16
    ds = RectangleManufactured(domain_size=n)
    net = DirectField((n, n))
    m = PoissonFDM2D(net, ds, domain_size=n, batch_size=1, stencil_len=5)
    batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
    val = m.training_loss(net.init(None), batch)
    assert np.isfinite(float(val))


def test_round_robin_lbfgs():
    """round_robin + lbfgs works (review fix)."""
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    class TwoObj:
        num_objectives = 2
        dataset = None
        batch_size = 1
        learning_rate = 1.0

        class Net:
            def init(self, rng, x):
                return {"a": jnp.ones(()), "b": jnp.ones(())}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def objective_loss(self, idx, params, batch):
            return ((params["a"] - 3.0) ** 2 if idx == 0
                    else (params["b"] + 2.0) ** 2)

    ds = InMemoryDataset(np.zeros((1, 1), np.float32),
                         np.zeros((1, 1), np.float32))
    tr = Trainer(max_epochs=8, optimizer="lbfgs", lbfgs_max_iter=5,
                 round_robin=True)
    st = tr.fit(TwoObj(), NumpyLoader(ds, batch_size=1))
    assert abs(float(st.params["a"]) - 3.0) < 1e-3
    assert abs(float(st.params["b"]) + 2.0) < 1e-3


def test_remat_training_loss_identical():
    """remat=True gives identical loss/gradients (just recomputed)."""
    from diffnet_tpu.data.single_instances import RectangleManufactured
    from diffnet_tpu.models.field import DirectField
    from diffnet_tpu.pde.poisson import Poisson2D

    n = 16
    ds = RectangleManufactured(domain_size=n)
    net = DirectField((n, n))
    base_kw = dict(domain_size=n, batch_size=1, loss_type="resmin")
    m1 = Poisson2D(net, ds, **base_kw)
    m2 = Poisson2D(net, ds, remat=True, **base_kw)
    batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
    p = net.init(None)
    l1, g1 = jax.value_and_grad(m1.training_loss)(p, batch)
    l2, g2 = jax.value_and_grad(m2.training_loss)(p, batch)
    assert float(l1) == float(l2)
    np.testing.assert_array_equal(np.asarray(g1["field"]),
                                  np.asarray(g2["field"]))


def test_loader_prefetch_equivalent():
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    ds = InMemoryDataset(np.arange(40, dtype=np.float32).reshape(10, 4),
                         np.zeros((10, 1), np.float32))
    plain = list(NumpyLoader(ds, batch_size=3, shuffle=True, seed=5))
    pre = list(NumpyLoader(ds, batch_size=3, shuffle=True, seed=5,
                           prefetch=2))
    assert len(plain) == len(pre) == 3
    for (a, _), (b, _) in zip(plain, pre):
        np.testing.assert_array_equal(a, b)


def test_full_state_checkpoint_resume(tmp_path):
    """Resume from state.ckpt continues the optimizer exactly: a run split
    into two resumed halves lands bitwise-identical to an unbroken run."""
    import os
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader
    from diffnet_tpu.train.trainer import load_state, save_state

    class Quad:
        dataset = None
        batch_size = 1
        learning_rate = 0.1

        class Net:
            def init(self, rng, x):
                return {"w": jnp.asarray(5.0)}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def training_loss(self, params, batch):
            return params["w"] ** 2

    ds = InMemoryDataset(np.zeros((1, 1), np.float32),
                         np.zeros((1, 1), np.float32))
    d = str(tmp_path)
    # unbroken 10-epoch run
    tr_a = Trainer(max_epochs=10, optimizer="adam", learning_rate=0.1)
    st_a = tr_a.fit(Quad(), NumpyLoader(ds, 1))
    # 5 epochs + resume 5 epochs
    tr_b1 = Trainer(max_epochs=5, optimizer="adam", learning_rate=0.1,
                    run_dir=d, checkpoint=True)
    tr_b1.fit(Quad(), NumpyLoader(ds, 1))
    tr_b2 = Trainer(max_epochs=5, optimizer="adam", learning_rate=0.1)
    st_b = tr_b2.fit(Quad(), NumpyLoader(ds, 1),
                     resume_from=os.path.join(d, "state.ckpt"))
    np.testing.assert_array_equal(np.asarray(st_a.params["w"]),
                                  np.asarray(st_b.params["w"]))
    assert int(st_b.step) == 10


def test_nan_guard(tmp_path):
    """Divergence detection: non-finite loss with no checkpoint -> clear
    error; with checkpointing -> restore and bounded retries."""
    import pytest as _pytest
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    class Exploder:
        dataset = None
        batch_size = 1
        learning_rate = 1e30

        class Net:
            def init(self, rng, x):
                return {"w": jnp.asarray(2.0)}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def training_loss(self, params, batch):
            return jnp.exp(params["w"] ** 2)  # overflows after big steps

    ds = InMemoryDataset(np.zeros((1, 1), np.float32),
                         np.zeros((1, 1), np.float32))
    with _pytest.raises(RuntimeError, match="nan_guard"):
        Trainer(max_epochs=20, optimizer="sgd", learning_rate=1e30,
                nan_guard=True).fit(Exploder(), NumpyLoader(ds, 1))


def test_profiler_trace_written(tmp_path):
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    class Quad:
        dataset = None
        batch_size = 1
        learning_rate = 0.1

        class Net:
            def init(self, rng, x):
                return {"w": jnp.asarray(1.0)}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def training_loss(self, params, batch):
            return params["w"] ** 2

    ds = InMemoryDataset(np.zeros((1, 1), np.float32),
                         np.zeros((1, 1), np.float32))
    d = str(tmp_path / "trace")
    Trainer(max_epochs=2, optimizer="sgd", learning_rate=0.1,
            profile_dir=d).fit(Quad(), NumpyLoader(ds, 1))
    import os
    found = []
    for root, _, files in os.walk(d):
        found += files
    assert found, "no profiler trace files written"


def test_orbax_state_roundtrip(tmp_path):
    import optax
    from diffnet_tpu.train.trainer import (TrainState, load_state_orbax,
                                           save_state_orbax)

    params = {"w": jnp.asarray([1.0, 2.0]), "b": jnp.asarray(3.0)}
    opt = optax.adam(1e-3)
    st = TrainState(params, opt.init(params), jnp.asarray(7, jnp.int32))
    p = str(tmp_path / "ckpt")
    save_state_orbax(st, p)
    st2 = load_state_orbax(
        TrainState(jax.tree.map(jnp.zeros_like, params),
                   opt.init(jax.tree.map(jnp.zeros_like, params)),
                   jnp.asarray(0, jnp.int32)), p)
    np.testing.assert_array_equal(np.asarray(st2.params["w"]), [1.0, 2.0])
    assert int(st2.step) == 7


def test_inp_config_parser(tmp_path):
    """Reference-style .inp configs load into RunConfig (conf_e8_2d.inp
    format, parsed without the libconf dependency)."""
    from diffnet_tpu.config import config_from_inp

    p = tmp_path / "conf.inp"
    p.write_text('domain_size = 32;\nmax_epochs = 500;\nLR = 0.001;\n'
                 'loss_type = "resmin";\noptimizer = "lbfgs";\n')
    cfg = config_from_inp(str(p))
    assert cfg.domain_size == 32
    assert cfg.max_epochs == 500
    assert abs(cfg.learning_rate - 1e-3) < 1e-12
    assert cfg.loss_type == "resmin" and cfg.optimizer == "lbfgs"


def test_coarse_to_fine_continuation():
    """Nested iteration beats a cold fine-grid solve at equal budget
    (Poisson MMS: 9^2 -> 17^2 -> 33^2)."""
    import math
    from diffnet_tpu.data.single_instances import RectangleManufactured
    from diffnet_tpu.models.field import DirectField
    from diffnet_tpu.pde.poisson import Poisson2D
    from diffnet_tpu.train.continuation import coarse_to_fine

    exact = lambda x, y: np.sin(math.pi * x) * np.sin(math.pi * y)
    forcing = lambda x, y: 2 * math.pi**2 * np.sin(math.pi * x) * np.sin(
        math.pi * y)

    def factory(n):
        ds = RectangleManufactured(domain_size=n)
        ds.n_samples = 1
        net = DirectField((n, n), init=np.zeros((n, n)))
        m = Poisson2D(net, ds, domain_size=n, batch_size=1,
                      loss_type="resmin", exact_solution=exact,
                      forcing=forcing, mms_dirichlet=True)
        return m, net

    # node-ALIGNED prolongation: a 2x refinement injects coarse values
    # exactly at even fine nodes (jax.image.resize's pixel-center alignment
    # was a half-cell shift on nodal grids — regression)
    from diffnet_tpu.train.continuation import prolong_field

    rng = np.random.default_rng(0)
    c = rng.standard_normal((9, 9)).astype(np.float32)
    f = np.asarray(prolong_field(jnp.asarray(c), (17, 17)))
    np.testing.assert_allclose(f[::2, ::2], c, atol=1e-6)

    module, state = coarse_to_fine(factory, grids=[9, 17, 33],
                                   epochs=[20, 15, 2])
    u = module.network.apply(state.params)[0]
    eL2, _, uex = module.calc_l2_err(u)
    rel = float(eL2 / uex)
    # reaches the 33^2 discretization limit (~8e-4) with only TWO fine-grid
    # epochs thanks to the prolonged warm start
    assert rel < 1.5e-3, rel


def test_round_robin_per_objective_opt_state_and_scoping():
    """Round-robin keeps one opt_state PER objective and, when the module
    scopes objectives via objective_param_mask, each objective's step updates
    ONLY its own params (reference: one Adam per field network,
    e1_ns_ldc_resmin.py:335-339)."""
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    class Scoped:
        num_objectives = 2
        dataset = None
        batch_size = 1
        learning_rate = 0.1

        class Net:
            def init(self, rng, x):
                return {"field_0": jnp.ones(()), "field_1": jnp.ones(())}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def objective_loss(self, idx, params, batch):
            # each loss depends on BOTH params; scoping must still keep the
            # other field frozen during this objective's step
            both = params["field_0"] + 0.1 * params["field_1"]
            return (both - (3.0 if idx == 0 else -2.0)) ** 2

        def objective_param_mask(self, idx, params):
            key = f"field_{idx}"
            return {k: k == key for k in params}

    ds = InMemoryDataset(np.zeros((1, 1), np.float32),
                         np.zeros((1, 1), np.float32))
    tr = Trainer(max_epochs=1, optimizer="adam", learning_rate=0.1,
                 round_robin=True)
    st = tr.fit(Scoped(), NumpyLoader(ds, batch_size=1))
    # one epoch = one batch = one step = objective 0 only
    assert isinstance(st.opt_state, tuple) and len(st.opt_state) == 2
    assert float(st.params["field_0"]) != 1.0   # objective 0 moved its field
    assert float(st.params["field_1"]) == 1.0   # field_1 frozen this step


def test_round_robin_no_per_step_host_sync():
    """The per-objective loss bookkeeping keeps device arrays (no float()
    in the step path) and only the LAST value per objective."""
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    class TwoObj:
        num_objectives = 2
        dataset = None
        batch_size = 1
        learning_rate = 0.1

        class Net:
            def init(self, rng, x):
                return {"a": jnp.ones(())}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def objective_loss(self, idx, params, batch):
            return (params["a"] - idx) ** 2

    ds = InMemoryDataset(np.zeros((4, 1), np.float32),
                         np.zeros((4, 1), np.float32))
    tr = Trainer(max_epochs=3, optimizer="adam", round_robin=True)
    tr.fit(TwoObj(), NumpyLoader(ds, batch_size=1))
    assert len(tr._last_obj_loss) == 2
    for v in tr._last_obj_loss:
        assert isinstance(v, jax.Array)  # stayed on device


def test_csv_logger_extends_fieldnames(tmp_path):
    """Metric keys appearing after the first epoch are added to the header
    instead of silently dropped (ADVICE r1)."""
    import csv as _csv

    from diffnet_tpu.train.trainer import CSVLogger

    lg = CSVLogger(str(tmp_path))
    lg.log({"epoch": 0, "loss": 1.0})
    lg.log({"epoch": 1, "loss": 0.5, "val_loss": 0.7})
    with open(lg.path) as f:
        rows = list(_csv.DictReader(f))
    assert "val_loss" in rows[1] and rows[1]["val_loss"] == "0.7"
    assert rows[0]["val_loss"] == ""  # back-filled empty for earlier epochs


def test_round_robin_optimizer_list():
    """A LIST of optimizers — one per objective — mirrors the reference's
    configure_optimizers returning [opt_u, opt_v, ...] (e1_ns_ldc_resmin.py:
    335-339); mixing adam and lbfgs across objectives works."""
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    class TwoObj:
        num_objectives = 2
        dataset = None
        batch_size = 1
        learning_rate = 0.2

        class Net:
            def init(self, rng, x):
                return {"a": jnp.ones(()), "b": jnp.ones(())}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def objective_loss(self, idx, params, batch):
            return ((params["a"] - 3.0) ** 2 if idx == 0
                    else (params["b"] + 2.0) ** 2)

    ds = InMemoryDataset(np.zeros((2, 1), np.float32),
                         np.zeros((2, 1), np.float32))
    tr = Trainer(max_epochs=40, optimizer=["adam", "lbfgs"],
                 learning_rate=0.2, lbfgs_max_iter=5, round_robin=True)
    st = tr.fit(TwoObj(), NumpyLoader(ds, batch_size=1))
    assert abs(float(st.params["b"]) + 2.0) < 1e-3   # lbfgs objective: exact
    assert abs(float(st.params["a"]) - 3.0) < 0.5    # adam objective: moving
    import pytest
    with pytest.raises(ValueError):
        Trainer(optimizer=["adam", "adam"]).fit(TwoObj(),
                                                NumpyLoader(ds, batch_size=1))


def test_steps_per_call_scan_matches_single_steps():
    """steps_per_call=K (K batches per jitted lax.scan dispatch) is
    mathematically identical to K single adam steps, including a remainder
    chunk (6 batches with K=4 -> chunks of 4 and 2)."""
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader
    from diffnet_tpu.models.field import DirectField
    from diffnet_tpu.pde.poisson import Poisson2D

    n = 17
    rng = np.random.default_rng(0)
    inputs = np.stack([
        np.stack([np.ones((n, n)),
                  np.zeros((n, n)),
                  _boundary(n)], -1)
        for _ in range(6)]).astype(np.float32)
    forcing = rng.random((6, n, n, 1)).astype(np.float32)
    ds = InMemoryDataset(inputs, forcing)

    def solve(k):
        m = Poisson2D(DirectField((n, n), init=np.zeros((n, n))),
                      domain_size=n, batch_size=2, loss_type="energy")
        tr = Trainer(max_epochs=3, optimizer="adam", learning_rate=1e-2,
                     steps_per_call=k, seed=0)
        st = tr.fit(m, NumpyLoader(ds, batch_size=2, shuffle=False))
        return np.asarray(st.params["field"])

    u1 = solve(1)
    u4 = solve(4)  # 3 steps/epoch -> chunks of 3 (remainder path) each epoch
    np.testing.assert_allclose(u1, u4, atol=1e-6)
    u2 = solve(2)
    np.testing.assert_allclose(u1, u2, atol=1e-6)

    # ragged final batch (drop_last=False: batches of 4 and 2) must flush
    # the pending full batches instead of stacking mismatched shapes
    def solve_ragged(k, bs=4):
        m = Poisson2D(DirectField((n, n), init=np.zeros((n, n))),
                      domain_size=n, batch_size=bs, loss_type="energy")
        tr = Trainer(max_epochs=2, optimizer="adam", learning_rate=1e-2,
                     steps_per_call=k, seed=0)
        st = tr.fit(m, NumpyLoader(ds, batch_size=bs, shuffle=False,
                                   drop_last=False))
        return np.asarray(st.params["field"])

    np.testing.assert_allclose(solve_ragged(1), solve_ragged(2), atol=1e-6)


def test_step_cache_invalidated_on_module_mutation():
    """Reassigning a module attribute between fit() calls on the same
    Trainer must rebuild the jitted step (the old closure has the stale
    value baked in as a jit constant)."""
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader
    from diffnet_tpu.models.field import DirectField
    from diffnet_tpu.pde.advection import AdvDiff2D

    n = 9
    inputs = np.stack([np.ones((n, n)), np.zeros((n, n)),
                       _boundary(n)], -1).astype(np.float32)[None]
    forcing = np.zeros((n, n, 1), np.float32)[None]
    ds = InMemoryDataset(inputs, forcing)

    def run(two_trainers):
        m = AdvDiff2D(DirectField((n, n), init=np.zeros((n, n))),
                      adv=(1.0, 0.0), diffusivity=1e-2, domain_size=n,
                      batch_size=1, bc1_value=0.0,
                      forcing=lambda x, y: np.ones_like(x))
        tr = Trainer(max_epochs=5, optimizer="adam", learning_rate=1e-2,
                     seed=0)
        st = tr.fit(m, NumpyLoader(ds, 1, shuffle=False))
        m.f_gp = 5.0 * np.asarray(m.f_gp)   # mutate a jit-baked constant
        tr2 = Trainer(max_epochs=5, optimizer="adam", learning_rate=1e-2,
                      seed=0) if two_trainers else tr
        st = tr2.fit(m, NumpyLoader(ds, 1, shuffle=False),
                     params=st.params)
        return np.asarray(st.params["field"])

    np.testing.assert_allclose(run(False), run(True), atol=1e-6)


def _boundary(n):
    b = np.zeros((n, n))
    b[[0, -1], :] = 1.0
    b[:, [0, -1]] = 1.0
    return b


def test_round_robin_lbfgs_respects_param_mask():
    """A scoped lbfgs objective must not move the other objectives' params:
    objective 1's loss pulls 'a' toward 10 but its mask scopes it to 'b',
    so 'a' must still converge to objective 0's target 3."""
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    class TwoObj:
        num_objectives = 2
        dataset = None
        batch_size = 1
        learning_rate = 0.2

        class Net:
            def init(self, rng, x):
                return {"a": jnp.ones(()), "b": jnp.ones(())}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def objective_loss(self, idx, params, batch):
            if idx == 0:
                return (params["a"] - 3.0) ** 2
            return (params["a"] - 10.0) ** 2 + (params["b"] + 2.0) ** 2

        def objective_param_mask(self, idx, params):
            tgt = "a" if idx == 0 else "b"
            return {k: k == tgt for k in params}

    ds = InMemoryDataset(np.zeros((2, 1), np.float32),
                         np.zeros((2, 1), np.float32))
    tr = Trainer(max_epochs=30, optimizer="lbfgs", lbfgs_max_iter=5,
                 round_robin=True)
    st = tr.fit(TwoObj(), NumpyLoader(ds, batch_size=1))
    assert abs(float(st.params["a"]) - 3.0) < 1e-3, float(st.params["a"])
    assert abs(float(st.params["b"]) + 2.0) < 1e-3, float(st.params["b"])


def test_round_robin_resume_continues_rotation(tmp_path):
    """resume_from must continue the objective rotation at state.step, not
    restart at objective 0 (exact-resume contract with n_batches % n_obj
    != 0)."""
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    seen = []

    class TwoObj:
        num_objectives = 2
        dataset = None
        batch_size = 1
        learning_rate = 0.1

        class Net:
            def init(self, rng, x):
                return {"a": jnp.ones(())}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def objective_loss(self, idx, params, batch):
            seen.append(idx)
            return (params["a"] - idx) ** 2

    # 3 batches, 2 objectives: epoch 0 rotation = 0,1,0
    ds = InMemoryDataset(np.zeros((3, 1), np.float32),
                         np.zeros((3, 1), np.float32))
    run_dir = str(tmp_path)
    tr = Trainer(max_epochs=1, optimizer="adam", round_robin=True,
                 run_dir=run_dir, checkpoint=True)
    tr.fit(TwoObj(), NumpyLoader(ds, batch_size=1, shuffle=False))
    seen.clear()
    tr2 = Trainer(max_epochs=1, optimizer="adam", round_robin=True)
    tr2.fit(TwoObj(), NumpyLoader(ds, batch_size=1, shuffle=False),
            resume_from=f"{run_dir}/state.ckpt")
    # resumed run saw 3 steps already -> rotation continues 1,0,1
    # (objective_loss traces once per objective step fn; the rotation is
    # observable through which step fn ran first — assert via the traced
    # order of FIRST compile calls)
    assert seen[0] == 1, seen


def test_optimizer_switch_adam_to_lbfgs():
    """Mid-training Adam->LBFGS swap (reference OptimSwitchLBFGS callback,
    e1_ns_ldc_resmin.py:34-51): params carry over, the new optimizer takes
    over exactly at switch_epoch, and LBFGS finishes the quadratic to a
    tolerance Adam-at-lr=0.01 could not reach in the same budget."""
    from diffnet_tpu.train.trainer import OptimizerSwitch

    class Quad:
        dataset = None
        batch_size = 1
        learning_rate = 0.01

        class Net:
            def init(self, rng, x):
                return {"w": jnp.asarray(10.0)}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def training_loss(self, params, batch):
            return params["w"] ** 2

    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    ds = InMemoryDataset(np.zeros((1, 1), np.float32),
                         np.zeros((1, 1), np.float32))
    tr = Trainer(max_epochs=10, optimizer="adam", learning_rate=0.01,
                 lbfgs_max_iter=5,
                 callbacks=[OptimizerSwitch(epoch=3, optimizer="lbfgs",
                                            lbfgs_max_iter=10)])
    st = tr.fit(Quad(), NumpyLoader(ds, batch_size=1))
    assert tr.optimizer_spec == "lbfgs"        # switch was applied
    assert tr.lbfgs_max_iter == 10
    assert abs(float(st.params["w"])) < 1e-3   # lbfgs solved the quadratic
    # pure adam at the same budget cannot get close (step size 0.01)
    tr2 = Trainer(max_epochs=10, optimizer="adam", learning_rate=0.01)
    st2 = tr2.fit(Quad(), NumpyLoader(ds, batch_size=1))
    assert abs(float(st2.params["w"])) > 1.0


def test_optimizer_switch_round_robin_list():
    """Round-robin switch to a per-objective optimizer LIST (the reference
    swaps in [LBFGS(u), LBFGS(v), Adam(p)], e1_ns_ldc_resmin.py:40-49)."""
    from diffnet_tpu.train.trainer import OptimizerSwitch

    class TwoObjective:
        num_objectives = 2
        dataset = None
        batch_size = 1
        learning_rate = 0.05

        class Net:
            def init(self, rng, x):
                return {"a": jnp.ones(()), "b": jnp.ones(())}

            def apply(self, params, x):
                return params

        network = Net()

        def init_params(self, rng, batch):
            return self.network.init(rng, None)

        def objective_loss(self, idx, params, batch):
            if idx == 0:
                return (params["a"] - 3.0) ** 2
            return (params["b"] + 2.0) ** 2

    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    ds = InMemoryDataset(np.zeros((2, 1), np.float32),
                         np.zeros((2, 1), np.float32))
    tr = Trainer(max_epochs=30, optimizer="adam", learning_rate=0.05,
                 round_robin=True, lbfgs_max_iter=5,
                 callbacks=[OptimizerSwitch(epoch=5,
                                            optimizer=["lbfgs", "adam"])])
    st = tr.fit(TwoObjective(), NumpyLoader(ds, batch_size=1))
    # lbfgs objective converges tight; adam objective keeps improving
    # (one adam step per epoch at lr=0.05: from 1.0 well past 0 toward -2)
    assert abs(float(st.params["a"]) - 3.0) < 1e-3
    assert float(st.params["b"]) < -0.2
