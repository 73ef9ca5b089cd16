"""NS flow past an embedded object (the parametric FPC/airfoil workload,
reference e2_ns_fpc_embedded_airfoil.py) with a synthetic obstacle."""

import jax.numpy as jnp
import numpy as np

from diffnet_tpu.data.flow import FlowPastObjectDataset
from diffnet_tpu.pde.flow import NavierStokes
from diffnet_tpu.train.trainer import Trainer


class TripleField:
    def __init__(self, shape):
        self.shape = tuple(shape)

    def init(self, rng, sample=None):
        z = jnp.zeros(self.shape)
        return {"u": z, "v": z, "p": z}

    def apply(self, params, inputs=None):
        b = 1 if inputs is None else inputs.shape[0]
        f = lambda k: jnp.broadcast_to(params[k][None], (b,) + self.shape)
        return f("u"), f("v"), f("p")


def test_flow_past_cylinder():
    ny, nx = 24, 48
    x = np.linspace(0, 4, nx)
    y = np.linspace(0, 1, ny)
    xx, yy = np.meshgrid(x, y)
    chi = (((xx - 1.0) ** 2 + (yy - 0.5) ** 2) < 0.15**2).astype(float)
    ds = FlowPastObjectDataset(chi, domain_lengths=(4.0, 1.0), Re=50)
    ds.n_samples = 1
    m = NavierStokes(
        TripleField((ny, nx)), ds, domain_lengths=(4.0, 1.0),
        domain_sizes=(nx, ny), batch_size=1, Re=50,
        u_bc=ds.u_bc, loss_norm="squared")
    batch = (jnp.asarray(ds[0][0])[None], jnp.asarray(ds[0][1])[None])
    net = m.network
    loss0 = float(m.training_loss(net.init(None), batch))
    tr = Trainer(max_epochs=120, optimizer="lbfgs", lbfgs_max_iter=10)
    st = tr.fit(m)
    loss1 = float(m.training_loss(st.params, batch))
    assert loss1 < 0.2 * loss0, (loss0, loss1)

    u, v, p = m.apply_bcs(net.apply(st.params, batch[0]), batch[0])
    u = np.asarray(u)[0]
    # inlet parabolic profile honored
    np.testing.assert_allclose(u[:, 0], np.asarray(ds.u_bc)[:, 0], atol=1e-5)
    # no-slip on the obstacle
    assert np.abs(u[chi > 0.5]).max() < 1e-5
    # flow accelerates around the obstacle: some u exceeds the inlet peak
    assert u.max() > np.asarray(ds.u_bc)[:, 0].max() * 1.02


def test_weak_form_ldc_trains():
    """Older squared weak-form NS loss decreases under training (reference
    01_weak_form_ldc.py)."""
    from diffnet_tpu.pde.flow import FlowWeakFormLDC
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    n = 16
    x = np.linspace(0, 1, n)
    xx, _ = np.meshgrid(x, x)
    bc1 = np.zeros((n, n)); bc1[0, :] = 1; bc1[:, [0, -1]] = 1
    bc2 = np.zeros((n, n)); bc2[-1, :] = 1
    bc3 = np.zeros((n, n)); bc3[0, 0] = 1
    inputs = np.stack([xx, bc1, bc2, bc3], -1).astype(np.float32)
    forcing = np.full((n, n, 1), 0.01, np.float32)
    ds = InMemoryDataset(inputs[None], forcing[None])
    net = TripleField((n, n))
    m = FlowWeakFormLDC(net, ds, domain_size=n, batch_size=1)
    batch = (jnp.asarray(inputs)[None], jnp.asarray(forcing)[None])
    loss0 = float(m.training_loss(net.init(None), batch))
    st = Trainer(max_epochs=40, optimizer="lbfgs",
                 lbfgs_max_iter=10).fit(m, NumpyLoader(ds, 1))
    loss1 = float(m.training_loss(st.params, batch))
    assert np.isfinite(loss1) and loss1 < loss0


def test_fpc_parametric_ensemble_multiout_unet():
    """Parametric NS-FPC (reference e2_ns_fpc_embedded_airfoil.py:241-414):
    obstacle-mask ensemble -> shared-encoder MultiOutUNet -> VMS residuals
    with per-field round-robin updates. Asserts the inlet profile, no-slip on
    the obstacle, and flow acceleration around it."""
    import jax

    from diffnet_tpu.data.flow import FlowPastObjectEnsemble, \
        synthetic_obstacles
    from diffnet_tpu.data.loader import NumpyLoader
    from diffnet_tpu.models.networks import MultiOutUNet

    ny, nx = 32, 64
    chis = synthetic_obstacles(2, (ny, nx), (4.0, 1.0), seed=3)
    ds = FlowPastObjectEnsemble(chis, domain_lengths=(4.0, 1.0), Re=50)
    net = MultiOutUNet(num_outputs=3, out_channels=1, base_filters=2)
    m = NavierStokes(net, ds, domain_lengths=(4.0, 1.0),
                     domain_sizes=(nx, ny), batch_size=2, Re=50,
                     u_bc=ds.u_bc, loss_norm="squared")
    loader = NumpyLoader(ds, batch_size=2, shuffle=False)
    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    p0 = m.init_params(jax.random.key(0), batch)
    loss0 = float(m.training_loss(p0, batch))
    tr = Trainer(max_epochs=150, optimizer="adam", learning_rate=2e-3,
                 round_robin=True)
    st = tr.fit(m, loader, params=p0)
    loss1 = float(m.training_loss(st.params, batch))
    assert np.isfinite(loss1) and loss1 < 0.5 * loss0, (loss0, loss1)

    u, v, p = m.apply_bcs(net.apply(st.params, batch[0]), batch[0])
    u = np.asarray(u)
    for i, chi in enumerate(chis):
        # inlet parabolic profile honored per sample
        np.testing.assert_allclose(u[i][:, 0], np.asarray(ds.u_bc)[:, 0],
                                   atol=1e-5)
        # no-slip on each sample's own obstacle
        assert np.abs(u[i][chi > 0.5]).max() < 1e-5
    # flow accelerates around at least one obstacle
    assert u.max() > np.asarray(ds.u_bc)[:, 0].max() * 1.02, u.max()
