"""Native host-preprocessing library (csrc/diffnet_host.cpp via ctypes):
equality against the pure-Python implementations it accelerates.

Reference anchors: KL synthesis DiffNet/gen_input_calc.py:74-181 (consumed
per-sample in a load-time loop by DiffNet/datasets/parametric/klsum.py:24-31);
winding numbers examples/poisson/parametric/IBN_2D.py:89-104.
"""

import numpy as np
import pytest

from diffnet_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (no g++?)")


def _cloud(B=2, P=300, seed=0, nsd=2):
    rng = np.random.default_rng(seed)
    th = rng.uniform(0, 2 * np.pi, (B, P))
    if nsd == 2:
        pts = 0.5 + 0.3 * np.stack([np.cos(th), np.sin(th)], -1)
        nrm = np.stack([np.cos(th), np.sin(th)], -1)
        areas = np.full((B, P), 2 * np.pi * 0.3 / P)
    else:
        ph = np.arccos(rng.uniform(-1, 1, (B, P)))
        d = np.stack([np.sin(ph) * np.cos(th), np.sin(ph) * np.sin(th),
                      np.cos(ph)], -1)
        pts = 0.5 + 0.3 * d
        nrm = d
        areas = np.full((B, P), 4 * np.pi * 0.3**2 / P)
    return (pts.astype(np.float32), nrm.astype(np.float32),
            areas.astype(np.float32))


def test_kl_diffusivity_matches_python():
    from diffnet_tpu.data.gen_input import generate_diffusivity_tensor

    rng = np.random.default_rng(1)
    coeffs = rng.uniform(-0.5, 0.5, (8, 6))
    out = native.kl_diffusivity_batch(coeffs, 33)
    ref = np.stack([generate_diffusivity_tensor(c, output_size=33).squeeze(0)
                    for c in coeffs])
    np.testing.assert_allclose(out, ref.astype(np.float32), atol=2e-6)


def test_kl_diffusivity_pads_and_truncates_like_reference():
    from diffnet_tpu.data.gen_input import generate_diffusivity_tensor

    c4 = np.array([[0.3, -0.2, 0.1, 0.4]])          # 4 coeffs -> pad to 6
    out = native.kl_diffusivity_batch(c4, 17, n_sum_nu=3)  # + truncate to 3
    ref = generate_diffusivity_tensor(c4[0], output_size=17, n_sum_nu=3)
    np.testing.assert_allclose(out[0], ref[0].astype(np.float32), atol=2e-6)


def test_kl_eta_respected_by_both_paths(monkeypatch):
    """Non-default eta must produce the same fields on the native and
    numpy paths (the fallback cannot use generate_diffusivity_tensor,
    which hardcodes eta=0.5)."""
    coeffs = np.random.default_rng(7).uniform(-0.5, 0.5, (3, 6))
    nat = native.kl_diffusivity_batch(coeffs, 17, eta=0.25)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    fb = native.kl_diffusivity_batch(coeffs, 17, eta=0.25)
    np.testing.assert_allclose(nat, fb, atol=2e-6)
    # and eta actually changes the field
    nat5 = native.kl_diffusivity_batch(coeffs, 17, eta=0.5)
    assert np.abs(np.asarray(fb) - nat5).max() > 1e-3


def test_winding_2d_matches_device_path():
    from diffnet_tpu.core.geometry import winding_number_2d

    pts, nrm, areas, = _cloud()
    rng = np.random.default_rng(2)
    q = rng.random((257, 2)).astype(np.float32)
    host = native.winding_number_2d_host(pts, nrm, areas, q)
    dev = np.asarray(winding_number_2d(pts, nrm, areas, q))
    np.testing.assert_allclose(host, dev, atol=2e-4)
    # interior queries of a closed circle wind ~1
    inside = native.winding_number_2d_host(
        pts, nrm, areas, np.array([[0.5, 0.5]], np.float32))
    assert np.all(np.abs(inside - 1.0) < 0.05)


def test_winding_3d_matches_device_path():
    from diffnet_tpu.core.geometry import winding_number_3d

    pts, nrm, areas = _cloud(nsd=3, P=600)
    rng = np.random.default_rng(3)
    q = rng.random((129, 3)).astype(np.float32)
    host = native.winding_number_3d_host(pts, nrm, areas, q)
    dev = np.asarray(winding_number_3d(pts, nrm, areas, q))
    np.testing.assert_allclose(host, dev, atol=2e-3)


def test_numpy_fallback_matches_native(monkeypatch):
    pts, nrm, areas = _cloud(B=1, P=100)
    q = np.random.default_rng(4).random((64, 2)).astype(np.float32)
    nat = native.winding_number_2d_host(pts, nrm, areas, q)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    fb = native.winding_number_2d_host(pts, nrm, areas, q)
    np.testing.assert_allclose(nat, fb, atol=1e-5)


def test_klsum_stochastic_uses_batch_path():
    from diffnet_tpu.data.parametric import KLSumStochastic

    coeffs = np.random.default_rng(5).uniform(-0.5, 0.5, (4, 6))
    ds = KLSumStochastic(coeffs, domain_size=17)
    assert len(ds) == 4
    inputs, forcing = ds[0]
    assert inputs.shape == (17, 17, 3) and forcing.shape == (17, 17, 1)
    assert np.all(inputs[..., 0] > 0)  # exp() positive diffusivity


def test_gather_batch_matches_fancy_index(monkeypatch):
    """Native threaded row-gather == numpy fancy indexing, across dtypes
    and trailing shapes, including repeated and empty index sets."""
    rng = np.random.default_rng(6)
    for src in (rng.random((10, 5, 3)).astype(np.float32),
                rng.integers(0, 255, (7, 4), dtype=np.uint8),
                rng.random(9)):  # 1-d store (scalar rows)
        for idx in ([3, 1, 3, 0], [], list(range(len(src)))):
            nat = native.gather_batch(src, idx)
            np.testing.assert_array_equal(nat, src[np.asarray(idx, np.int64)])
    with np.testing.assert_raises(IndexError):
        native.gather_batch(np.zeros((4, 2)), [4])
    # fallback path identical
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    src = rng.random((6, 2, 2)).astype(np.float32)
    np.testing.assert_array_equal(native.gather_batch(src, [5, 0]),
                                  src[[5, 0]])


def test_loader_native_batch_fast_path():
    """NumpyLoader uses InMemoryDataset.batch (native gather): batches are
    identical to the per-item stacking path, shuffle order included."""
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    rng = np.random.default_rng(7)
    inputs = rng.random((13, 4, 4, 2)).astype(np.float32)
    forcing = rng.random((13, 4, 4, 1)).astype(np.float32)
    ds = InMemoryDataset(inputs, forcing)

    class NoBatch:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            return ds[i]

    for shuffle in (False, True):
        fast = list(NumpyLoader(ds, batch_size=4, shuffle=shuffle, seed=3))
        slow = list(NumpyLoader(NoBatch(), batch_size=4, shuffle=shuffle,
                                seed=3))
        assert len(fast) == len(slow) == 3
        for (fi, ff), (si, sf) in zip(fast, slow):
            np.testing.assert_array_equal(fi, si)
            np.testing.assert_array_equal(ff, sf)


def test_loader_batch_contract_edges():
    """Review-fix regressions: (1) a dataset whose `batch` attribute is
    NOT callable keeps the per-item path instead of crashing; (2)
    InMemoryDataset.batch honors negative indices exactly like
    __getitem__ (the documented equivalence contract)."""
    from diffnet_tpu.data.loader import InMemoryDataset, NumpyLoader

    rng = np.random.default_rng(11)
    inputs = rng.random((6, 3, 3, 2)).astype(np.float32)
    forcing = rng.random((6, 3, 3, 1)).astype(np.float32)
    ds = InMemoryDataset(inputs, forcing)

    class OddBatchAttr:
        batch = 4  # innocent non-callable attribute named `batch`

        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            return ds[i]

    got = list(NumpyLoader(OddBatchAttr(), batch_size=2))
    assert len(got) == 3
    np.testing.assert_array_equal(got[0][0], inputs[:2])

    bi, bf = ds.batch([-1, 0])
    np.testing.assert_array_equal(bi[0], inputs[-1])
    np.testing.assert_array_equal(bf[1], forcing[0])
