"""NeuroPAL .mat loader against a synthetic fixture (the reference loads
curated lab files, /root/reference/Demix/dNMF.py:220-248)."""

import numpy as np
import pytest

from dnmf_tpu.data.datasets import NeuroPALVideoDataset


@pytest.fixture
def neuropal_dir(tmp_path):
    from scipy.io import savemat

    rng = np.random.default_rng(0)
    m, n, z, t = 20, 18, 20, 12
    data = rng.uniform(-0.1, 1.0, size=(m, n, z, t)).astype(np.float32)
    savemat(str(tmp_path / "data.mat"), {"data": data})

    k = 3
    positions = rng.uniform(1, 15, size=(k, 3, t)).astype(np.float64)
    names = np.empty((1, k), dtype=object)
    for i in range(k):
        names[0, i] = np.array([f"N{i}"])
    savemat(
        str(tmp_path / "traces_n.mat"),
        {"positions": positions, "neuron_names": names},
    )
    return str(tmp_path), data, positions


def test_neuropal_loader_contract(neuropal_dir):
    directory, data, positions = neuropal_dir
    ds = NeuroPALVideoDataset(directory, downsample=(2, 2, 10),
                              max_frames=10)
    # Downsampled, time-major, negatives clamped.
    assert ds.video.shape == (10, 10, 9, 2)
    assert float(ds.video.min()) >= 0.0
    expected = np.maximum(
        data[::2, ::2, ::10, :10].transpose(3, 0, 1, 2), 0.0
    )
    np.testing.assert_allclose(np.asarray(ds.video), expected, rtol=1e-6)

    # Positions: MATLAB 1-based -> 0-based, rescaled by downsampling.
    assert ds.positions.shape == (3, 3, 10)
    np.testing.assert_allclose(
        np.asarray(ds.positions[:, 0, :]),
        (positions[:, 0, :10] - 1) / 2,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ds.positions[:, 2, :]),
        (positions[:, 2, :10] - 1) / 10,
        rtol=1e-5,
    )
    assert ds.names == ["N0", "N1", "N2"]
