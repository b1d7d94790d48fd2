"""PSI-convention HDF5 IO (Predictive Science MHD cubes).

Clean-room equivalent of the vendored Pot3D reader the reference uses
(sunerf/data/mhd/psi_io.py:41-173): a 'Data' dataset with optional HDF5
dimension-scale arrays attached per axis. The caller contract matches the
reference's MHDModel (mhd_model.py:62): rdhdf_3d -> (r, theta, phi, data)
with data indexed [phi, theta, r] (C order of the Fortran (r, th, phi) cube).
"""
from __future__ import annotations

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - h5py is in the base image
    h5py = None


def _require_h5py():
    if h5py is None:
        raise ImportError('h5py is required for PSI HDF5 IO')


def read_hdf(path: str):
    """Read a PSI HDF5 file -> (scales list, data). Scales are returned in
    dims order (axis 0 first); missing scales are empty arrays."""
    _require_h5py()
    with h5py.File(path, 'r') as f:
        dset = f['Data']
        data = np.asarray(dset)
        scales = []
        for i in range(data.ndim):
            if len(dset.dims[i].keys()) != 0:
                scales.append(np.asarray(dset.dims[i][0]))
            else:
                scales.append(np.array([]))
    return scales, data


def rdhdf_1d(path: str):
    scales, data = read_hdf(path)
    return scales[0], data


def rdhdf_2d(path: str):
    scales, data = read_hdf(path)
    return scales[0], scales[1], data


def rdhdf_3d(path: str):
    """-> (x, y, z, data): x/y/z are the axis-0/1/2 dimension scales. For PSI
    MHD cubes the caller interprets these as (r, theta, phi) with data
    [phi, theta, r] (reference mhd_model.py:62)."""
    scales, data = read_hdf(path)
    return scales[0], scales[1], scales[2], data


def write_hdf(path: str, data: np.ndarray, scales=None):
    """Write a PSI-convention file with optional dimension scales."""
    _require_h5py()
    data = np.asarray(data)
    with h5py.File(path, 'w') as f:
        dset = f.create_dataset('Data', data=data)
        if scales is not None:
            for i, s in enumerate(scales):
                s = np.asarray(s, data.dtype)
                if s.size == 0:
                    continue
                name = f'dim{i + 1}'
                f[name] = s
                f[name].make_scale(name)
                dset.dims[i].attach_scale(f[name])


def wrhdf_3d(path: str, x, y, z, data):
    write_hdf(path, data, scales=[x, y, z])
