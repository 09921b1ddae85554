"""Shell-binned power spectrum E(k) of any field.

Re-design of the reference's offline MPI tool
(reference: src/analysis/powerSpectrum/powerSpectrumMpi.cpp,
fft_mpi.cpp:72-81): the PNetCDF-read + FFTW3-MPI pipeline becomes
``jnp.fft.fftn`` (sharded FFTs come for free under jit on a mesh) plus a
bincount shell reduction. Reads the framework's HDF5 snapshots.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.configmap import ConfigMap
from ..config.params import RunParams
from ..core.constants import ID, IU, IV, IW


def power_spectrum(field: np.ndarray, dx: float = 1.0):
    """Shell-binned isotropic spectrum of one scalar field.

    Returns (k, E_k) with k in units of the fundamental box mode.
    """
    field = jnp.asarray(field)
    ndim = field.ndim
    fhat = jnp.fft.fftn(field)
    psd = jnp.abs(fhat) ** 2 / field.size**2

    ks = [np.fft.fftfreq(n, d=1.0 / n) for n in field.shape]
    grids = np.meshgrid(*ks, indexing="ij")
    kmag = np.sqrt(sum(g * g for g in grids))
    kbin = np.rint(kmag).astype(np.int64)
    n_bins = int(kbin.max()) + 1

    ek = np.bincount(kbin.ravel(), weights=np.asarray(psd).ravel(), minlength=n_bins)
    k = np.arange(n_bins, dtype=np.float64)
    return k, ek


def velocity_power_spectrum(params: RunParams, U: np.ndarray):
    """E(k) of the velocity field (the reference computes one scalar field at
    a time; kinetic spectrum sums the three components)."""
    g = params.ghost_width
    sl = (slice(g, -g),) * params.dim
    rho = np.asarray(U[ID][sl])
    comps = [(np.asarray(U[c][sl]) / rho) for c in (IU, IV, IW)[: params.dim]]
    k, ek = power_spectrum(comps[0])
    for c in comps[1:]:
        ek = ek + power_spectrum(c)[1]
    return k, ek


def main(argv=None) -> int:
    import argparse

    from ..config.params import params_from_config
    from ..io.hdf5 import dataset_names, input_hdf5

    parser = argparse.ArgumentParser(
        description="shell-binned power spectrum from HDF5 snapshots"
    )
    parser.add_argument("--param", required=True)
    parser.add_argument("files", nargs="+")
    parser.add_argument("--field", default="velocity",
                        help="'velocity', or a dataset name like 'density'")
    parser.add_argument("--out", default="spectrum.npz")
    args = parser.parse_args(argv)

    config = ConfigMap(args.param)
    params = params_from_config(config)

    spectra = []
    for fname in args.files:
        U, t, step = input_hdf5(params, fname)
        if args.field == "velocity":
            k, ek = velocity_power_spectrum(params, U)
        else:
            names = dataset_names(params)
            idx = names.index(args.field)
            g = params.ghost_width
            sl = (slice(g, -g),) * params.dim
            k, ek = power_spectrum(U[idx][sl])
        spectra.append(ek)

    np.savez(args.out, k=k, ek=np.mean(spectra, axis=0))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
