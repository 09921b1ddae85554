"""Problem registry: maps the reference's problem names to initializers.

Names match the dispatch in HydroRunBase::init_simulation
(reference: src/hydro/HydroRunBase.cpp:7109-7133) and
MHDRunBase::init_simulation (MHDRunBase.cpp:1378-3245) so the shipped
``data/*.ini`` files work unchanged.
"""
from __future__ import annotations

from typing import Callable

import numpy as np

from ..config.configmap import ConfigMap
from ..config.params import RunParams
from . import hydro_inits

InitFn = Callable[[RunParams, ConfigMap], np.ndarray]

_HYDRO_REGISTRY: dict[str, InitFn] = {
    "sod": hydro_inits.init_hydro_sod,
    "implode": hydro_inits.init_hydro_implode,
    "blast": hydro_inits.init_hydro_blast,
    "Kelvin-Helmholtz": hydro_inits.init_hydro_kelvin_helmholtz,
    "Rayleigh-Taylor": hydro_inits.init_hydro_rayleigh_taylor,
    "Gresho-vortex": hydro_inits.init_hydro_gresho_vortex,
    "falling-bubble": hydro_inits.init_hydro_falling_bubble,
    "Keplerian-disk": hydro_inits.init_hydro_keplerian_disk,
    "jet": hydro_inits.init_hydro_jet,
}

_MHD_REGISTRY: dict[str, InitFn] = {}
_GRAVITY_REGISTRY: dict[str, InitFn] = {}


def register_hydro(name: str, fn: InitFn) -> None:
    _HYDRO_REGISTRY[name] = fn


def register_mhd(name: str, fn: InitFn) -> None:
    _MHD_REGISTRY[name] = fn


def register_gravity(name: str, fn: InitFn) -> None:
    _GRAVITY_REGISTRY[name] = fn


def gravity_field(params: RunParams, config: ConfigMap):
    """Problem-specific static gravity field [dim, ...spatial], or None.
    (the reference's h_gravity array, HydroRunBase.h:80-120)."""
    _load_extra_hydro()
    if params.mhd:
        _load_mhd_registry()
    fn = _GRAVITY_REGISTRY.get(params.problem)
    return fn(params, config) if fn is not None else None


def _load_mhd_registry() -> dict[str, InitFn]:
    # plain imports: idempotent via the module cache, and robust to the
    # hydro path having already imported turbulence_inits
    from . import mhd_inits  # noqa: F401  (registers on import)
    from . import turbulence_inits  # noqa: F401
    return _MHD_REGISTRY


def _load_extra_hydro() -> None:
    # riemann2d & turbulence live in their own modules; import registers them
    from . import riemann2d  # noqa: F401
    from . import turbulence_inits  # noqa: F401
    _GRAVITY_REGISTRY.setdefault(
        "Keplerian-disk", hydro_inits.keplerian_gravity_field
    )
    from .mhd_inits import mri_gravity_field

    for _name in ("MRI", "Mri", "mri"):
        _GRAVITY_REGISTRY.setdefault(_name, mri_gravity_field)


def init_problem(params: RunParams, config: ConfigMap) -> np.ndarray:
    """Build the initial conserved state for ``params.problem``."""
    name = params.problem
    if params.mhd:
        registry = _load_mhd_registry()
    else:
        _load_extra_hydro()
        registry = _HYDRO_REGISTRY
    if name not in registry:
        known = sorted(registry)
        raise ValueError(f"unknown problem {name!r} (mhd={params.mhd}); known: {known}")
    return registry[name](params, config)
