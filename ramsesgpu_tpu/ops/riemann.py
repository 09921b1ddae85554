"""Hydro Riemann solvers, whole-interface-array.

Whole-array JAX re-design of the reference's per-interface solvers
(reference: src/hydro/riemann.h:31-401, cmpflx.h:22-49), which are themselves
the RAMSES godunov_utils.f90 family. Three solvers: the iterative two-shock
"approx" solver, HLL, and HLLC.

Interface convention: left/right states ``ql``/``qr`` are primitive arrays
[nvar, ...spatial] in *rotated* component order — index IU always holds the
velocity normal to the interface, IV (and IW in 3D) the transverse ones.
Each solver returns the flux array in the same rotated order; the caller
un-rotates momentum components.

The per-cell branches of the reference become ``xp.where`` selects — on the
VPU this costs both branches but vectorizes perfectly, and XLA fuses the
whole solver into the surrounding stencil.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import ID, IP, IU, IV, IW, RiemannSolver


def cmpflx(params: RunParams, qgdnv, xp=None):
    """Euler flux from a Godunov (interface) state (cmpflx.h:22-49)."""
    if xp is None:
        from .backend import JNP as xp
    rho, p, u, v = qgdnv[ID], qgdnv[IP], qgdnv[IU], qgdnv[IV]
    f_rho = rho * u
    f_mu = f_rho * u + p
    f_mv = f_rho * v
    entho = 1.0 / (params.gamma0 - 1.0)
    if params.dim == 3:
        w = qgdnv[IW]
        f_mw = f_rho * w
        ekin = 0.5 * rho * (u * u + v * v + w * w)
        etot = p * entho + ekin
        f_e = u * (etot + p)
        return xp.stack([f_rho, f_e, f_mu, f_mv, f_mw])
    ekin = 0.5 * rho * (u * u + v * v)
    etot = p * entho + ekin
    f_e = u * (etot + p)
    return xp.stack([f_rho, f_e, f_mu, f_mv])


def riemann_approx(params: RunParams, ql, qr, xp=None):
    """Iterative two-shock approximate Riemann solver (riemann.h:31-159).

    Newton-Raphson on the star pressure; the data-dependent early exit of the
    reference becomes a convergence mask over a fixed ``niter_riemann``
    iteration count (static unroll — niter is ~10).
    """
    if xp is None:
        from .backend import JNP as xp
    smallr, smallc, smallp = params.smallr, params.smallc, params.smallp
    smallpp, gamma, gamma6 = params.smallpp, params.gamma0, params.gamma6

    rl = xp.maximum(ql[ID], smallr)
    ul = ql[IU]
    pl = xp.maximum(ql[IP], rl * smallp)
    rr = xp.maximum(qr[ID], smallr)
    ur = qr[IU]
    pr = xp.maximum(qr[IP], rr * smallp)

    # Lagrangian sound speed squared
    cl = gamma * pl * rl
    cr = gamma * pr * rr

    wl = xp.sqrt(cl)
    wr = xp.sqrt(cr)
    pstar = xp.maximum(((wr * pl + wl * pr) + wl * wr * (ul - ur)) / (wl + wr), 0.0)
    pold = pstar
    conv = xp.ones_like(pstar)

    # Newton loop, flop-trimmed for the VPU (the fused hydro kernel is
    # compute-bound on exactly this unroll — 45 vs 17 ms/step at 256^3
    # approx vs HLLC): the loop-invariant 1/pl, 1/pr are hoisted, and
    # each sqrt+divide pair collapses to one rsqrt + multiplies
    # (w = w^2 * rsqrt(w^2), (p-pl)/w = (p-pl)*rsqrt(w^2)). Same
    # two-shock Newton recurrence (riemann.h:64-89), same convergence
    # mask semantics; rounding differs from the literal form at ULP
    # level, as any refactoring of float expressions does.
    inv_pl = 1.0 / pl
    inv_pr = 1.0 / pr
    for _ in range(params.niter_riemann):
        active = conv > 1e-6
        wwl2 = cl * (1.0 + gamma6 * (pold - pl) * inv_pl)
        wwr2 = cr * (1.0 + gamma6 * (pold - pr) * inv_pr)
        rwl = xp.rsqrt(wwl2)
        rwr = xp.rsqrt(wwr2)
        wwl = wwl2 * rwl
        wwr = wwr2 * rwr
        qgl = 2.0 * wwl2 * wwl / (wwl2 + cl)
        qgr = 2.0 * wwr2 * wwr / (wwr2 + cr)
        usl = ul - (pold - pl) * rwl
        usr = ur + (pold - pr) * rwr
        delp = xp.maximum(qgr * qgl / (qgr + qgl) * (usl - usr), -pold)
        pnew = pold + delp
        cnew = xp.abs(delp / (pnew + smallpp))
        pold = xp.where(active, pnew, pold)
        conv = xp.where(active, cnew, conv)

    pstar = pold
    wwl2_f = cl * (1.0 + gamma6 * (pstar - pl) * inv_pl)
    wwr2_f = cr * (1.0 + gamma6 * (pstar - pr) * inv_pr)
    rwl_f = xp.rsqrt(wwl2_f)
    rwr_f = xp.rsqrt(wwr2_f)
    wl = wwl2_f * rwl_f
    wr = wwr2_f * rwr_f

    ustar = 0.5 * (ul + (pl - pstar) * rwl_f + ur - (pr - pstar) * rwr_f)
    sgnm = xp.where(ustar >= 0.0, 1.0, -1.0).astype(ustar.dtype)
    left_going = sgnm > 0.0

    ro = xp.where(left_going, rl, rr)
    uo = xp.where(left_going, ul, ur)
    po = xp.where(left_going, pl, pr)
    wo = xp.where(left_going, wl, wr)
    inv_wo = xp.where(left_going, rwl_f, rwr_f)

    inv_ro = 1.0 / ro
    co = xp.maximum(smallc, xp.sqrt(xp.abs(gamma * po * inv_ro)))
    rstar = xp.maximum(
        ro / (1.0 + ro * (po - pstar) * (inv_wo * inv_wo)), smallr
    )
    cstar = xp.maximum(smallc, xp.sqrt(xp.abs(gamma * pstar / rstar)))

    spout = co - sgnm * uo
    spin = cstar - sgnm * ustar
    ushock = wo * inv_ro - sgnm * uo
    spin = xp.where(pstar >= po, ushock, spin)
    spout = xp.where(pstar >= po, ushock, spout)

    scr = xp.maximum(spout - spin, smallc + xp.abs(spout + spin))
    frac = 0.5 * (1.0 + (spout + spin) / scr)
    frac = xp.where(xp.isnan(frac), 0.0, xp.clip(frac, 0.0, 1.0))

    g_rho = frac * rstar + (1.0 - frac) * ro
    g_u = frac * ustar + (1.0 - frac) * uo
    g_p = frac * pstar + (1.0 - frac) * po

    g_rho = xp.where(spout < 0.0, ro, g_rho)
    g_u = xp.where(spout < 0.0, uo, g_u)
    g_p = xp.where(spout < 0.0, po, g_p)

    g_rho = xp.where(spin > 0.0, rstar, g_rho)
    g_u = xp.where(spin > 0.0, ustar, g_u)
    g_p = xp.where(spin > 0.0, pstar, g_p)

    g_v = xp.where(left_going, ql[IV], qr[IV])
    parts = [g_rho, g_p, g_u, g_v]
    if params.dim == 3:
        parts.append(xp.where(left_going, ql[IW], qr[IW]))
    qgdnv = xp.stack(parts)
    return cmpflx(params, qgdnv, xp=xp)


def riemann_hll(params: RunParams, ql, qr, xp=None):
    """HLL solver (riemann.h:177-255; Toro ch. 10)."""
    if xp is None:
        from .backend import JNP as xp
    smallr, smallp, gamma = params.smallr, params.smallp, params.gamma0
    entho = 1.0 / (gamma - 1.0)

    rl = xp.maximum(ql[ID], smallr)
    ul = ql[IU]
    pl = xp.maximum(ql[IP], rl * smallp)
    rr = xp.maximum(qr[ID], smallr)
    ur = qr[IU]
    pr = xp.maximum(qr[IP], rr * smallp)

    cl = xp.sqrt(gamma * pl / rl)
    cr = xp.sqrt(gamma * pr / rr)

    SL = xp.minimum(xp.minimum(ul, ur) - xp.maximum(cl, cr), 0.0)
    SR = xp.maximum(xp.maximum(ul, ur) + xp.maximum(cl, cr), 0.0)

    def cons_and_flux(q):
        rho, p, u, v = q[ID], q[IP], q[IU], q[IV]
        e = p * entho + 0.5 * rho * (u * u + v * v)
        if params.dim == 3:
            e = e + 0.5 * rho * q[IW] * q[IW]
        mu = rho * u
        mv = rho * v
        cons = [rho, e, mu, mv]
        flux = [mu, u * (e + p), p + mu * u, mu * v]
        if params.dim == 3:
            mw = rho * q[IW]
            cons.append(mw)
            flux.append(mu * q[IW])
        return xp.stack(cons), xp.stack(flux)

    uleft, fleft = cons_and_flux(ql)
    uright, fright = cons_and_flux(qr)

    return (SR * fleft - SL * fright + SR * SL * (uright - uleft)) / (SR - SL)


def riemann_hllc(params: RunParams, ql, qr, xp=None):
    """HLLC solver (riemann.h:271-371)."""
    if xp is None:
        from .backend import JNP as xp
    smallr, smallp, smallc, gamma = params.smallr, params.smallp, params.smallc, params.gamma0
    entho = 1.0 / (gamma - 1.0)

    rl = xp.maximum(ql[ID], smallr)
    pl = xp.maximum(ql[IP], rl * smallp)
    ul = ql[IU]
    ecinl = 0.5 * rl * (ul * ul + ql[IV] * ql[IV])
    if params.dim == 3:
        ecinl = ecinl + 0.5 * rl * ql[IW] * ql[IW]
    etotl = pl * entho + ecinl

    rr = xp.maximum(qr[ID], smallr)
    pr = xp.maximum(qr[IP], rr * smallp)
    ur = qr[IU]
    ecinr = 0.5 * rr * (ur * ur + qr[IV] * qr[IV])
    if params.dim == 3:
        ecinr = ecinr + 0.5 * rr * qr[IW] * qr[IW]
    etotr = pr * entho + ecinr

    cfastl = xp.sqrt(xp.maximum(gamma * pl / rl, smallc * smallc))
    cfastr = xp.sqrt(xp.maximum(gamma * pr / rr, smallc * smallc))

    SL = xp.minimum(ul, ur) - xp.maximum(cfastl, cfastr)
    SR = xp.maximum(ul, ur) + xp.maximum(cfastl, cfastr)

    rcl = rl * (ul - SL)
    rcr = rr * (SR - ur)

    # shared reciprocals (see riemann_mhd.riemann_hlld): 6 divides -> 3
    inv_rc = 1.0 / (rcr + rcl)
    ustar = (rcr * ur + rcl * ul + (pl - pr)) * inv_rc
    ptotstar = (rcr * pl + rcl * pr + rcl * rcr * (ul - ur)) * inv_rc

    inv_sl = 1.0 / (SL - ustar)
    inv_sr = 1.0 / (SR - ustar)
    rstarl = rl * (SL - ul) * inv_sl
    etotstarl = ((SL - ul) * etotl - pl * ul + ptotstar * ustar) * inv_sl
    rstarr = rr * (SR - ur) * inv_sr
    etotstarr = ((SR - ur) * etotr - pr * ur + ptotstar * ustar) * inv_sr

    # sample the fan: SL>0 -> left; ustar>0 -> left star; SR>0 -> right star; else right
    def sample(l, lstar, rstar_, r_):
        out = xp.where(SR > 0.0, rstar_, r_)
        out = xp.where(ustar > 0.0, lstar, out)
        return xp.where(SL > 0.0, l, out)

    ro = sample(rl, rstarl, rstarr, rr)
    uo = sample(ul, ustar, ustar, ur)
    ptoto = sample(pl, ptotstar, ptotstar, pr)
    etoto = sample(etotl, etotstarl, etotstarr, etotr)

    f_rho = ro * uo
    f_mu = f_rho * uo + ptoto
    f_e = (etoto + ptoto) * uo
    f_mv = xp.where(f_rho > 0.0, f_rho * ql[IV], f_rho * qr[IV])
    parts = [f_rho, f_e, f_mu, f_mv]
    if params.dim == 3:
        parts.append(xp.where(f_rho > 0.0, f_rho * ql[IW], f_rho * qr[IW]))
    return xp.stack(parts)


def riemann_hydro(params: RunParams, ql, qr, xp=None):
    """Dispatch on the configured solver (riemann.h:390-401). The solver id is
    static config, so this is a trace-time branch, not a runtime one."""
    if xp is None:
        from .backend import JNP as xp
    if params.riemann_solver == RiemannSolver.APPROX:
        return riemann_approx(params, ql, qr, xp=xp)
    if params.riemann_solver == RiemannSolver.HLL:
        return riemann_hll(params, ql, qr, xp=xp)
    if params.riemann_solver == RiemannSolver.HLLC:
        return riemann_hllc(params, ql, qr, xp=xp)
    raise ValueError(f"unsupported hydro Riemann solver: {params.riemann_solver!r}")
