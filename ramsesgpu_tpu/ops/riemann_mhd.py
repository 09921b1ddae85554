"""MHD Riemann solvers: 1D HLLD/LLF for face fluxes and the 2D corner
solvers (HLLD/HLLA/HLLF/LLF) producing the EMF for constrained transport.

Whole-array JAX re-design of the reference's per-interface routines
(reference: src/hydro/riemann_mhd.h:87-1193, mhd_utils.h:29-318), themselves
from RAMSES/DUMSES (Miyoshi & Kusano 2005 for HLLD; Londrillo & Del Zanna
for the 2.5D corner solvers).

State component convention for the 1D solvers (rotated order):
  [ID rho, IP p, IU vnormal, IV vt1, IW vt2, IA Bnormal, IB Bt1, IC Bt2]
For the 2D corner solvers, IU/IV are the two in-plane velocities and
IA/IB the two in-plane field components; IW/IC are out-of-plane.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import IA, IB, IC, ID, IP, IU, IV, IW, MagneticRiemannSolver, RiemannSolver


def _fast_speed_components(params: RunParams, d, p, a, b, c, bn=None):
    """Fast magnetosonic speed from explicit components; ``bn`` defaults to
    ``a`` (mhd_utils.h:30-52)."""
    if bn is None:
        bn = a
    b2 = a * a + b * b + c * c
    c2 = params.gamma0 * p / d
    d2 = 0.5 * (b2 / d + c2)
    return jnp.sqrt(d2 + jnp.sqrt(jnp.maximum(d2 * d2 - c2 * bn * bn / d, 0.0)))


def _fast_speed(params: RunParams, q, bn):
    """Fast magnetosonic speed given normal field bn (mhd_utils.h:30-52)."""
    d = q[ID]
    p = q[ID] * params.c_iso**2 if params.c_iso > 0 else q[IP]
    return _fast_speed_components(params, d, p, q[IA], q[IB], q[IC], bn)


def _find_mhd_flux(params: RunParams, q):
    """Conservative state and flux from a primitive state
    (mhd_utils.h:106-168). Gas pressure folded into the normal-momentum flux."""
    entho = 1.0 / (params.gamma0 - 1.0)
    d, u, v, w = q[ID], q[IU], q[IV], q[IW]
    a, b, c = q[IA], q[IB], q[IC]
    p = d * params.c_iso**2 if params.c_iso > 0 else q[IP]
    ecin = 0.5 * (u * u + v * v + w * w) * d
    emag = 0.5 * (a * a + b * b + c * c)
    etot = p * entho + ecin + emag
    ptot = p + emag
    cons = jnp.stack([d, etot, d * u, d * v, d * w, a, b, c])
    flux = jnp.stack(
        [
            d * u,
            (etot + ptot) * u - a * (a * u + b * v + c * w),
            d * u * u - a * a + ptot,
            d * u * v - a * b,
            d * u * w - a * c,
            jnp.zeros_like(d),
            b * u - a * v,
            c * u - a * w,
        ]
    )
    return cons, flux


def _find_speed_info(params: RunParams, q):
    """Fastest information speed along the normal: cf_x + |u|
    (mhd_utils.h:296-316)."""
    return _fast_speed(params, q, q[IA]) + jnp.abs(q[IU])


def riemann_llf_mhd(params: RunParams, ql, qr):
    """Local Lax-Friedrichs MHD solver (riemann_mhd.h:87-119)."""
    bx_mean = 0.5 * (ql[IA] + qr[IA])
    ql = ql.at[IA].set(bx_mean)
    qr = qr.at[IA].set(bx_mean)

    ul, fl = _find_mhd_flux(params, ql)
    ur, fr = _find_mhd_flux(params, qr)
    vel_info = jnp.maximum(_find_speed_info(params, ql), _find_speed_info(params, qr))
    return 0.5 * (fl + fr) - 0.5 * vel_info * (ur - ul)


def riemann_hll_mhd(params: RunParams, ql, qr):
    """HLL for MHD: single-state HLL average built from the full MHD fluxes."""
    bx_mean = 0.5 * (ql[IA] + qr[IA])
    ql = ql.at[IA].set(bx_mean)
    qr = qr.at[IA].set(bx_mean)

    cl, fl = _find_mhd_flux(params, ql)
    cr, fr = _find_mhd_flux(params, qr)
    cfl = _fast_speed(params, ql, bx_mean)
    cfr = _fast_speed(params, qr, bx_mean)
    SL = jnp.minimum(jnp.minimum(ql[IU], qr[IU]) - jnp.maximum(cfl, cfr), 0.0)
    SR = jnp.maximum(jnp.maximum(ql[IU], qr[IU]) + jnp.maximum(cfl, cfr), 0.0)
    return (SR * fl - SL * fr + SR * SL * (cr - cl)) / (SR - SL)


def riemann_hlld(params: RunParams, ql, qr):
    """HLLD MHD solver (riemann_mhd.h:140-342; Miyoshi & Kusano 2005).

    Five-wave fan (SL, SAL, ustar contact, SAR, SR); the degenerate-Alfven
    branch of the reference (|estar/a^2 - 1| <= 1e-8) becomes a where-select.
    """
    entho = 1.0 / (params.gamma0 - 1.0)

    a = 0.5 * (ql[IA] + qr[IA])
    sgnm = jnp.where(a >= 0.0, 1.0, -1.0).astype(a.dtype)

    def prep(q):
        r = q[ID]
        p = r * params.c_iso**2 if params.c_iso > 0 else q[IP]
        u, v, w = q[IU], q[IV], q[IW]
        b, c = q[IB], q[IC]
        ecin = 0.5 * (u * u + v * v + w * w) * r
        emag = 0.5 * (a * a + b * b + c * c)
        etot = p * entho + ecin + emag
        ptot = p + emag
        vdotb = u * a + v * b + w * c
        cfast = _fast_speed_components(params, r, p, a, b, c)
        return r, p, u, v, w, b, c, etot, ptot, vdotb, cfast

    rl, pl, ul, vl, wl, bl, cl, etotl, ptotl, vdotbl, cfastl = prep(ql)
    rr, pr, ur, vr, wr, br, cr, etotr, ptotr, vdotbr, cfastr = prep(qr)

    sl = jnp.minimum(ul, ur) - jnp.maximum(cfastl, cfastr)
    sr = jnp.maximum(ul, ur) + jnp.maximum(cfastl, cfastr)

    rcl = rl * (ul - sl)
    rcr = rr * (sr - ur)

    ustar = (rcr * ur + rcl * ul + (ptotl - ptotr)) / (rcr + rcl)
    ptotstar = (rcr * ptotl + rcl * ptotr + rcl * rcr * (ul - ur)) / (rcr + rcl)

    def star(r_, u_, v_, w_, b_, c_, etot_, ptot_, vdotb_, s_):
        rstar = r_ * (s_ - u_) / (s_ - ustar)
        estar = r_ * (s_ - u_) * (s_ - ustar) - a * a
        el = r_ * (s_ - u_) * (s_ - u_) - a * a
        degenerate = jnp.logical_and(a * a > 0, jnp.abs(estar / (a * a + 1e-300) - 1.0) <= 1e-8)
        # avoid 0/0 in the masked-out branch
        estar_safe = jnp.where(estar == 0.0, 1.0, estar)
        vstar = jnp.where(degenerate, v_, v_ - a * b_ * (ustar - u_) / estar_safe)
        bstar = jnp.where(degenerate, b_, b_ * el / estar_safe)
        wstar = jnp.where(degenerate, w_, w_ - a * c_ * (ustar - u_) / estar_safe)
        cstar = jnp.where(degenerate, c_, c_ * el / estar_safe)
        vdotbstar = ustar * a + vstar * bstar + wstar * cstar
        etotstar = (
            (s_ - u_) * etot_ - ptot_ * u_ + ptotstar * ustar + a * (vdotb_ - vdotbstar)
        ) / (s_ - ustar)
        sqrtr = jnp.sqrt(rstar)
        calfven = jnp.abs(a) / sqrtr
        return rstar, vstar, wstar, bstar, cstar, vdotbstar, etotstar, sqrtr, calfven

    (rstarl, vstarl, wstarl, bstarl, cstarl, vdotbstarl, etotstarl, sqrl, calfl) = star(
        rl, ul, vl, wl, bl, cl, etotl, ptotl, vdotbl, sl
    )
    (rstarr, vstarr, wstarr, bstarr, cstarr, vdotbstarr, etotstarr, sqrr, calfr) = star(
        rr, ur, vr, wr, br, cr, etotr, ptotr, vdotbr, sr
    )
    sal = ustar - calfl
    sar = ustar + calfr

    denom = sqrl + sqrr
    vss = (sqrl * vstarl + sqrr * vstarr + sgnm * (bstarr - bstarl)) / denom
    wss = (sqrl * wstarl + sqrr * wstarr + sgnm * (cstarr - cstarl)) / denom
    bss = (sqrl * bstarr + sqrr * bstarl + sgnm * sqrl * sqrr * (vstarr - vstarl)) / denom
    css = (sqrl * cstarr + sqrr * cstarl + sgnm * sqrl * sqrr * (wstarr - wstarl)) / denom
    vdotbss = ustar * a + vss * bss + wss * css
    etotssl = etotstarl - sgnm * sqrl * (vdotbstarl - vdotbss)
    etotssr = etotstarr + sgnm * sqrr * (vdotbstarr - vdotbss)

    # sample the 6-zone fan from the outside in (reference's if/else ladder
    # becomes nested selects evaluated innermost-first)
    def pick(sel, a_, b_):
        return jnp.where(sel, a_, b_)

    zones = [
        # (condition, ro, uo, vo, wo, bo, co, ptoto, etoto, vdotbo)
        (sl > 0, rl, ul, vl, wl, bl, cl, ptotl, etotl, vdotbl),
        (sal > 0, rstarl, ustar, vstarl, wstarl, bstarl, cstarl, ptotstar, etotstarl, vdotbstarl),
        (ustar > 0, rstarl, ustar, vss, wss, bss, css, ptotstar, etotssl, vdotbss),
        (sar > 0, rstarr, ustar, vss, wss, bss, css, ptotstar, etotssr, vdotbss),
        (sr > 0, rstarr, ustar, vstarr, wstarr, bstarr, cstarr, ptotstar, etotstarr, vdotbstarr),
    ]
    ro, uo, vo, wo, bo, co = rr, ur, vr, wr, br, cr
    ptoto, etoto, vdotbo = ptotr, etotr, vdotbr
    for cond, r_, u_, v_, w_, b_, c_, pt_, et_, vb_ in reversed(zones):
        ro = pick(cond, r_, ro)
        uo = pick(cond, u_, uo)
        vo = pick(cond, v_, vo)
        wo = pick(cond, w_, wo)
        bo = pick(cond, b_, bo)
        co = pick(cond, c_, co)
        ptoto = pick(cond, pt_, ptoto)
        etoto = pick(cond, et_, etoto)
        vdotbo = pick(cond, vb_, vdotbo)

    return jnp.stack(
        [
            ro * uo,
            (etoto + ptoto) * uo - a * vdotbo,
            ro * uo * uo - a * a + ptoto,
            ro * uo * vo - a * bo,
            ro * uo * wo - a * co,
            jnp.zeros_like(ro),
            bo * uo - a * vo,
            co * uo - a * wo,
        ]
    )


def riemann_mhd(params: RunParams, ql, qr):
    """Dispatch on the configured solver (riemann_mhd.h:355-368)."""
    if params.riemann_solver == RiemannSolver.HLLD:
        return riemann_hlld(params, ql, qr)
    if params.riemann_solver == RiemannSolver.LLF:
        return riemann_llf_mhd(params, ql, qr)
    if params.riemann_solver == RiemannSolver.HLL:
        return riemann_hll_mhd(params, ql, qr)
    raise ValueError(f"unsupported MHD Riemann solver: {params.riemann_solver!r}")


# --------------------------------------------------------------------------- #
# 2D corner solvers for the EMF
# --------------------------------------------------------------------------- #
def _minmax4(*a):
    lo = a[0]
    hi = a[0]
    for x in a[1:]:
        lo = jnp.minimum(lo, x)
        hi = jnp.maximum(hi, x)
    return lo, hi


def mag_riemann2d_hlld(params: RunParams, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR):
    """2D HLLD corner solver (riemann_mhd.h:616-828).

    States are in the 2D convention: IU/IV in-plane velocities, IA/IB
    in-plane fields (continuity already enforced by the caller), IC the
    out-of-plane field. Returns the EMF at the corner.
    """
    smallc = params.smallc

    def speeds(q, bn_idx):
        return _fast_speed(params, q, q[bn_idx])

    cfx = [speeds(q, IA) for q in (qLL, qLR, qRL, qRR)]
    cfy = [speeds(q, IB) for q in (qLL, qLR, qRL, qRR)]

    ulo, uhi = _minmax4(qLL[IU], qLR[IU], qRL[IU], qRR[IU])
    vlo, vhi = _minmax4(qLL[IV], qLR[IV], qRL[IV], qRR[IV])
    _, cxmax = _minmax4(*cfx)
    _, cymax = _minmax4(*cfy)

    SL = ulo - cxmax
    SR = uhi + cxmax
    SB = vlo - cymax
    ST = vhi + cymax

    def ptot(q):
        p = q[ID] * params.c_iso**2 if params.c_iso > 0 else q[IP]
        return p + 0.5 * (q[IA] ** 2 + q[IB] ** 2 + q[IC] ** 2)

    PtotLL, PtotLR, PtotRL, PtotRR = ptot(qLL), ptot(qLR), ptot(qRL), ptot(qRR)

    rLL, uLL, vLL, aLL, bLL = qLL[ID], qLL[IU], qLL[IV], qLL[IA], qLL[IB]
    rLR, uLR, vLR, aLR, bLR = qLR[ID], qLR[IU], qLR[IV], qLR[IA], qLR[IB]
    rRL, uRL, vRL, aRL, bRL = qRL[ID], qRL[IU], qRL[IV], qRL[IA], qRL[IB]
    rRR, uRR, vRR, aRR, bRR = qRR[ID], qRR[IU], qRR[IV], qRR[IA], qRR[IB]

    rcLLx = rLL * (uLL - SL); rcRLx = rRL * (SR - uRL)
    rcLRx = rLR * (uLR - SL); rcRRx = rRR * (SR - uRR)
    rcLLy = rLL * (vLL - SB); rcLRy = rLR * (ST - vLR)
    rcRLy = rRL * (vRL - SB); rcRRy = rRR * (ST - vRR)

    ustar = (
        rcLLx * uLL + rcLRx * uLR + rcRLx * uRL + rcRRx * uRR
        + (PtotLL - PtotRL + PtotLR - PtotRR)
    ) / (rcLLx + rcLRx + rcRLx + rcRRx)
    vstar = (
        rcLLy * vLL + rcLRy * vLR + rcRLy * vRL + rcRRy * vRR
        + (PtotLL - PtotLR + PtotRL - PtotRR)
    ) / (rcLLy + rcLRy + rcRLy + rcRRy)

    def star(r, u, v, a_, b_, Sx, Sy):
        rstarx = r * (Sx - u) / (Sx - ustar)
        Bstar = b_ * (Sx - u) / (Sx - ustar)
        rstary = r * (Sy - v) / (Sy - vstar)
        Astar = a_ * (Sy - v) / (Sy - vstar)
        rstar = rstarx * (Sy - v) / (Sy - vstar)
        Estarx = ustar * Bstar - v * a_
        Estary = u * b_ - vstar * Astar
        Estar = ustar * Bstar - vstar * Astar
        return rstarx, Bstar, rstary, Astar, rstar, Estarx, Estary, Estar

    (rsLLx, BstarLL, rsLLy, AstarLL, rsLL, EstarLLx, EstarLLy, EstarLL) = star(
        rLL, uLL, vLL, aLL, bLL, SL, SB
    )
    (rsLRx, BstarLR, rsLRy, AstarLR, rsLR, EstarLRx, EstarLRy, EstarLR) = star(
        rLR, uLR, vLR, aLR, bLR, SL, ST
    )
    (rsRLx, BstarRL, rsRLy, AstarRL, rsRL, EstarRLx, EstarRLy, EstarRL) = star(
        rRL, uRL, vRL, aRL, bRL, SR, SB
    )
    (rsRRx, BstarRR, rsRRy, AstarRR, rsRR, EstarRRx, EstarRRy, EstarRR) = star(
        rRR, uRR, vRR, aRR, bRR, SR, ST
    )

    def max5(a0, a1, a2, a3, a4):
        return jnp.maximum(jnp.maximum(jnp.maximum(a0, a1), jnp.maximum(a2, a3)), a4)

    sq = jnp.sqrt
    calfvenL = max5(
        jnp.abs(aLR) / sq(rsLRx), jnp.abs(AstarLR) / sq(rsLR),
        jnp.abs(aLL) / sq(rsLLx), jnp.abs(AstarLL) / sq(rsLL),
        jnp.full_like(aLL, smallc),
    )
    calfvenR = max5(
        jnp.abs(aRR) / sq(rsRRx), jnp.abs(AstarRR) / sq(rsRR),
        jnp.abs(aRL) / sq(rsRLx), jnp.abs(AstarRL) / sq(rsRL),
        jnp.full_like(aLL, smallc),
    )
    calfvenB = max5(
        jnp.abs(bLL) / sq(rsLLy), jnp.abs(BstarLL) / sq(rsLL),
        jnp.abs(bRL) / sq(rsRLy), jnp.abs(BstarRL) / sq(rsRL),
        jnp.full_like(aLL, smallc),
    )
    calfvenT = max5(
        jnp.abs(bLR) / sq(rsLRy), jnp.abs(BstarLR) / sq(rsLR),
        jnp.abs(bRR) / sq(rsRRy), jnp.abs(BstarRR) / sq(rsRR),
        jnp.full_like(aLL, smallc),
    )

    SAL = jnp.minimum(ustar - calfvenL, 0.0)
    SAR = jnp.maximum(ustar + calfvenR, 0.0)
    SAB = jnp.minimum(vstar - calfvenB, 0.0)
    SAT = jnp.maximum(vstar + calfvenT, 0.0)

    AstarT = (SAR * AstarRR - SAL * AstarLR) / (SAR - SAL)
    AstarB = (SAR * AstarRL - SAL * AstarLL) / (SAR - SAL)
    BstarR = (SAT * BstarRR - SAB * BstarRL) / (SAT - SAB)
    BstarL = (SAT * BstarLR - SAB * BstarLL) / (SAT - SAB)

    # central (subsonic in both directions) HLLD EMF
    E_center = (
        (SAL * SAB * EstarRR - SAL * SAT * EstarRL - SAR * SAB * EstarLR + SAR * SAT * EstarLL)
        / (SAR - SAL) / (SAT - SAB)
        - SAT * SAB / (SAT - SAB) * (AstarT - AstarB)
        + SAR * SAL / (SAR - SAL) * (BstarR - BstarL)
    )

    # supersonic-in-y branches collapse to 1D HLL problems in x (and vice versa)
    E_B = (SAR * EstarLLx - SAL * EstarRLx + SAR * SAL * (bRL - bLL)) / (SAR - SAL)
    E_B = jnp.where(SL > 0, eLL, jnp.where(SR < 0, eRL, E_B))
    E_T = (SAR * EstarLRx - SAL * EstarRRx + SAR * SAL * (bRR - bLR)) / (SAR - SAL)
    E_T = jnp.where(SL > 0, eLR, jnp.where(SR < 0, eRR, E_T))
    E_L = (SAT * EstarLLy - SAB * EstarLRy - SAT * SAB * (aLR - aLL)) / (SAT - SAB)
    E_R = (SAT * EstarRLy - SAB * EstarRRy - SAT * SAB * (aRR - aRL)) / (SAT - SAB)

    E = jnp.where(
        SB > 0,
        E_B,
        jnp.where(
            ST < 0,
            E_T,
            jnp.where(SL > 0, E_L, jnp.where(SR < 0, E_R, E_center)),
        ),
    )
    return E


def mag_riemann2d_hll_family(params: RunParams, qLL, qRL, qLR, qRR,
                             eLL, eRL, eLR, eRR, use_fast: bool):
    """HLLA (Alfven speeds) / HLLF (fast speeds) corner solvers
    (riemann_mhd.h:418-516): a 2D-HLL average of the four corner EMFs plus
    dissipation on the in-plane field jumps."""
    if use_fast:
        cx = [_fast_speed(params, q, q[IA]) for q in (qLL, qLR, qRL, qRR)]
        cy = [_fast_speed(params, q, q[IB]) for q in (qLL, qLR, qRL, qRR)]
        cxmax = jnp.maximum(jnp.maximum(cx[0], cx[1]), jnp.maximum(cx[2], cx[3]))
        cymax = jnp.maximum(jnp.maximum(cy[0], cy[1]), jnp.maximum(cy[2], cy[3]))
    else:
        def alfven(q, idx):
            return jnp.sqrt(q[idx] ** 2 / q[ID])

        cx = [alfven(q, IA) for q in (qLL, qLR, qRL, qRR)]
        cy = [alfven(q, IB) for q in (qLL, qLR, qRL, qRR)]
        smallc = params.smallc
        cxmax = jnp.maximum(
            jnp.maximum(jnp.maximum(cx[0], cx[1]), jnp.maximum(cx[2], cx[3])), smallc
        )
        cymax = jnp.maximum(
            jnp.maximum(jnp.maximum(cy[0], cy[1]), jnp.maximum(cy[2], cy[3])), smallc
        )

    ulo, uhi = _minmax4(qLL[IU], qLR[IU], qRL[IU], qRR[IU])
    vlo, vhi = _minmax4(qLL[IV], qLR[IV], qRL[IV], qRR[IV])
    SL = jnp.minimum(ulo - cxmax, 0.0)
    SR = jnp.maximum(uhi + cxmax, 0.0)
    SB = jnp.minimum(vlo - cymax, 0.0)
    ST = jnp.maximum(vhi + cymax, 0.0)

    return (
        (SL * SB * eRR - SL * ST * eRL - SR * SB * eLR + SR * ST * eLL)
        / (SR - SL) / (ST - SB)
        - ST * SB / (ST - SB) * (qRR[IA] - qLL[IA])
        + SR * SL / (SR - SL) * (qRR[IB] - qLL[IB])
    )


def mag_riemann2d_llf(params: RunParams, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR):
    """2D LLF corner solver (riemann_mhd.h:519-613): mean EMF plus
    LLF dissipation on the in-plane field jumps."""
    E = 0.25 * (eLL + eRL + eLR + eRR)

    def info(q, bn_idx, v_idx):
        return _fast_speed(params, q, q[bn_idx]) + jnp.abs(q[v_idx])

    cx = [info(q, IA, IU) for q in (qLL, qLR, qRL, qRR)]
    cy = [info(q, IB, IV) for q in (qLL, qLR, qRL, qRR)]
    vel_x = jnp.maximum(jnp.maximum(cx[0], cx[1]), jnp.maximum(cx[2], cx[3]))
    vel_y = jnp.maximum(jnp.maximum(cy[0], cy[1]), jnp.maximum(cy[2], cy[3]))

    return (
        E
        - 0.5 * vel_y * (qRR[IA] - qLL[IA])
        + 0.5 * vel_x * (qRR[IB] - qLL[IB])
    )


def mag_riemann2d(params: RunParams, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR):
    """Dispatch on [MHD] magRiemannSolver (compute_emf, riemann_mhd.h:1160-1170)."""
    s = params.mag_riemann_solver
    if s == MagneticRiemannSolver.MAG_HLLD:
        return mag_riemann2d_hlld(params, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR)
    if s == MagneticRiemannSolver.MAG_HLLA:
        return mag_riemann2d_hll_family(
            params, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR, use_fast=False
        )
    if s == MagneticRiemannSolver.MAG_HLLF:
        return mag_riemann2d_hll_family(
            params, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR, use_fast=True
        )
    if s == MagneticRiemannSolver.MAG_LLF:
        return mag_riemann2d_llf(params, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR)
    raise ValueError(f"unsupported magnetic Riemann solver {s!r}")


# component rotations used by compute_emf (riemann_mhd.h:1098-1109)
_EMF_ROTATION = {
    "z": (IU, IV, IW, IA, IB, IC),
    "y": (IW, IU, IV, IC, IA, IB),
    "x": (IV, IW, IU, IB, IC, IA),
}


def compute_emf(
    params: RunParams,
    qRT, qRB, qLT, qLB,
    emf_dir: str,
    xpos=None,
):
    """EMF at cell corners from the four traced edge states
    (riemann_mhd.h:1056-1193).

    Inputs are corner-aligned arrays: qRT from the lower-left diagonal cell,
    qRB/qLT from the adjacent cells, qLB from the current cell. ``emf_dir``
    in {"x","y","z"} selects the plane's component rotation. ``xpos`` is the
    (broadcastable) x coordinate used by the shearing-box upwind correction.
    """
    iu, iv, iw, ia, ib, ic = _EMF_ROTATION[emf_dir]

    def assemble(src, rho_src):
        """Build a rotated corner state [8,...] from a source edge state."""
        rho = rho_src[ID]
        if params.c_iso > 0:
            p = rho * params.c_iso**2
        else:
            p = rho_src[IP]
        return rho, p, src[iu], src[iv], src[iw], src[ic]

    # corner-quadrant mapping (riemann_mhd.h:1074-1147):
    #   qLL <- qRT, qRL <- qLT, qLR <- qRB, qRR <- qLB
    def build(qsrc):
        rho, p, u, v, w, c = assemble(qsrc, qsrc)
        return [rho, p, u, v, w, None, None, c]

    sLL, sRL, sLR, sRR = build(qRT), build(qLT), build(qRB), build(qLB)

    # first in-plane field: continuity across the x-pairs
    a_bottom = 0.5 * (qRT[ia] + qLT[ia])
    a_top = 0.5 * (qRB[ia] + qLB[ia])
    sLL[5] = a_bottom
    sRL[5] = a_bottom
    sLR[5] = a_top
    sRR[5] = a_top

    # second in-plane field: continuity across the y-pairs
    b_left = 0.5 * (qRT[ib] + qRB[ib])
    b_right = 0.5 * (qLT[ib] + qLB[ib])
    sLL[6] = b_left
    sRL[6] = b_right
    sLR[6] = b_left
    sRR[6] = b_right

    qLL = jnp.stack(sLL)
    qRL = jnp.stack(sRL)
    qLR = jnp.stack(sLR)
    qRR = jnp.stack(sRR)

    eLL = qLL[IU] * qLL[IB] - qLL[IV] * qLL[IA]
    eRL = qRL[IU] * qRL[IB] - qRL[IV] * qRL[IA]
    eLR = qLR[IU] * qLR[IB] - qLR[IV] * qLR[IA]
    eRR = qRR[IU] * qRR[IB] - qRR[IV] * qRR[IA]

    emf = mag_riemann2d(params, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR)

    if params.omega0 > 0 and xpos is not None:
        # shearing-box upwind correction (riemann_mhd.h:1172-1190)
        if emf_dir == "x":
            shear = -1.5 * params.omega0 * xpos
            emf = emf + jnp.where(shear > 0, shear * qLL[IB], shear * qRR[IB])
        elif emf_dir == "z":
            shear = -1.5 * params.omega0 * (xpos - params.dx / 2)
            emf = emf - jnp.where(shear > 0, shear * qLL[IA], shear * qRR[IA])

    return emf
