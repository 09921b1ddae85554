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


def _fast_speed_precursors(params: RunParams, d, p, a, b, c, xp=None):
    """The bn-independent part of the fast-speed formula: (d2, cb, inv_d)
    with cb = c2/d. One state evaluated against several normal directions
    (the 2D corner solvers probe x and y) shares these."""
    if xp is None:
        from .backend import JNP as xp
    b2 = a * a + b * b + c * c
    inv_d = 1.0 / d
    c2 = params.gamma0 * p * inv_d
    d2 = 0.5 * (b2 * inv_d + c2)
    return d2, c2 * inv_d, inv_d


def _fast_speed_from_precursors(pre, bn, xp=None):
    if xp is None:
        from .backend import JNP as xp
    d2, cb, _ = pre
    return xp.sqrt(d2 + xp.sqrt(xp.maximum(d2 * d2 - cb * (bn * bn), 0.0)))


def _fast_speed_components(params: RunParams, d, p, a, b, c, bn=None, xp=None):
    """Fast magnetosonic speed from explicit components; ``bn`` defaults to
    ``a`` (mhd_utils.h:30-52). One division (hoisted 1/d) instead of the
    literal three — same formula, ULP-level rounding differences only."""
    if xp is None:
        from .backend import JNP as xp
    if bn is None:
        bn = a
    pre = _fast_speed_precursors(params, d, p, a, b, c, xp=xp)
    return _fast_speed_from_precursors(pre, bn, xp=xp)


def _fast_speed(params: RunParams, q, bn, xp=None):
    """Fast magnetosonic speed given normal field bn (mhd_utils.h:30-52)."""
    if xp is None:
        from .backend import JNP as xp
    d = q[ID]
    p = q[ID] * params.c_iso**2 if params.c_iso > 0 else q[IP]
    return _fast_speed_components(params, d, p, q[IA], q[IB], q[IC], bn, xp=xp)


def _find_mhd_flux(params: RunParams, q, xp=None):
    """Conservative state and flux from a primitive state
    (mhd_utils.h:106-168). Gas pressure folded into the normal-momentum flux."""
    if xp is None:
        from .backend import JNP as xp
    entho = 1.0 / (params.gamma0 - 1.0)
    d, u, v, w = q[ID], q[IU], q[IV], q[IW]
    a, b, c = q[IA], q[IB], q[IC]
    p = d * params.c_iso**2 if params.c_iso > 0 else q[IP]
    ecin = 0.5 * (u * u + v * v + w * w) * d
    emag = 0.5 * (a * a + b * b + c * c)
    etot = p * entho + ecin + emag
    ptot = p + emag
    cons = xp.stack([d, etot, d * u, d * v, d * w, a, b, c])
    flux = xp.stack(
        [
            d * u,
            (etot + ptot) * u - a * (a * u + b * v + c * w),
            d * u * u - a * a + ptot,
            d * u * v - a * b,
            d * u * w - a * c,
            xp.zeros_like(d),
            b * u - a * v,
            c * u - a * w,
        ]
    )
    return cons, flux


def _find_speed_info(params: RunParams, q, xp=None):
    """Fastest information speed along the normal: cf_x + |u|
    (mhd_utils.h:296-316)."""
    if xp is None:
        from .backend import JNP as xp
    return _fast_speed(params, q, q[IA], xp=xp) + xp.abs(q[IU])


def riemann_llf_mhd(params: RunParams, ql, qr, xp=None):
    """Local Lax-Friedrichs MHD solver (riemann_mhd.h:87-119)."""
    if xp is None:
        from .backend import JNP as xp
    bx_mean = 0.5 * (ql[IA] + qr[IA])
    ql = xp.set_component(ql, IA, bx_mean)
    qr = xp.set_component(qr, IA, bx_mean)

    ul, fl = _find_mhd_flux(params, ql, xp=xp)
    ur, fr = _find_mhd_flux(params, qr, xp=xp)
    vel_info = xp.maximum(_find_speed_info(params, ql, xp=xp), _find_speed_info(params, qr, xp=xp))
    return 0.5 * (fl + fr) - 0.5 * vel_info * (ur - ul)


def riemann_hll_mhd(params: RunParams, ql, qr, xp=None):
    """HLL for MHD: single-state HLL average built from the full MHD fluxes."""
    if xp is None:
        from .backend import JNP as xp
    bx_mean = 0.5 * (ql[IA] + qr[IA])
    ql = xp.set_component(ql, IA, bx_mean)
    qr = xp.set_component(qr, IA, bx_mean)

    cl, fl = _find_mhd_flux(params, ql, xp=xp)
    cr, fr = _find_mhd_flux(params, qr, xp=xp)
    cfl = _fast_speed(params, ql, bx_mean, xp=xp)
    cfr = _fast_speed(params, qr, bx_mean, xp=xp)
    SL = xp.minimum(xp.minimum(ql[IU], qr[IU]) - xp.maximum(cfl, cfr), 0.0)
    SR = xp.maximum(xp.maximum(ql[IU], qr[IU]) + xp.maximum(cfl, cfr), 0.0)
    return (SR * fl - SL * fr + SR * SL * (cr - cl)) / (SR - SL)


def riemann_hlld(params: RunParams, ql, qr, xp=None):
    """HLLD MHD solver (riemann_mhd.h:140-342; Miyoshi & Kusano 2005).

    Five-wave fan (SL, SAL, ustar contact, SAR, SR); the degenerate-Alfven
    branch of the reference (|estar/a^2 - 1| <= 1e-8) becomes a where-select.
    """
    if xp is None:
        from .backend import JNP as xp
    entho = 1.0 / (params.gamma0 - 1.0)

    a = 0.5 * (ql[IA] + qr[IA])
    sgnm = xp.where(a >= 0.0, 1.0, -1.0).astype(a.dtype)

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
        cfast = _fast_speed_components(params, r, p, a, b, c, xp=xp)
        return r, p, u, v, w, b, c, etot, ptot, vdotb, cfast

    rl, pl, ul, vl, wl, bl, cl, etotl, ptotl, vdotbl, cfastl = prep(ql)
    rr, pr, ur, vr, wr, br, cr, etotr, ptotr, vdotbr, cfastr = prep(qr)

    sl = xp.minimum(ul, ur) - xp.maximum(cfastl, cfastr)
    sr = xp.maximum(ul, ur) + xp.maximum(cfastl, cfastr)

    rcl = rl * (ul - sl)
    rcr = rr * (sr - ur)

    # shared reciprocals throughout this solver: the VPU's divide rides
    # the slow (transcendental) pipe, and the literal per-expression form
    # costs ~26 divides per face interface; hoisting repeated
    # denominators cuts that to ~8 at ULP-level rounding differences
    inv_rc = 1.0 / (rcr + rcl)
    ustar = (rcr * ur + rcl * ul + (ptotl - ptotr)) * inv_rc
    ptotstar = (rcr * ptotl + rcl * ptotr + rcl * rcr * (ul - ur)) * inv_rc

    def star(r_, u_, v_, w_, b_, c_, etot_, ptot_, vdotb_, s_):
        inv_su = 1.0 / (s_ - ustar)
        rstar = r_ * (s_ - u_) * inv_su
        estar = r_ * (s_ - u_) * (s_ - ustar) - a * a
        el = r_ * (s_ - u_) * (s_ - u_) - a * a
        degenerate = xp.logical_and(a * a > 0, xp.abs(estar / (a * a + 1e-300) - 1.0) <= 1e-8)
        # avoid 0/0 in the masked-out branch
        estar_safe = xp.where(estar == 0.0, 1.0, estar)
        inv_estar = 1.0 / estar_safe
        k = a * (ustar - u_) * inv_estar
        el_ratio = el * inv_estar
        vstar = xp.where(degenerate, v_, v_ - b_ * k)
        bstar = xp.where(degenerate, b_, b_ * el_ratio)
        wstar = xp.where(degenerate, w_, w_ - c_ * k)
        cstar = xp.where(degenerate, c_, c_ * el_ratio)
        vdotbstar = ustar * a + vstar * bstar + wstar * cstar
        etotstar = (
            (s_ - u_) * etot_ - ptot_ * u_ + ptotstar * ustar + a * (vdotb_ - vdotbstar)
        ) * inv_su
        inv_sqrtr = xp.rsqrt(rstar)
        sqrtr = rstar * inv_sqrtr
        calfven = xp.abs(a) * inv_sqrtr
        return rstar, vstar, wstar, bstar, cstar, vdotbstar, etotstar, sqrtr, calfven

    (rstarl, vstarl, wstarl, bstarl, cstarl, vdotbstarl, etotstarl, sqrl, calfl) = star(
        rl, ul, vl, wl, bl, cl, etotl, ptotl, vdotbl, sl
    )
    (rstarr, vstarr, wstarr, bstarr, cstarr, vdotbstarr, etotstarr, sqrr, calfr) = star(
        rr, ur, vr, wr, br, cr, etotr, ptotr, vdotbr, sr
    )
    sal = ustar - calfl
    sar = ustar + calfr

    inv_denom = 1.0 / (sqrl + sqrr)
    vss = (sqrl * vstarl + sqrr * vstarr + sgnm * (bstarr - bstarl)) * inv_denom
    wss = (sqrl * wstarl + sqrr * wstarr + sgnm * (cstarr - cstarl)) * inv_denom
    bss = (sqrl * bstarr + sqrr * bstarl + sgnm * sqrl * sqrr * (vstarr - vstarl)) * inv_denom
    css = (sqrl * cstarr + sqrr * cstarl + sgnm * sqrl * sqrr * (wstarr - wstarl)) * inv_denom
    vdotbss = ustar * a + vss * bss + wss * css
    etotssl = etotstarl - sgnm * sqrl * (vdotbstarl - vdotbss)
    etotssr = etotstarr + sgnm * sqrr * (vdotbstarr - vdotbss)

    # sample the 6-zone fan from the outside in (reference's if/else ladder
    # becomes nested selects evaluated innermost-first)
    def pick(sel, a_, b_):
        return xp.where(sel, a_, b_)

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

    return xp.stack(
        [
            ro * uo,
            (etoto + ptoto) * uo - a * vdotbo,
            ro * uo * uo - a * a + ptoto,
            ro * uo * vo - a * bo,
            ro * uo * wo - a * co,
            xp.zeros_like(ro),
            bo * uo - a * vo,
            co * uo - a * wo,
        ]
    )


def riemann_mhd(params: RunParams, ql, qr, xp=None):
    """Dispatch on the configured solver (riemann_mhd.h:355-368)."""
    if xp is None:
        from .backend import JNP as xp
    if params.riemann_solver == RiemannSolver.HLLD:
        return riemann_hlld(params, ql, qr, xp=xp)
    if params.riemann_solver == RiemannSolver.LLF:
        return riemann_llf_mhd(params, ql, qr, xp=xp)
    if params.riemann_solver == RiemannSolver.HLL:
        return riemann_hll_mhd(params, ql, qr, xp=xp)
    raise ValueError(f"unsupported MHD Riemann solver: {params.riemann_solver!r}")


# --------------------------------------------------------------------------- #
# 2D corner solvers for the EMF
# --------------------------------------------------------------------------- #
def _minmax4(xp, *a):
    lo = a[0]
    hi = a[0]
    for x in a[1:]:
        lo = xp.minimum(lo, x)
        hi = xp.maximum(hi, x)
    return lo, hi


def mag_riemann2d_hlld(params: RunParams, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR, xp=None):
    """2D HLLD corner solver (riemann_mhd.h:616-828).

    States are in the 2D convention: IU/IV in-plane velocities, IA/IB
    in-plane fields (continuity already enforced by the caller), IC the
    out-of-plane field. Returns the EMF at the corner.
    """
    if xp is None:
        from .backend import JNP as xp
    smallc = params.smallc

    # each corner state's fast speed is probed along BOTH in-plane
    # normals; the bn-independent precursors (1/d, c2, d2) are shared
    def pre(q):
        d = q[ID]
        p = d * params.c_iso**2 if params.c_iso > 0 else q[IP]
        return _fast_speed_precursors(
            params, d, p, q[IA], q[IB], q[IC], xp=xp
        )

    pres = [pre(q) for q in (qLL, qLR, qRL, qRR)]
    cfx = [
        _fast_speed_from_precursors(pr, q[IA], xp=xp)
        for pr, q in zip(pres, (qLL, qLR, qRL, qRR))
    ]
    cfy = [
        _fast_speed_from_precursors(pr, q[IB], xp=xp)
        for pr, q in zip(pres, (qLL, qLR, qRL, qRR))
    ]

    ulo, uhi = _minmax4(xp, qLL[IU], qLR[IU], qRL[IU], qRR[IU])
    vlo, vhi = _minmax4(xp, qLL[IV], qLR[IV], qRL[IV], qRR[IV])
    _, cxmax = _minmax4(xp, *cfx)
    _, cymax = _minmax4(xp, *cfy)

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
        # the two jump ratios are each consumed 2-3 times; computing
        # them once cuts 5 divides to 2 per corner (ULP-equivalent)
        ratio_x = (Sx - u) / (Sx - ustar)
        ratio_y = (Sy - v) / (Sy - vstar)
        rstarx = r * ratio_x
        Bstar = b_ * ratio_x
        rstary = r * ratio_y
        Astar = a_ * ratio_y
        rstar = rstarx * ratio_y
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
        return xp.maximum(xp.maximum(xp.maximum(a0, a1), xp.maximum(a2, a3)), a4)

    # |B|/sqrt(rho) as |B|*rsqrt(rho): one slow-pipe op instead of a
    # sqrt AND a divide per term (16 of each per corner otherwise);
    # the four shared 1/sqrt(rs**) center densities computed once
    rq = xp.rsqrt
    rqLL, rqLR, rqRL, rqRR = rq(rsLL), rq(rsLR), rq(rsRL), rq(rsRR)
    calfvenL = max5(
        xp.abs(aLR) * rq(rsLRx), xp.abs(AstarLR) * rqLR,
        xp.abs(aLL) * rq(rsLLx), xp.abs(AstarLL) * rqLL,
        xp.full_like(aLL, smallc),
    )
    calfvenR = max5(
        xp.abs(aRR) * rq(rsRRx), xp.abs(AstarRR) * rqRR,
        xp.abs(aRL) * rq(rsRLx), xp.abs(AstarRL) * rqRL,
        xp.full_like(aLL, smallc),
    )
    calfvenB = max5(
        xp.abs(bLL) * rq(rsLLy), xp.abs(BstarLL) * rqLL,
        xp.abs(bRL) * rq(rsRLy), xp.abs(BstarRL) * rqRL,
        xp.full_like(aLL, smallc),
    )
    calfvenT = max5(
        xp.abs(bLR) * rq(rsLRy), xp.abs(BstarLR) * rqLR,
        xp.abs(bRR) * rq(rsRRy), xp.abs(BstarRR) * rqRR,
        xp.full_like(aLL, smallc),
    )

    SAL = xp.minimum(ustar - calfvenL, 0.0)
    SAR = xp.maximum(ustar + calfvenR, 0.0)
    SAB = xp.minimum(vstar - calfvenB, 0.0)
    SAT = xp.maximum(vstar + calfvenT, 0.0)

    # the two Alfven-fan widths divide eleven expressions below
    inv_dsx = 1.0 / (SAR - SAL)
    inv_dsy = 1.0 / (SAT - SAB)
    AstarT = (SAR * AstarRR - SAL * AstarLR) * inv_dsx
    AstarB = (SAR * AstarRL - SAL * AstarLL) * inv_dsx
    BstarR = (SAT * BstarRR - SAB * BstarRL) * inv_dsy
    BstarL = (SAT * BstarLR - SAB * BstarLL) * inv_dsy

    # central (subsonic in both directions) HLLD EMF
    E_center = (
        (SAL * SAB * EstarRR - SAL * SAT * EstarRL - SAR * SAB * EstarLR + SAR * SAT * EstarLL)
        * inv_dsx * inv_dsy
        - SAT * SAB * inv_dsy * (AstarT - AstarB)
        + SAR * SAL * inv_dsx * (BstarR - BstarL)
    )

    # supersonic-in-y branches collapse to 1D HLL problems in x (and vice versa)
    E_B = (SAR * EstarLLx - SAL * EstarRLx + SAR * SAL * (bRL - bLL)) * inv_dsx
    E_B = xp.where(SL > 0, eLL, xp.where(SR < 0, eRL, E_B))
    E_T = (SAR * EstarLRx - SAL * EstarRRx + SAR * SAL * (bRR - bLR)) * inv_dsx
    E_T = xp.where(SL > 0, eLR, xp.where(SR < 0, eRR, E_T))
    E_L = (SAT * EstarLLy - SAB * EstarLRy - SAT * SAB * (aLR - aLL)) * inv_dsy
    E_R = (SAT * EstarRLy - SAB * EstarRRy - SAT * SAB * (aRR - aRL)) * inv_dsy

    E = xp.where(
        SB > 0,
        E_B,
        xp.where(
            ST < 0,
            E_T,
            xp.where(SL > 0, E_L, xp.where(SR < 0, E_R, E_center)),
        ),
    )
    return E


def mag_riemann2d_hll_family(params: RunParams, qLL, qRL, qLR, qRR,
                             eLL, eRL, eLR, eRR, use_fast: bool, xp=None):
    """HLLA (Alfven speeds) / HLLF (fast speeds) corner solvers
    (riemann_mhd.h:418-516): a 2D-HLL average of the four corner EMFs plus
    dissipation on the in-plane field jumps."""
    if xp is None:
        from .backend import JNP as xp
    if use_fast:
        cx = [_fast_speed(params, q, q[IA], xp=xp) for q in (qLL, qLR, qRL, qRR)]
        cy = [_fast_speed(params, q, q[IB], xp=xp) for q in (qLL, qLR, qRL, qRR)]
        cxmax = xp.maximum(xp.maximum(cx[0], cx[1]), xp.maximum(cx[2], cx[3]))
        cymax = xp.maximum(xp.maximum(cy[0], cy[1]), xp.maximum(cy[2], cy[3]))
    else:
        def alfven(q, idx):
            return xp.sqrt(q[idx] ** 2 / q[ID])

        cx = [alfven(q, IA) for q in (qLL, qLR, qRL, qRR)]
        cy = [alfven(q, IB) for q in (qLL, qLR, qRL, qRR)]
        smallc = params.smallc
        cxmax = xp.maximum(
            xp.maximum(xp.maximum(cx[0], cx[1]), xp.maximum(cx[2], cx[3])), smallc
        )
        cymax = xp.maximum(
            xp.maximum(xp.maximum(cy[0], cy[1]), xp.maximum(cy[2], cy[3])), smallc
        )

    ulo, uhi = _minmax4(xp, qLL[IU], qLR[IU], qRL[IU], qRR[IU])
    vlo, vhi = _minmax4(xp, qLL[IV], qLR[IV], qRL[IV], qRR[IV])
    SL = xp.minimum(ulo - cxmax, 0.0)
    SR = xp.maximum(uhi + cxmax, 0.0)
    SB = xp.minimum(vlo - cymax, 0.0)
    ST = xp.maximum(vhi + cymax, 0.0)

    return (
        (SL * SB * eRR - SL * ST * eRL - SR * SB * eLR + SR * ST * eLL)
        / (SR - SL) / (ST - SB)
        - ST * SB / (ST - SB) * (qRR[IA] - qLL[IA])
        + SR * SL / (SR - SL) * (qRR[IB] - qLL[IB])
    )


def mag_riemann2d_llf(params: RunParams, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR, xp=None):
    """2D LLF corner solver (riemann_mhd.h:519-613): mean EMF plus
    LLF dissipation on the in-plane field jumps."""
    if xp is None:
        from .backend import JNP as xp
    E = 0.25 * (eLL + eRL + eLR + eRR)

    def info(q, bn_idx, v_idx):
        return _fast_speed(params, q, q[bn_idx], xp=xp) + xp.abs(q[v_idx])

    cx = [info(q, IA, IU) for q in (qLL, qLR, qRL, qRR)]
    cy = [info(q, IB, IV) for q in (qLL, qLR, qRL, qRR)]
    vel_x = xp.maximum(xp.maximum(cx[0], cx[1]), xp.maximum(cx[2], cx[3]))
    vel_y = xp.maximum(xp.maximum(cy[0], cy[1]), xp.maximum(cy[2], cy[3]))

    return (
        E
        - 0.5 * vel_y * (qRR[IA] - qLL[IA])
        + 0.5 * vel_x * (qRR[IB] - qLL[IB])
    )


def mag_riemann2d(params: RunParams, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR, xp=None):
    """Dispatch on [MHD] magRiemannSolver (compute_emf, riemann_mhd.h:1160-1170)."""
    if xp is None:
        from .backend import JNP as xp
    s = params.mag_riemann_solver
    if s == MagneticRiemannSolver.MAG_HLLD:
        return mag_riemann2d_hlld(params, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR, xp=xp)
    if s == MagneticRiemannSolver.MAG_HLLA:
        return mag_riemann2d_hll_family(
            params, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR, use_fast=False, xp=xp
        )
    if s == MagneticRiemannSolver.MAG_HLLF:
        return mag_riemann2d_hll_family(
            params, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR, use_fast=True, xp=xp
        )
    if s == MagneticRiemannSolver.MAG_LLF:
        return mag_riemann2d_llf(params, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR, xp=xp)
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
    xp=None,
):
    """EMF at cell corners from the four traced edge states
    (riemann_mhd.h:1056-1193).

    Inputs are corner-aligned arrays: qRT from the lower-left diagonal cell,
    qRB/qLT from the adjacent cells, qLB from the current cell. ``emf_dir``
    in {"x","y","z"} selects the plane's component rotation. ``xpos`` is the
    (broadcastable) x coordinate used by the shearing-box upwind correction.
    """
    if xp is None:
        from .backend import JNP as xp
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

    qLL = xp.stack(sLL)
    qRL = xp.stack(sRL)
    qLR = xp.stack(sLR)
    qRR = xp.stack(sRR)

    eLL = qLL[IU] * qLL[IB] - qLL[IV] * qLL[IA]
    eRL = qRL[IU] * qRL[IB] - qRL[IV] * qRL[IA]
    eLR = qLR[IU] * qLR[IB] - qLR[IV] * qLR[IA]
    eRR = qRR[IU] * qRR[IB] - qRR[IV] * qRR[IA]

    emf = mag_riemann2d(params, qLL, qRL, qLR, qRR, eLL, eRL, eLR, eRR, xp=xp)

    if params.omega0 > 0 and xpos is not None:
        # shearing-box upwind correction (riemann_mhd.h:1172-1190)
        if emf_dir == "x":
            shear = -1.5 * params.omega0 * xpos
            emf = emf + xp.where(shear > 0, shear * qLL[IB], shear * qRR[IB])
        elif emf_dir == "z":
            shear = -1.5 * params.omega0 * (xpos - params.dx / 2)
            emf = emf - xp.where(shear > 0, shear * qLL[IA], shear * qRR[IA])

    return emf
