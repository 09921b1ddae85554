"""Exact solver for the 1D Riemann problem (textbook: Toro ch. 4).

Used as the analytic oracle for Sod-tube validation tests.
"""
from __future__ import annotations

import numpy as np


def exact_riemann(
    rho_l, u_l, p_l, rho_r, u_r, p_r, x, t, x0=0.5, gamma=1.4
):
    """Sampled exact solution (rho, u, p) at positions x and time t."""
    g = gamma
    g1 = (g - 1) / (2 * g)
    g2 = (g + 1) / (2 * g)
    g3 = 2 * g / (g - 1)
    g4 = 2 / (g - 1)
    g5 = 2 / (g + 1)
    g6 = (g - 1) / (g + 1)
    g7 = (g - 1) / 2

    c_l = np.sqrt(g * p_l / rho_l)
    c_r = np.sqrt(g * p_r / rho_r)

    def f_side(p, rho_k, p_k, c_k):
        if p > p_k:  # shock
            a_k = g5 / rho_k
            b_k = g6 * p_k
            return (p - p_k) * np.sqrt(a_k / (p + b_k))
        # rarefaction
        return g4 * c_k * ((p / p_k) ** g1 - 1.0)

    def f(p):
        return f_side(p, rho_l, p_l, c_l) + f_side(p, rho_r, p_r, c_r) + (u_r - u_l)

    # bisection for the star pressure (robust, accuracy ~1e-12)
    p_lo, p_hi = 1e-12, 10 * max(p_l, p_r)
    for _ in range(200):
        p_mid = 0.5 * (p_lo + p_hi)
        if f(p_mid) > 0:
            p_hi = p_mid
        else:
            p_lo = p_mid
    p_star = 0.5 * (p_lo + p_hi)
    u_star = 0.5 * (u_l + u_r) + 0.5 * (
        f_side(p_star, rho_r, p_r, c_r) - f_side(p_star, rho_l, p_l, c_l)
    )

    xi = (np.asarray(x) - x0) / max(t, 1e-300)
    rho = np.empty_like(xi)
    u = np.empty_like(xi)
    p = np.empty_like(xi)

    # left side of contact
    if p_star > p_l:  # left shock
        rho_star_l = rho_l * ((p_star / p_l + g6) / (g6 * p_star / p_l + 1))
        s_l = u_l - c_l * np.sqrt(g2 * p_star / p_l + g1)
        left_mask = xi < s_l
        star_l_mask = (xi >= s_l) & (xi < u_star)
        rho[left_mask], u[left_mask], p[left_mask] = rho_l, u_l, p_l
        rho[star_l_mask], u[star_l_mask], p[star_l_mask] = rho_star_l, u_star, p_star
    else:  # left rarefaction
        rho_star_l = rho_l * (p_star / p_l) ** (1 / g)
        c_star_l = c_l * (p_star / p_l) ** g1
        head, tail = u_l - c_l, u_star - c_star_l
        left_mask = xi < head
        fan_mask = (xi >= head) & (xi < tail)
        star_l_mask = (xi >= tail) & (xi < u_star)
        rho[left_mask], u[left_mask], p[left_mask] = rho_l, u_l, p_l
        u_fan = g5 * (c_l + g7 * u_l + xi[fan_mask])
        c_fan = g5 * (c_l + g7 * (u_l - xi[fan_mask]))
        rho[fan_mask] = rho_l * (c_fan / c_l) ** g4
        u[fan_mask] = u_fan
        p[fan_mask] = p_l * (c_fan / c_l) ** g3
        rho[star_l_mask], u[star_l_mask], p[star_l_mask] = rho_star_l, u_star, p_star

    # right side of contact
    if p_star > p_r:  # right shock
        rho_star_r = rho_r * ((p_star / p_r + g6) / (g6 * p_star / p_r + 1))
        s_r = u_r + c_r * np.sqrt(g2 * p_star / p_r + g1)
        right_mask = xi >= s_r
        star_r_mask = (xi >= u_star) & (xi < s_r)
        rho[right_mask], u[right_mask], p[right_mask] = rho_r, u_r, p_r
        rho[star_r_mask], u[star_r_mask], p[star_r_mask] = rho_star_r, u_star, p_star
    else:  # right rarefaction
        rho_star_r = rho_r * (p_star / p_r) ** (1 / g)
        c_star_r = c_r * (p_star / p_r) ** g1
        head, tail = u_r + c_r, u_star + c_star_r
        right_mask = xi >= head
        fan_mask = (xi >= tail) & (xi < head)
        star_r_mask = (xi >= u_star) & (xi < tail)
        rho[right_mask], u[right_mask], p[right_mask] = rho_r, u_r, p_r
        u_fan = g5 * (-c_r + g7 * u_r + xi[fan_mask])
        c_fan = g5 * (c_r - g7 * (u_r - xi[fan_mask]))
        rho[fan_mask] = rho_r * (c_fan / c_r) ** g4
        u[fan_mask] = u_fan
        p[fan_mask] = p_r * (c_fan / c_r) ** g3
        rho[star_r_mask], u[star_r_mask], p[star_r_mask] = rho_star_r, u_star, p_star

    return rho, u, p


def sod_exact(x, t, gamma=1.4, x0=0.5):
    return exact_riemann(1.0, 0.0, 1.0, 0.125, 0.0, 0.1, x, t, x0=x0, gamma=gamma)
