"""Anchors for the polar stereographic Column projection (q434)."""

import math

import gdal_spark.functions.proj as P


def test_rho_at_standard_parallel_identity():
    # rho(phi_F) == a * m(phi_F) exactly — the defining property of
    # variant B (the implied k0 makes scale true at the standard
    # parallel)
    for lat_ts in (60.0, 71.0, 85.0):
        rho_scale, m_f, t_f, *_ = P._ps_consts(lat_ts)
        assert rho_scale * t_f == P.WGS84_A * m_f


def test_python_replay_roundtrip_grid():
    e = math.sqrt(P._E2)
    rho_scale, m_f, t_f, c2, c4, c6, c8 = P._ps_consts(71.0)

    def fwd(lon, lat):
        phi = math.radians(lat)
        dlam = math.radians(lon)
        t = math.tan(math.pi / 4 - phi / 2) / (
            (1 - e * math.sin(phi)) / (1 + e * math.sin(phi))
        ) ** (e / 2)
        rho = rho_scale * t
        return rho * math.sin(dlam), -rho * math.cos(dlam)

    def inv(E, N):
        rho = math.hypot(E, N)
        chi = math.pi / 2 - 2 * math.atan(rho / rho_scale)
        phi = (chi + c2 * math.sin(2 * chi) + c4 * math.sin(4 * chi)
               + c6 * math.sin(6 * chi) + c8 * math.sin(8 * chi))
        return math.degrees(math.atan2(E, -N)), math.degrees(phi)

    worst = 0.0
    for k in range(200):
        lon = (k * 67) % 360 - 180 + 0.31
        lat = 55 + (k * 41) % 34 + 0.17
        E, N = fwd(lon, lat)
        lo2, la2 = inv(E, N)
        worst = max(worst, abs(lo2 - lon), abs(la2 - lat))
    assert worst < 1e-9  # sub-nanodegree


def test_central_meridian_easting_zero():
    e = math.sqrt(P._E2)
    rho_scale, *_ = P._ps_consts(71.0)
    phi = math.radians(80.0)
    t = math.tan(math.pi / 4 - phi / 2) / (
        (1 - e * math.sin(phi)) / (1 + e * math.sin(phi))
    ) ** (e / 2)
    E = rho_scale * t * math.sin(math.radians(0.0))
    assert E == 0.0
