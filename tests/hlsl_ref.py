"""Independent scalar numpy transcription of the renderer spec.

This is a deliberately naive, per-pixel, per-scalar implementation written
directly from the spec (CSVersion/ShaderCompute.hlsl semantics + the
counter-based u32 RNG redesign documented in raytpu/rng.py) — a SECOND
implementation sharing no code with raytpu/, used as the cross-check oracle
for the vectorized golden renderer and the Pallas kernels.  Geometry runs in
float64 so it also bounds the f32 pipelines' numerical error; the RNG core
is exact u32 arithmetic and must match bitwise.
"""

from __future__ import annotations

import numpy as np

F = np.float32
U = np.uint32
K = U(1103515245)

np.seterr(over="ignore")  # uint32 wraparound is intended


def base_hash(px: int, py: int) -> np.uint32:
    px, py = U(px), U(py)
    hx = K * ((px >> U(1)) ^ py)
    hy = K * ((py >> U(1)) ^ px)
    h32 = K * (hx ^ (hy >> U(3)))
    return h32 ^ (h32 >> U(16))


WEYL = U(0x9E3779B9)


def fmix32(h: np.uint32) -> np.uint32:
    h = U(h)
    h = U(h ^ (h >> U(16)))
    h = U(h * U(0x85EBCA6B))
    h = U(h ^ (h >> U(13)))
    h = U(h * U(0xC2B2AE35))
    h = U(h ^ (h >> U(16)))
    return h


def _draw(seed: np.uint32):
    s = U(U(seed) + WEYL)
    return fmix32(s), s


def hash1(seed):
    # top 24 bits: mantissa-exact in f32 (see raytpu/rng.py hash1)
    n, seed = _draw(seed)
    return F(F(n >> U(8)) / F(16777216.0)), seed


def hash2(seed):
    n, seed = _draw(seed)
    n2 = U(n * U(48271))
    m = U(0x7FFFFFFF)
    return (F(F(n & m) / F(0x7FFFFFFF)), F(F(n2 & m) / F(0x7FFFFFFF))), seed


def hash3(seed):
    n, seed = _draw(seed)
    n2 = U(n * U(16807))
    n3 = U(n * U(48271))
    m = U(0x7FFFFFFF)
    return (F(F(n & m) / F(0x7FFFFFFF)),
            F(F(n2 & m) / F(0x7FFFFFFF)),
            F(F(n3 & m) / F(0x7FFFFFFF))), seed


def random_in_unit_sphere(seed):
    (a, b, c), seed = hash3(seed)
    hx = a * 2.0 - 1.0
    phi = b * 6.28318530718
    r = c ** (1.0 / 3.0)
    s = np.sqrt(max(1.0 - hx * hx, 0.0))
    return np.array([r * s * np.sin(phi), r * s * np.cos(phi), r * hx],
                    np.float64), seed


def random_in_unit_disk(seed):
    (a, b), seed = hash2(seed)
    phi = b * 6.28318530718
    r = np.sqrt(a)
    return np.array([r * np.sin(phi), r * np.cos(phi)], np.float64), seed


def hit_world(spheres, ro, rd, t_min, t_max):
    """Sequential closest-hit loop (ref: hlsl:188-205).

    spheres: list of (center(3,), radius). Returns (hit, t, idx) with the
    reference's literal shrinking-t_max semantics.
    """
    hit, closest, best = False, t_max, -1
    for i, (c, r) in enumerate(spheres):
        oc = ro - c
        a = rd @ rd
        half_b = oc @ rd
        cc = oc @ oc - r * r
        d = half_b * half_b - a * cc
        if d < 0:
            continue
        sq = np.sqrt(d)
        root = (-half_b - sq) / a
        if root < t_min or closest < root:
            root = (-half_b + sq) / a
            if root < t_min or closest < root:
                continue
        hit, closest, best = True, root, i
    return hit, closest, best


def render_pixel(scene, cam, px, py, width, height, spp, depth,
                 scatter_mode="v2"):
    """Render one pixel with float64 geometry / f32 RNG (ref: CSMain).

    scene: dict(center (N,3), radius (N,), mat_type (N,), albedo (N,3),
    mat_param (N,)); cam: dict(origin, horizontal, vertical, lower_left,
    u, v, lens_radius) as float arrays.
    """
    spheres = [(np.asarray(scene["center"][i], np.float64),
                float(scene["radius"][i]))
               for i in range(len(scene["radius"]))]
    seed = base_hash(px, py)
    acc = np.zeros(3)
    for _ in range(spp):
        (j1a, _), seed = hash2(seed)
        (_, j2b), seed = hash2(seed)
        u = (px + j1a * 1.1) / (width - 1)
        v = (py + j2b * 1.1) / (height - 1)
        ro = np.asarray(cam["origin"], np.float64).copy()
        if cam.get("lens_radius", 0.0) > 0:
            (dx, dy), seed = random_in_unit_disk(seed)
            rd_off = (cam["lens_radius"] * dx * np.asarray(cam["u"])
                      + cam["lens_radius"] * dy * np.asarray(cam["v"]))
            ro = ro + rd_off
        rd = (np.asarray(cam["lower_left"], np.float64)
              + u * np.asarray(cam["horizontal"], np.float64)
              + v * np.asarray(cam["vertical"], np.float64) - ro)
        col, seed = _sample_color(scene, spheres, ro, rd, seed, depth,
                                  scatter_mode)
        acc += col
    acc /= spp
    return np.clip(acc, 0, None) ** (1.0 / 2.2)


def _hemisphere(s, n):
    # Shader_RT.fx:151-163: sphere sample flipped into n's hemisphere
    return s if s @ n > 0 else -s


def _sample_color(scene, spheres, ro, rd, seed, depth, scatter_mode="v2",
                  fixed_draws=None):
    col = np.ones(3)
    for _ in range(depth):
        hit, t, idx = hit_world(spheres, ro, rd, 1e-3, np.inf)
        if not hit:
            ud = rd / np.linalg.norm(rd)
            tt = 0.5 * (ud[1] + 1.0)
            sky = (1 - tt) * np.ones(3) + tt * np.array([0.5, 0.7, 1.0])
            return col * sky, seed
        p = ro + t * rd
        c, r = spheres[idx]
        n = (p - c) / r
        front = rd @ n < 0
        if not front:
            n = -n
        mat = int(scene["mat_type"][idx])
        if mat == 0:
            if fixed_draws is not None:
                s = fixed_draws[0]
            else:
                s, seed = random_in_unit_sphere(seed)
            if scatter_mode == "v1":
                # Shader_RT.fx:217-229: n + hemisphere, near-zero guard,
                # UNnormalized
                d = n + _hemisphere(s, n)
                if (abs(d) < 1e-8).all():
                    d = n.copy()
            else:
                d = n + s
                d = d / np.linalg.norm(d)
            col = col * np.asarray(scene["albedo"][idx])
        elif mat == 1:
            if fixed_draws is not None:
                s = fixed_draws[0]
            else:
                s, seed = random_in_unit_sphere(seed)
            if scatter_mode == "v1":
                # Shader_RT.fx:233-241: reflect the NORMALIZED dir,
                # saturate fuzz, hemisphere sample, no normalize
                ud = rd / np.linalg.norm(rd)
                refl = ud - 2 * (ud @ n) * n
                fz = min(max(float(scene["mat_param"][idx]), 0.0), 1.0)
                d = refl + fz * _hemisphere(s, n)
            else:
                refl = rd - 2 * (rd @ n) * n
                d = refl + scene["mat_param"][idx] * s
                d = d / np.linalg.norm(d)
            col = col * np.asarray(scene["albedo"][idx])
        elif mat == 2:
            ior = float(scene["mat_param"][idx])
            ratio = (1.0 / ior) if front else ior
            ud = rd / np.linalg.norm(rd)
            cosine = min(-ud @ n, 1.0)
            sine = np.sqrt(max(1.0 - cosine * cosine, 0.0))
            if fixed_draws is not None:
                h1 = fixed_draws[1]
            else:
                h1, seed = hash1(seed)
            r0 = ((1 - ratio) / (1 + ratio)) ** 2
            refl_p = r0 + (1 - r0) * (1 - cosine) ** 5
            if ratio * sine > 1.0 or refl_p > h1:
                d = ud - 2 * (ud @ n) * n
            else:
                perp = ratio * (ud + cosine * n)
                par = -np.sqrt(abs(1.0 - perp @ perp)) * n
                d = perp + par
        else:
            return np.zeros(3), seed
        ro, rd = p, d
    return np.zeros(3), seed


# ---- v1 fract-sin RNG + PS_Main flow (ref: Shader_RT.fx) ----

_PI_A = F(3.140625)
_PI_B = F(9.6750259399414062e-4)
_PI_C = F(1.2154201256553420e-10)
_SINC = [F(2.7525562e-6), F(-1.9840874e-4), F(8.3333310e-3),
         F(-1.6666667e-1)]


def _fma32(a, b, c):
    """f32 fused multiply-add mirror: the f32 product is exact in f64
    and the one rounding happens at the final f32 cast (double-rounding
    cases need > 53 significant bits — unreachable for these
    operands)."""
    return F(np.float64(a) * np.float64(b) + np.float64(c))


def fs_sin(x):
    """The spec's PINNED f32 sine (twin of raytpu.rng.fs_sin — see its
    docstring: libm sines differ by ulps that the * 43758 chain
    amplifies chaotically, so the spec fixes one implementation)."""
    x = F(x)
    n = F(np.floor(F(_fma32(x, F(1.0 / np.pi), F(0.5)))))
    r = F(F(_fma32(n, -_PI_A, x) - F(n * _PI_B)) - F(n * _PI_C))
    r2 = F(r * r)
    p = _SINC[0]
    for c in _SINC[1:]:
        p = _fma32(p, r2, c)
    s = _fma32(r, F(r2 * p), r)
    sign = F(1.0) if (int(n) % 2 == 0) else F(-1.0)
    return F(s * sign)


def fs_rand2d(st):
    """One rand2d draw (Shader_RT.fx:106-112), f32 throughout, with the
    spec's pinned sine."""
    x, y = st
    x = F(fs_sin(F(x * F(12.9898)) + F(y * F(78.233))) * F(43758.5453))
    x = F(x - np.floor(x))
    y = F(fs_sin(F(x * F(12.9898)) + F(y * F(78.233))) * F(43758.5453))
    y = F(y - np.floor(y))
    return x, (x, y)


def fs_unit_sphere(st, rand2d=None):
    """:119-133 — BY-VALUE state (caller's st unchanged).  ``rand2d``
    lets the cross-check inject the vectorized implementation's draws:
    the fract(sin*43758) chain amplifies 1-ulp libm differences to
    ~2.6e-3 per draw (then diverges chaotically), so bitwise parity
    across sin implementations is impossible BY CONSTRUCTION — the
    oracle therefore validates the FLOW (state threading, by-value
    semantics, draw wiring) on common draw values."""
    rand2d = rand2d or fs_rand2d
    r1, st2 = rand2d(st)
    r2, st2 = rand2d(st2)
    r3, _ = rand2d(st2)
    phi = 2.0 * np.pi * float(r1)
    cos_t = 2.0 * float(r2) - 1.0
    theta = np.arccos(cos_t)
    r = float(r3) ** (1.0 / 3.0)
    return np.array([r * np.sin(theta) * np.cos(phi),
                     r * np.sin(theta) * np.sin(phi),
                     r * np.cos(theta)], np.float64)


def fs_unit_disk(st, rand2d=None):
    """:135-144 — BY-VALUE; the reference's x = cos(cosTheta) /
    y = cos(sinTheta) quirk is the spec."""
    rand2d = rand2d or fs_rand2d
    r1, st2 = rand2d(st)
    r2, _ = rand2d(st2)
    sin_t = 2.0 * float(r1) - 1.0
    cos_t = 2.0 * float(r2) - 1.0
    return np.array([np.cos(cos_t), np.cos(sin_t)], np.float64)


def render_pixel_v1_fractsin(scene, cam, px, py, width, height, spp,
                             depth, rand2d=None):
    """PS_Main transcription (:419-455): float2 state = pixel texcoord;
    only the two jitter draws advance it; get_ray's lens offset and
    every bounce's draws derive BY VALUE from the post-jitter state —
    so all bounces of a path share one sphere draw and one Schlick
    draw.  sqrt (gamma-2) output."""
    spheres = [(np.asarray(scene["center"][i], np.float64),
                float(scene["radius"][i]))
               for i in range(len(scene["radius"]))]
    rand2d = rand2d or fs_rand2d
    # the float2 state chain must be f32 END-TO-END (1 ulp in the seed
    # diverges the whole stream): texcoord = (px + 0.5f) / W in f32
    st = (F(F(F(px) + F(0.5)) / F(width)),
          F(F(F(py) + F(0.5)) / F(height)))
    acc = np.zeros(3)
    for _ in range(spp):
        j1, st = rand2d(st)
        j2, st = rand2d(st)
        u = (px + 0.5 + float(j1)) / width      # jitter over W (:433)
        v = (py + 0.5 + float(j2)) / height
        ld = fs_unit_disk(st, rand2d)
        lr = float(cam.get("lens_radius", 0.0))
        ro = (np.asarray(cam["origin"], np.float64)
              + lr * (ld[0] * np.asarray(cam["u"], np.float64)
                      + ld[1] * np.asarray(cam["v"], np.float64)))
        rd = (np.asarray(cam["lower_left"], np.float64)
              + u * np.asarray(cam["horizontal"], np.float64)
              + v * np.asarray(cam["vertical"], np.float64) - ro)
        s3 = fs_unit_sphere(st, rand2d)
        h1, _ = rand2d(st)
        col, _ = _sample_color(scene, spheres, ro, rd, 0, depth, "v1",
                               fixed_draws=(s3, float(h1)))
        acc += col
    acc /= spp
    return np.sqrt(np.clip(acc, 0, None))
