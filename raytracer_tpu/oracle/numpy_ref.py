"""Golden oracle: a plain-NumPy scalar-semantics renderer.

The reference ships no tests (SURVEY.md §4), so this oracle *is* the test
strategy's ground truth: an independent implementation of the reference math
(main.cpp:28-139, scene.cpp:4-106) that keeps the reference's *recursive*
structure — ``trace_oracle`` literally recurses like ``recursive_ray_tracing``
(main.cpp:89-119) — so it cross-checks the TPU path's recursion->scan algebra
rather than sharing it. Runs in float64 by default (the reference is double
math) or float32 to match the TPU path bit-for-bit on hit/miss decisions.

Normalization policy (same as the TPU path, SURVEY.md §7 quirk policy):
real pi, float aspect ratio, unit ray directions (which makes the reference's
mixed sphere-Euclidean/wall-parametric distance metric consistent), and the
replicated ``position - pixel_center`` direction flip.
"""

from __future__ import annotations

import numpy as np

__all__ = ["render_oracle", "trace_oracle", "scene_to_numpy"]

MISS_T = 1e30
REFLECT_EPS = 1e-4


def scene_to_numpy(scene, dtype=np.float64) -> dict:
    """Convert a Scene pytree (jnp or np leaves) into a plain dict of ndarrays."""
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x, dtype=dtype), {
        "sph_center": scene.spheres.center,
        "sph_radius": scene.spheres.radius,
        "sph_color": scene.spheres.material.color,
        "sph_ambient": scene.spheres.material.ambient,
        "sph_metallic": scene.spheres.material.metallic,
        "sph_diffuse": scene.spheres.material.diffuse,
        "sph_specular": scene.spheres.material.specular,
        "sph_exponent": scene.spheres.material.specular_exponent,
        "wall_position": scene.walls.position,
        "wall_normal": scene.walls.normal,
        "wall_length": scene.walls.length,
        "wall_width": scene.walls.width,
        "wall_color": scene.walls.material.color,
        "wall_ambient": scene.walls.material.ambient,
        "wall_metallic": scene.walls.material.metallic,
        "wall_diffuse": scene.walls.material.diffuse,
        "wall_specular": scene.walls.material.specular,
        "wall_exponent": scene.walls.material.specular_exponent,
        "box_min": scene.boxes.minimum,
        "box_max": scene.boxes.maximum,
        "box_color": scene.boxes.material.color,
        "box_ambient": scene.boxes.material.ambient,
        "box_metallic": scene.boxes.material.metallic,
        "box_diffuse": scene.boxes.material.diffuse,
        "box_specular": scene.boxes.material.specular,
        "box_exponent": scene.boxes.material.specular_exponent,
        "light_pos": scene.lights.point_position,
        "light_color": scene.lights.point_color,
        "sun_dir": scene.lights.sun_direction,
        "sun_color": scene.lights.sun_color,
        "ground": scene.sky.ground_color,
        "horizon": scene.sky.horizon_color,
        "zenith": scene.sky.zenith_color,
        "sky_exp": scene.sky.gradient_exponent,
    })


def _normalize(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _sphere_ts(s, o, d):
    """Nearer-root quadratic test (scene.cpp:40-78), [P, N] (miss = MISS_T)."""
    if s["sph_radius"].shape[0] == 0:
        return np.full((o.shape[0], 0), MISS_T, o.dtype)
    oc = o[:, None, :] - s["sph_center"][None]
    b = 2.0 * np.sum(d[:, None, :] * oc, -1)
    c = np.sum(oc * oc, -1) - s["sph_radius"][None] ** 2
    det = b * b - 4.0 * c
    with np.errstate(invalid="ignore"):
        t = 0.5 * (-b - np.sqrt(np.maximum(det, 0.0)))
    valid = (det >= 0.0) & (t > 0.0)
    return np.where(valid, t, MISS_T)


def _wall_ts(s, o, d):
    """Plane + rectangle-bounds test (scene.cpp:4-35), [P, M] (miss = MISS_T)."""
    if s["wall_length"].shape[0] == 0:
        return np.full((o.shape[0], 0), MISS_T, o.dtype)
    n = s["wall_normal"]
    z = np.array([0.0, 0.0, 1.0], o.dtype)
    right = _normalize(np.cross(n, z))
    up = _normalize(np.cross(right, n))
    denom = d @ n.T
    num = np.sum(s["wall_position"] * n, -1)[None] - o @ n.T
    with np.errstate(divide="ignore", invalid="ignore"):
        t = num / denom
    rel = o[:, None, :] + d[:, None, :] * t[..., None] - s["wall_position"][None]
    px = np.sum(rel * right[None], -1)
    py = np.sum(rel * up[None], -1)
    with np.errstate(invalid="ignore"):
        valid = (
            (np.abs(denom) > 0)
            & (t > 0.0)
            & (px >= 0.0)
            & (px <= s["wall_length"][None])
            & (py >= 0.0)
            & (py <= s["wall_width"][None])
        )
    return np.where(valid, np.where(np.isfinite(t), t, MISS_T), MISS_T)


def _box_ts(s, o, d):
    """Axis-aligned box slab test, [P, NB] (miss = MISS_T). Outside hits
    only: the entry distance t_near, accepted iff t_near <= t_far, t_near > 0."""
    nb = s["box_min"].shape[0]
    if nb == 0:
        return np.full((o.shape[0], 0), MISS_T, o.dtype)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d  # +-inf on axis-parallel rays: correct slab semantics
        t1 = (s["box_min"][None] - o[:, None, :]) * inv[:, None, :]
        t2 = (s["box_max"][None] - o[:, None, :]) * inv[:, None, :]
    tn = np.nanmax(np.minimum(t1, t2), axis=-1)
    tf = np.nanmin(np.maximum(t1, t2), axis=-1)
    valid = (tn <= tf) & (tn > 0.0)
    return np.where(valid, tn, MISS_T)


def _box_normal(s, bi, o, d, t):
    """Outward face normal at the entry point of box ``bi`` per ray."""
    mn, mx = s["box_min"][bi], s["box_max"][bi]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d
        near = np.where(d >= 0.0, mn, mx)
        t_axis = (near - o) * inv
    t_axis = np.where(np.isfinite(t_axis), t_axis, -np.inf)
    axis = np.argmax(t_axis, axis=-1)
    n = np.zeros_like(o)
    rows = np.arange(o.shape[0])
    n[rows, axis] = -np.sign(d[rows, axis])
    return n


def _background(s, d):
    """out_color (main.cpp:28-37)."""
    z = d[..., 2]
    grad = np.power(np.maximum(z, 0.0), s["sky_exp"])[..., None]
    sky = s["horizon"] + grad * (s["zenith"] - s["horizon"])
    return np.where((z < 0.0)[..., None], s["ground"], sky)


def _shade(s, pos, normal, view, color, kd, ks, ka, exp):
    """Blinn-Phong local color (main.cpp:42-62, 102-104) + sun light."""
    intensity = np.zeros_like(pos)
    for li in range(s["light_pos"].shape[0]):
        ldir = _normalize(s["light_pos"][li] - pos)
        diff = np.maximum(np.sum(ldir * normal, -1), 0.0)
        half = _normalize(view + ldir)
        spec = np.maximum(np.sum(half * normal, -1), 0.0) ** exp
        intensity += s["light_color"][li] * (
            diff[:, None] * kd[:, None] + spec[:, None] * ks[:, None]
        )
    for si in range(s["sun_color"].shape[0]):
        sdir = _normalize(s["sun_dir"][si][None])
        diff = np.maximum(np.sum(sdir * normal, -1), 0.0)
        half = _normalize(view + sdir)
        spec = np.maximum(np.sum(half * normal, -1), 0.0) ** exp
        intensity += s["sun_color"][si] * (
            diff[:, None] * kd[:, None] + spec[:, None] * ks[:, None]
        )
    return color * (intensity + ka[:, None])


def trace_oracle(s: dict, o: np.ndarray, d: np.ndarray, remaining: int) -> np.ndarray:
    """Recursive integrator mirroring recursive_ray_tracing (main.cpp:89-119).

    ``remaining`` counts reflection bounces left, exactly like the
    reference's ``remaining_iterations``.
    """
    n_s = s["sph_radius"].shape[0]
    n_w = s["wall_length"].shape[0]
    ts = np.concatenate(
        [_sphere_ts(s, o, d), _wall_ts(s, o, d), _box_ts(s, o, d)], axis=1
    )
    if ts.shape[1] == 0:
        return _background(s, d)
    idx = np.argmin(ts, axis=1)
    t = ts[np.arange(ts.shape[0]), idx]
    hit = t < MISS_T

    sky = _background(s, d)

    t_safe = np.where(hit, t, 1.0)
    pos = o + d * t_safe[:, None]
    n_b = s["box_min"].shape[0]
    is_sphere = idx < n_s
    is_box = idx >= n_s + n_w
    si = np.clip(idx, 0, max(n_s - 1, 0))
    wi = np.clip(idx - n_s, 0, max(n_w - 1, 0))
    bi = np.clip(idx - n_s - n_w, 0, max(n_b - 1, 0))

    if n_s:
        sph_n = _normalize(pos - s["sph_center"][si])
    else:
        sph_n = np.zeros_like(pos)
    if n_w:
        wall_n = s["wall_normal"][wi]
    else:
        wall_n = np.zeros_like(pos)
    if n_b:
        box_n = _box_normal(s, bi, o, d, t_safe)
    else:
        box_n = np.zeros_like(pos)
    normal = np.where(
        is_sphere[:, None], sph_n, np.where(is_box[:, None], box_n, wall_n)
    )

    def pick(field):
        parts = []
        if n_s:
            parts.append(s["sph_" + field])
        if n_w:
            parts.append(s["wall_" + field])
        if n_b:
            parts.append(s["box_" + field])
        table = np.concatenate(parts, axis=0)
        return table[np.clip(idx, 0, table.shape[0] - 1)]

    color = pick("color")
    local = _shade(
        s,
        pos,
        normal,
        _normalize(-d),
        color,
        pick("diffuse"),
        pick("specular"),
        pick("ambient"),
        pick("exponent"),
    )

    if remaining <= 0:
        return np.where(hit[:, None], local, sky)

    # Reflection (main.cpp:111-117): offset origin, mirror direction, blend by
    # metallic. Dead (miss) lanes recurse with a harmless up-ray.
    new_o = np.where(hit[:, None], pos + normal * REFLECT_EPS, o)
    refl = d - normal * (2.0 * np.sum(d * normal, -1, keepdims=True))
    new_d = np.where(hit[:, None], _normalize(refl), d)
    reflected = trace_oracle(s, new_o, new_d, remaining - 1)

    m = pick("metallic")[:, None]
    blended = local + m * (reflected - local)
    return np.where(hit[:, None], blended, sky)


def render_oracle(
    scene,
    camera,
    width: int,
    height: int,
    *,
    depth: int = 3,
    tonemap: bool = True,
    dtype=np.float64,
) -> np.ndarray:
    """Reference-semantics render to an [H, W, 3] image (oracle math).

    Camera setup mirrors Camera::init (scene.cpp:80-106) with real pi, and ray
    generation mirrors rt_scene (main.cpp:124-139) with normalized directions.
    """
    pos = np.asarray(camera.position, dtype)
    lookat = np.asarray(camera.lookat, dtype)
    vup = np.asarray(camera.vup, dtype)
    vfov = float(np.asarray(camera.vfov))

    focal = np.linalg.norm(pos - lookat)
    theta = vfov * np.pi / 180.0
    fov_h = 2.0 * np.tan(theta / 2.0) * focal
    fov_w = fov_h * (width / height)
    w = (pos - lookat) / np.linalg.norm(pos - lookat)
    u = np.cross(vup, w)
    u /= np.linalg.norm(u)
    v = np.cross(w, u)
    fov_x = u * fov_w
    fov_y = v * (-fov_h)
    dx = fov_x / width
    dy = fov_y / height
    top_left = pos - w * focal - fov_x / 2 - fov_y / 2 + (dx + dy) * 0.5

    jj = np.arange(width, dtype=dtype)[None, :, None]
    ii = np.arange(height, dtype=dtype)[:, None, None]
    pixel_center = top_left + dx * jj + dy * ii
    d = _normalize((pos - pixel_center).reshape(-1, 3)).astype(dtype)
    o = np.broadcast_to(pos, d.shape).astype(dtype)

    s = scene_to_numpy(scene, dtype)
    img = trace_oracle(s, o, d, depth).reshape(height, width, 3)
    if tonemap:
        luma = (
            0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
        )[..., None]
        img = img / (1.0 + np.maximum(luma, 0.0))
    return img
