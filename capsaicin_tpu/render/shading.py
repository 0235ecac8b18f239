"""Shading: attribute interpolation, material fetch, lights, Lambert BRDF.

TPU-native reimplementation of the reference's shading headers:
  - scene.h:5-50   InterpolateAttributes (vertex attribute fetch + barycentric
                   interpolation from the pooled buffers)
  - scene.h:52-61  GetMaterial (texture fetch with v-flip + gamma-2.2 decode,
                   constant 0.75 albedo for untextured meshes)
  - lighting.h:20-33  the animated directional light
  - shading.h      Lambert evaluate / pdf / sample

All functions are vectorized over arbitrary pixel/ray batches. `prim` is the
*global* triangle id (the flattened-BVH analog of DXR's InstanceID +
PrimitiveIndex pair); -1 means miss.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import mathops as m
from ..ops import sampling

PI = sampling.PI

SKY_COLOR = jnp.array([0.7, 0.7, 0.85], jnp.float32)  # rt_direct_lighting.hlsl:56


def interpolate_attributes(scene, prim, u, v):
    """(global prim id, barycentrics) -> position, shading normal, texcoord.

    Matches scene.h:5-50: P and UV interpolated with (1-u-v, u, v); the
    normal is normalized after interpolation. Uses the flattened triangle SoA
    (identical values to the pooled indexed fetch; see Scene docstring).
    """
    p = jnp.clip(prim, 0, scene.tri_v0.shape[0] - 1)
    w = (1.0 - u - v)[..., None]
    uu = u[..., None]
    vv = v[..., None]
    pos = scene.tri_v0[p] * w + scene.tri_v1[p] * uu + scene.tri_v2[p] * vv
    nrm = m.normalize(scene.tri_n0[p] * w + scene.tri_n1[p] * uu + scene.tri_n2[p] * vv)
    tx = scene.tri_t0[p] * w + scene.tri_t1[p] * uu + scene.tri_t2[p] * vv
    return pos, nrm, tx


def sample_atlas(atlas, sizes, tex_id, uv):
    """Bilinear, wrap-mode fetch from the padded texture atlas.

    atlas: [N,TH,TW,4]; sizes: [N,2] (w,h); tex_id: [...] int32 >= 0;
    uv: [...,2]. Equivalent of SampleLevel(g_sampler, tx, 0) on the bindless
    texture array (scene.h:58).
    """
    t = jnp.clip(tex_id, 0, atlas.shape[0] - 1)
    wh = sizes[t].astype(jnp.float32)  # [...,2]
    xy = uv * wh - 0.5
    ix = jnp.floor(xy[..., 0]).astype(jnp.int32)
    iy = jnp.floor(xy[..., 1]).astype(jnp.int32)
    fx = (xy[..., 0] - jnp.floor(xy[..., 0]))[..., None]
    fy = (xy[..., 1] - jnp.floor(xy[..., 1]))[..., None]
    w_i = sizes[t][..., 0]
    h_i = sizes[t][..., 1]

    def fetch(jx, jy):
        jx = jnp.mod(jx, w_i)
        jy = jnp.mod(jy, h_i)
        n_, th, tw, c = atlas.shape
        flat = atlas.reshape(n_ * th * tw, c)
        return jnp.take(flat, (t * th + jy) * tw + jx, axis=0)

    v00 = fetch(ix, iy)
    v10 = fetch(ix + 1, iy)
    v01 = fetch(ix, iy + 1)
    v11 = fetch(ix + 1, iy + 1)
    top = v00 * (1 - fx) + v10 * fx
    bot = v01 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def get_material(scene, prim, tx, use_material_kd: bool = False):
    """Diffuse albedo kd; scene.h:52-61.

    Untextured meshes -> constant 0.75 (the reference ignores MTL Kd).
    `use_material_kd=True` is our extension that substitutes the MTL Kd.
    Textured: v-flip then bilinear fetch then gamma-2.2 decode.
    """
    p = jnp.clip(prim, 0, scene.tri_mesh.shape[0] - 1)
    mesh = scene.tri_mesh[p]
    tex_id = scene.mesh_texture[mesh]
    flip = jnp.stack([tx[..., 0], 1.0 - tx[..., 1]], axis=-1)
    tex_rgb = sample_atlas(scene.atlas, scene.atlas_size, tex_id, flip)[..., :3]
    if use_material_kd:
        base = scene.mesh_kd[mesh]
    else:
        base = jnp.full_like(tex_rgb, 0.75)
    kd = jnp.where((tex_id >= 0)[..., None], tex_rgb, base)
    return jnp.power(jnp.maximum(kd, 0.0), 2.2)


def directional_light_sample(frame_count):
    """The animated directional light; lighting.h:20-33.

    Returns (direction [3], intensity [3]). pdf == 1, distance == 1e5.
    """
    fc = jnp.asarray(frame_count)
    t = 2.0 * 3.14 * (fc % 4096).astype(jnp.float32) / 4096.0
    d = jnp.stack([40.0 * jnp.sin(t), jnp.full_like(t, 100.0), 40.0 * jnp.cos(t)], axis=-1)
    d = m.normalize(d)
    intensity = jnp.stack(
        [
            jnp.full_like(t, 28.0),
            jnp.full_like(t, 24.0),
            20.0 + 2.0 + 2.0 * jnp.cos(t),
        ],
        axis=-1,
    )
    return d, intensity


LIGHT_DISTANCE = 100000.0
SHADOW_TMIN = 0.0001  # lighting.h:44


def lambert_eval():
    """1/pi; shading.h:15-18."""
    return 1.0 / PI


def lambert_pdf(n, o):
    """max(0, n.o)/pi; shading.h:20-23."""
    return jnp.maximum(0.0, m.dot(n, o)) / PI


def lambert_sample(s, n):
    """Cosine-power (e=1) hemisphere sample; shading.h:25-33.

    Returns (direction, brdf scalar, pdf).
    """
    d = sampling.map_to_hemisphere(s, n, 1.0)
    return d, lambert_eval(), lambert_pdf(n, d)


def direct_illumination_terms(p, n, kd, frame_count):
    """The unshadowed NEE integrand + the shadow ray to trace.

    Splits CalculateDirectIllumination (lighting.h:35-61) into the pure math
    (here) and the visibility query (caller traces any-hit with tmin=1e-4).
    Returns (shadow_dir broadcast to p's shape, unshadowed_rgb).
    """
    ldir, li = directional_light_sample(frame_count)
    ldir = jnp.broadcast_to(ldir, p.shape)
    ndotl = jnp.maximum(0.0, m.dot(n, ldir))
    unshadowed = li * kd * lambert_eval() * ndotl[..., None]
    return ldir, unshadowed
