"""GPU-resident -> TPU-resident augmentation pipeline.

Re-design of the reference ``TransformFromCfg``
(/root/reference/skoots/train/merged_transform.py:402-777). The reference
runs python-random-gated torch ops per sample inside ``__getitem__``; here
the whole pipeline — elastic, affine, center-crop, flips, intensity ops,
skeleton baking and skeleton-mask painting — is ONE jitted, vmap-able
function of (rng, sample) with static shapes, so augmentation fuses into the
input pipeline on device and is deterministic given the key.

Point skeletons are co-transformed through every spatial op (the defining
requirement of SKOOTS augmentation): elastic inverse-warps the points by the
sampled displacement (merged_transform.py:161-186), affine applies the
forward in-plane matrix (:515-554), flips reflect coordinates (:584-608).

Sample contract (host side prepares; see skoots_tpu.train.data):
    image:  [PX, PY, PZ] float32  — skeleton-centered pre-crop (crop + margin)
    masks:  [PX, PY, PZ] int32
    points: [P, 3] float32        — packed skeleton vertices, pre-crop coords
    ids:    [P]   int32           — instance id per point (0 = padding)
    center: [3]   float32         — crop center in pre-crop coords
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

from skoots_tpu.config import CfgNode
from skoots_tpu.ops.skeleton import (
    PackedSkeletons,
    bake_skeleton,
    skeleton_to_mask,
)
from skoots_tpu.ops.vec2embed import coordinate_mesh


def _bernoulli(rng, rate):
    return jax.random.uniform(rng) < rate


def _sample_disp_at_points(disp_coarse, pts, spatial):
    """Trilinearly sample a coarse [gx,gy,gz,3] displacement field at [P,3]
    voxel coordinates."""
    gx, gy, gz, _ = disp_coarse.shape
    scale = jnp.asarray(
        [(gx - 1) / max(spatial[0] - 1, 1), (gy - 1) / max(spatial[1] - 1, 1),
         (gz - 1) / max(spatial[2] - 1, 1)], jnp.float32
    )
    coords = (pts * scale).T  # [3, P] in coarse-grid units
    out = jnp.stack(
        [map_coordinates(disp_coarse[..., c], list(coords), order=1, mode="nearest")
         for c in range(3)],
        axis=-1,
    )
    return out  # [P, 3] voxel displacements


def _warp_volume(vol, disp_full, order):
    """Sample vol at (coords + disp)."""
    spatial = vol.shape
    mesh = coordinate_mesh(spatial)  # [X,Y,Z,3]
    src = mesh + disp_full
    coords = [src[..., 0].ravel(), src[..., 1].ravel(), src[..., 2].ravel()]
    out = map_coordinates(vol, coords, order=order, mode="nearest")
    return out.reshape(spatial)


def _affine_matrix(angle_deg, shear_deg, scale, center):
    """Forward in-plane (XY) matrix M = C @ RSS @ C^-1 (reference
    merged_transform.py:216-284, translate = 0)."""
    rot = jnp.deg2rad(angle_deg)
    sy = jnp.deg2rad(shear_deg)
    a = jnp.cos(rot - sy) / jnp.cos(sy)
    b = -jnp.cos(rot - sy) * jnp.tan(sy) / jnp.cos(sy) - jnp.sin(rot)
    c_ = jnp.sin(rot - sy) / jnp.cos(sy)
    d = -jnp.sin(rot - sy) * jnp.tan(sy) / jnp.cos(sy) + jnp.cos(rot)
    rss = jnp.array([[a, b, 0.0], [c_, d, 0.0], [0.0, 0.0, 1.0]]) * scale
    rss = rss.at[2, 2].set(1.0)
    cx, cy = center
    cmat = jnp.array([[1.0, 0.0, cx], [0.0, 1.0, cy], [0.0, 0.0, 1.0]])
    cinv = jnp.array([[1.0, 0.0, -cx], [0.0, 1.0, -cy], [0.0, 0.0, 1.0]])
    return cmat @ rss @ cinv


def make_augment(cfg: CfgNode, dataset_mean: float = 0.0,
                 dataset_std: float = 1.0, intensity_ceiling: float = 255.0):
    """Build the jitted per-sample augmentation fn(rng, sample) -> batch dict.

    Output (channels-last, crop-sized):
        image [W,H,D,1] f32 normalized, masks [W,H,D,1] f32,
        baked [W,H,D,3] f32, skele_masks [W,H,D,1] f32
    """
    A = cfg.AUGMENTATION
    crop = (A.CROP_WIDTH, A.CROP_HEIGHT, A.CROP_DEPTH)
    radius = cfg.TRAIN.SKELETON_MASK_RADIUS
    flank = cfg.TRAIN.SKELETON_MASK_FLANK_RADIUS
    anisotropy = tuple(A.BAKE_SKELETON_ANISOTROPY)
    grid_shape = tuple(A.ELASTIC_GRID_SHAPE)
    grid_mag = jnp.asarray(A.ELASTIC_GRID_MAGNITUDE, jnp.float32)
    invert_rate = A.get("INVERT_RATE", A.BRIGHTNESS_RATE)
    # the reference hardcodes 255 (merged_transform.py:610-613); 16-bit data
    # inverts/clips against its real ceiling here
    ceil = float(intensity_ceiling)

    def geometric_core(rng, sample):
        """Shared spatial+intensity pipeline. ``sample`` may carry an extra
        nearest-interpolated volume under 'aux' (sparse training threads the
        skeleton-mask volume through it, reference sparse_transforms.py:348-439).
        Returns (image, masks, aux, pts, ids)."""
        image = sample["image"].astype(jnp.float32)
        masks = sample["masks"].astype(jnp.int32)
        aux = sample.get("aux")
        pts = sample["points"].astype(jnp.float32)
        ids = sample["ids"].astype(jnp.int32)
        center = sample["center"].astype(jnp.float32)
        spatial = image.shape
        keys = jax.random.split(rng, 16)

        # ---------------------------------------------------------- elastic
        flag_e = _bernoulli(keys[0], A.ELASTIC_RATE).astype(jnp.float32)
        # positive uniform offsets like the reference (torch.rand * magnitude,
        # merged_transform.py:133-141); magnitude is a fraction of the extent
        extent = jnp.asarray(spatial, jnp.float32)
        disp_coarse = (
            jax.random.uniform(keys[1], (*grid_shape, 3))
            * grid_mag * (extent / 2.0)
        ) * flag_e
        disp_full = jax.image.resize(
            disp_coarse, (*spatial, 3), method="trilinear"
        )
        image = _warp_volume(image, disp_full, order=1)
        masks = _warp_volume(masks.astype(jnp.float32), disp_full, order=0).astype(jnp.int32)
        if aux is not None:
            aux = _warp_volume(aux.astype(jnp.float32), disp_full, order=0)
        pts = pts - _sample_disp_at_points(disp_coarse, pts, spatial)

        # ----------------------------------------------------------- affine
        flag_a = _bernoulli(keys[2], A.AFFINE_RATE).astype(jnp.float32)
        angle = jax.random.uniform(keys[3], (), minval=A.AFFINE_YAW[0], maxval=A.AFFINE_YAW[1]) * flag_a
        shear = jax.random.uniform(keys[4], (), minval=A.AFFINE_SHEAR[0], maxval=A.AFFINE_SHEAR[1]) * flag_a
        scale = 1.0 + (jax.random.uniform(keys[5], (), minval=A.AFFINE_SCALE[0], maxval=A.AFFINE_SCALE[1]) - 1.0) * flag_a
        mat = _affine_matrix(angle, shear, scale, (spatial[0] / 2.0, spatial[1] / 2.0))
        inv = jnp.linalg.inv(mat)
        mesh2 = coordinate_mesh(spatial)  # [X,Y,Z,3]
        xy1 = jnp.stack(
            [mesh2[..., 0], mesh2[..., 1], jnp.ones_like(mesh2[..., 0])], -1
        )
        src_xy = jnp.einsum("ij,xyzj->xyzi", inv, xy1)
        coords = [src_xy[..., 0].ravel(), src_xy[..., 1].ravel(), mesh2[..., 2].ravel()]
        image = map_coordinates(image, coords, order=1, mode="nearest").reshape(spatial)
        masks = map_coordinates(
            masks.astype(jnp.float32), coords, order=0, mode="nearest"
        ).reshape(spatial).astype(jnp.int32)
        if aux is not None:
            aux = map_coordinates(
                aux, coords, order=0, mode="nearest"
            ).reshape(spatial)
        pts_xy1 = jnp.stack([pts[:, 0], pts[:, 1], jnp.ones_like(pts[:, 0])], -1)
        pts_xy = jnp.einsum("ij,pj->pi", mat, pts_xy1)
        pts = jnp.stack([pts_xy[:, 0], pts_xy[:, 1], pts[:, 2]], -1)
        # co-transform the crop2 target so the window follows its instance
        # (the reference leaves _center untransformed, merged_transform.py:564
        # — for its huge crop1 windows the rotation pivot nearly coincides
        # with _center, but small volumes drift; documented improvement)
        c_xy = mat @ jnp.array([center[0], center[1], 1.0])
        center = jnp.stack([c_xy[0], c_xy[1], center[2]])

        # ------------------------------------------------------------ crop2
        w = jnp.asarray(crop, jnp.float32)
        origin = jnp.clip(
            jnp.round(center - w / 2.0), 0.0,
            jnp.asarray(spatial, jnp.float32) - w,
        ).astype(jnp.int32)
        image = jax.lax.dynamic_slice(image, origin, crop)
        masks = jax.lax.dynamic_slice(masks, origin, crop)
        if aux is not None:
            aux = jax.lax.dynamic_slice(aux, origin, crop)
        pts = pts - origin.astype(jnp.float32)

        # ------------------------------------------------------------ flips
        for ax in range(3):
            f = _bernoulli(keys[6 + ax], A.FLIP_RATE)
            image = jnp.where(f, jnp.flip(image, ax), image)
            masks = jnp.where(f, jnp.flip(masks, ax), masks)
            if aux is not None:
                aux = jnp.where(f, jnp.flip(aux, ax), aux)
            pts = pts.at[:, ax].set(
                jnp.where(f, (crop[ax] - 1) - pts[:, ax], pts[:, ax])
            )

        # -------------------------------------------------------- intensity
        f_inv = _bernoulli(keys[9], invert_rate)
        image = jnp.where(f_inv, ceil - image, image)

        f_b = _bernoulli(keys[10], A.BRIGHTNESS_RATE)
        bval = jax.random.uniform(
            keys[11], (), minval=A.BRIGHTNESS_RANGE[0], maxval=A.BRIGHTNESS_RANGE[1]
        )
        image = jnp.clip(image + bval * jnp.where(f_b, 1.0, 0.0), 0.0, ceil)

        f_c = _bernoulli(keys[12], A.CONTRAST_RATE)
        cval = jax.random.uniform(
            keys[13], (), minval=A.CONTRAST_RANGE[0], maxval=A.CONTRAST_RANGE[1]
        )
        cval = jnp.where(f_c, cval, 1.0)
        m = jnp.mean(image)
        image = jnp.clip((image - m) * cval + m, 0.0, ceil)

        f_n = _bernoulli(keys[14], A.NOISE_RATE)
        noise = jax.random.uniform(keys[15], crop) * A.NOISE_GAMMA
        image = image + noise * jnp.where(f_n, 1.0, 0.0)

        # normalization constants enter via sample['norm'] when present so
        # different dataset stats reuse one compiled program (jit constants
        # would mint a fresh multi-minute TPU compile per dataset)
        norm = sample.get("norm")
        if norm is not None:
            image = (image - norm[0]) / norm[1]
        else:
            image = (image - dataset_mean) / dataset_std
        return image, masks, aux, pts, ids

    def augment(rng: jax.Array, sample: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        image, masks, _, pts, ids = geometric_core(rng, sample)
        skel = PackedSkeletons(points=pts, ids=ids)
        baked = bake_skeleton(masks, skel, anisotropy=anisotropy, average=True)
        skele_mask = skeleton_to_mask(skel, crop, radius=radius, flank_radius=flank)
        return {
            "image": image[..., None],
            "masks": (masks > 0).astype(jnp.float32)[..., None],
            "baked": baked,
            "skele_masks": skele_mask[..., None],
        }

    augment.geometric_core = geometric_core
    return augment


def make_batch_augment(cfg: CfgNode, dataset_mean=0.0, dataset_std=1.0,
                       intensity_ceiling: float = 255.0):
    """vmapped + jitted augmentation over a stacked sample batch."""
    aug = make_augment(cfg, intensity_ceiling=intensity_ceiling)

    @jax.jit
    def batch_aug(rng, samples, norm):
        b = samples["image"].shape[0]
        keys = jax.random.split(rng, b)
        samples = dict(samples)
        samples["norm"] = jnp.broadcast_to(norm, (b, 2))
        return jax.vmap(aug)(keys, samples)

    norm = jnp.asarray([dataset_mean, dataset_std], jnp.float32)
    return lambda rng, samples: batch_aug(rng, samples, norm)
