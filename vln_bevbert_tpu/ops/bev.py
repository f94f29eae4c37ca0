"""Device-side BEV projector: depth lift + egocentric scatter-mean splat.

TPU-native replacement for the reference's CUDA path
(/root/reference/pretrain_src/model/bev_utils.py:297-430, which leans on
torch_scatter's scatter_mean and a per-sample Python loop). Design:

- the *lift* (pixel -> camera ray -> world point) is a static einsum over
  precomputed per-pixel ray scales (ref compute_scaling_params,
  bev_utils.py:103-137), batched over all cameras at once;
- the *splat* (points -> grid cells, masked mean) is reformulated as a
  one-hot matmul: build the (points x cells) assignment matrix with an iota
  comparison and contract it against the point features on the MXU. No
  scatter, no boolean indexing, no per-sample loop — one fused XLA program
  with fully static shapes (B x 2352 points x 441 cells for the default
  12-view 14x14 grid, 21x21 map).

An optional Pallas kernel (ops/pallas_splat.py) computes the same contraction
without materialising the one-hot matrix in HBM.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import pixel_ray_scales


class BevProjector:
    """Static-shape BEV lift-splat.

    Args mirror the reference PointCloud (bev_utils.py:302-346): vfov in
    radians, the feature-grid height/width, map_dim cells of map_res metres,
    and the above-camera clip threshold (points with ego y > z_clip are
    dropped — ceiling pixels; ref project_bev bev_utils.py:399).
    """

    def __init__(
        self,
        vfov: float = math.radians(90.0),
        grid_hw: int = 14,
        num_views: int = 12,
        map_dim: int = 21,
        map_res: float = 0.5,
        z_clip: float = 0.5,
        num_sem: int = 40,
        use_pallas: bool = False,
    ):
        self.vfov = vfov
        self.grid_hw = grid_hw
        self.num_views = num_views
        self.map_dim = map_dim
        self.map_res = map_res
        self.z_clip = z_clip
        self.num_sem = num_sem
        self.use_pallas = use_pallas
        self.num_cells = map_dim * map_dim
        self.num_points = num_views * grid_hw * grid_hw

        x_scale, y_scale = pixel_ray_scales(grid_hw, grid_hw, vfov)
        # (H*W, 2): per-pixel ray direction scales, shared by every camera.
        self._ray_xy = np.stack([x_scale.ravel(), y_scale.ravel()], axis=-1)

    # ------------------------------------------------------------------ lift
    def lift(self, depths: jnp.ndarray, T_c2w: jnp.ndarray):
        """Un-project depth grids into world points.

        depths: (B, V, H, W) metres; T_c2w: (B, V, 4, 4) camera-to-world.
        Returns (points (B, V*H*W, 3) world xyz, no_depth (B, V*H*W) bool).
        Parity: PointCloud.forward + pixel_to_world_mapping
        (bev_utils.py:200-248,349-378).
        """
        b, v, h, w = depths.shape
        d = depths.reshape(b, v, h * w).astype(jnp.float32)
        ray = jnp.asarray(self._ray_xy, jnp.float32)  # (HW, 2)
        cam = jnp.stack(
            [
                d * ray[None, None, :, 0],
                d * ray[None, None, :, 1],
                d,
                jnp.ones_like(d),
            ],
            axis=-1,
        )  # (B, V, HW, 4)
        world = jnp.einsum(
            "bvij,bvpj->bvpi", T_c2w.astype(jnp.float32), cam,
            preferred_element_type=jnp.float32,
        )
        pts = world[..., :3].reshape(b, v * h * w, 3)
        no_depth = (d == 0).reshape(b, v * h * w)
        return pts, no_depth

    # ----------------------------------------------------------------- cells
    def ego_cells(self, points: jnp.ndarray, T_w2c: jnp.ndarray, S_w2c: jnp.ndarray):
        """World points -> egocentric cell index + in-grid/below-ceiling mask.

        points: (B, N, 3); T_w2c: (B, 4, 4) ego rotation (heading);
        S_w2c: (B, 3) world position of the map centre.
        Returns (cell (B, N) int32 flat index, valid (B, N) bool).
        Parity: lift_splat ego transform (pretrain_cmt.py:133-137) +
        project_bev discretisation/masking (bev_utils.py:390-403).
        """
        shifted = points - S_w2c[:, None, :]
        ego = jnp.einsum(
            "bij,bpj->bpi", T_w2c[:, :3, :3].astype(jnp.float32), shifted,
            preferred_element_type=jnp.float32,
        )
        # grid coords from the (x, z) ground plane
        gx = jnp.round(ego[:, :, 0] / self.map_res) + (self.map_dim - 1) // 2
        gz = jnp.round(ego[:, :, 2] / self.map_res) + (self.map_dim - 1) // 2
        inside = (gx >= 0) & (gx < self.map_dim) & (gz >= 0) & (gz < self.map_dim)
        below_ceiling = ego[:, :, 1] <= self.z_clip
        cell = (gz * self.map_dim + gx).astype(jnp.int32)
        cell = jnp.clip(cell, 0, self.num_cells - 1)
        return cell, inside & below_ceiling

    # ----------------------------------------------------------------- splat
    def splat(
        self,
        cell: jnp.ndarray,
        valid: jnp.ndarray,
        feats: jnp.ndarray,
        sem_labels: Optional[jnp.ndarray] = None,
    ):
        """Masked scatter-mean of point features into grid cells.

        cell: (B, N) int32; valid: (B, N) bool; feats: (B, N, C);
        sem_labels: optional (B, N) int semantic class per point.

        Returns (bev (B, cells, C), occupancy (B, cells) bool,
                 sem (B, cells, num_sem) presence in {0,1}, sem_mask (B, cells)).
        Parity: project_bev (bev_utils.py:381-430) — scatter_mean for features,
        binarised scatter for semantics.
        """
        num_sem = self.num_sem
        b, n, c = feats.shape
        # Poisoned cell index: invalid points get -1 and match no cell, so a
        # single (points x cells) one-hot contraction yields masked sums.
        cell_eff = jnp.where(valid, cell, -1)

        # Fuse [features | semantic one-hot | count column] into one matmul so
        # the MXU does all three reductions in a single pass over the points.
        cols = [feats.astype(jnp.bfloat16)]
        if sem_labels is not None:
            cols.append(jax.nn.one_hot(sem_labels, num_sem, dtype=jnp.bfloat16))
        cols.append(jnp.ones((b, n, 1), jnp.bfloat16))
        payload = jnp.concatenate(cols, axis=-1)

        if self.use_pallas:
            from .pallas_splat import splat_sums
            sums = splat_sums(cell_eff, payload, self.num_cells)
        else:
            assign = (
                cell_eff[:, :, None] == jnp.arange(self.num_cells)[None, None, :]
            ).astype(jnp.bfloat16)
            sums = jnp.einsum(
                "bnc,bnd->bcd", assign, payload,
                preferred_element_type=jnp.float32,
            )

        counts = sums[:, :, -1]
        bev = sums[:, :, :c] / jnp.maximum(counts, 1.0)[:, :, None]
        occupancy = counts > 0
        if sem_labels is None:
            return bev, occupancy, None, None

        sem_sum = sums[:, :, c : c + num_sem]
        sem = (sem_sum > 0).astype(jnp.float32)
        sem_mask = jnp.any(sem_sum > 0, axis=-1)
        return bev, occupancy, sem, sem_mask

    # ------------------------------------------------------------- end-to-end
    @functools.partial(jax.jit, static_argnums=0)
    def lift_splat(
        self,
        depths: jnp.ndarray,
        T_c2w: jnp.ndarray,
        T_w2c: jnp.ndarray,
        S_w2c: jnp.ndarray,
        feats: jnp.ndarray,
        sem_labels: Optional[jnp.ndarray] = None,
    ):
        """Full pipeline for the pretrain path (ref pretrain_cmt.py:114-167).

        depths (B, V, H, W) metres; T_c2w (B, V, 4, 4); T_w2c (B, 4, 4);
        S_w2c (B, 3); feats (B, V*H*W, C); sem_labels optional (B, V*H*W).
        """
        points, no_depth = self.lift(depths, T_c2w)
        cell, geo_valid = self.ego_cells(points, T_w2c, S_w2c)
        return self.splat(cell, geo_valid & ~no_depth, feats, sem_labels)
