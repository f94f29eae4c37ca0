"""DAgger navigation agent for discrete environments.

Re-design of /root/reference/map_nav_src/r2r/agent.py (GMapNavAgent) around
the TPU's compilation model as **rollout-then-replay**:

1. *Rollout* (inference): per-step jitted forwards drive the policy; the host
   maintains GraphMaps, lifts/splats point clouds (device), and records every
   step's static-shape inputs.
2. *Replay* (training): ONE compiled program — pano encoding for all steps at
   once, then a ``lax.scan`` over steps rebuilding each step's global-map node
   embeddings from host-recorded aggregation matrices — reproduces the
   reference's single-backward-per-episode gradient (agent_base.py:212-214),
   including gradient flow from later navigation steps back through earlier
   panorama encodings via the topological-map memory. BEV features carry no
   gradient in the reference (project_bev is @torch.no_grad, raw CLIP inputs;
   bev_utils.py:381) so they are splatted once during rollout and replayed as
   constants.

The reference's per-sample fused-logit loop and node-embedding dict loops
become the same host-built ``fuse_map`` / aggregation matrices used in
pretraining.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import FinetuneConfig
from ..geometry import (
    bev_polar_pos,
    se3_from_xyzhe,
    world_to_ego_cells_stop_centre,
)
from ..models import GlocalTextPathNavCMT
from ..ops.bev import BevProjector
from .env import R2RNavBatch
from .eval_utils import compute_dtw_metrics
from .graph_map import GraphMap

IGNORE_ID = -100

# diagnostic: force device results immediately after dispatch (disables the
# host/device rollout overlap) so its benefit is measurable in ft_bench
import os as _os

_EAGER_SYNC = _os.environ.get("VLN_BEVBERT_EAGER_SYNC") == "1"


@dataclass
class StepRecord:
    """Everything the replay pass needs for one rollout step."""

    active: np.ndarray                 # (B,) bool
    view_fts: np.ndarray               # (B, V, Dimg)
    loc_fts: np.ndarray                # (B, V, A+3)
    nav_types: np.ndarray              # (B, V)
    view_lens: np.ndarray              # (B,)
    gmap_agg: np.ndarray               # (B, N, T*V)
    gmap_step_ids: np.ndarray          # (B, N)
    gmap_pos_fts: np.ndarray           # (B, N, A+3)
    gmap_masks: np.ndarray             # (B, N)
    gmap_visited_masks: np.ndarray     # (B, N)
    gmap_pair_dists: np.ndarray        # (B, N, N)
    targets: np.ndarray                # (B,)
    # BEV branch (None under the topo-only ETP variant, model.use_bev=False)
    bev_fts: Any = None                # (B, C, 768) device array, no grad
    bev_nav_masks: Optional[np.ndarray] = None   # (B, C)
    bev_cand_idxs: Optional[np.ndarray] = None   # (B, K)
    local_masks: Optional[np.ndarray] = None     # (B, K)
    fuse_map: Optional[np.ndarray] = None        # (B, N, K)
    bev_pos_fts: Optional[np.ndarray] = None     # (B, C, A+3+3)
    step_idx: int = 0
    obj_fts: Optional[np.ndarray] = None     # (B, O, Dobj)
    obj_lens: Optional[np.ndarray] = None    # (B,)
    obj_targets: Optional[np.ndarray] = None  # (B,)


class DevicePcStore:
    """Device-resident per-step point-cloud memory.

    The reference keeps per-node point clouds as live GPU tensors inside its
    GraphMap (graph_utils.py:126-143); re-uploading gathered neighbourhoods
    from host every step costs ~200MB/step at scale. Step buffers live on
    device — (B, T, P, ...) with in-place functional updates — and the
    neighbourhood gather happens on device from host-computed step indices.
    """

    def __init__(self, batch: int, max_steps: int, num_points: int,
                 feat_dim: int):
        import jax.numpy as jnp

        self.pc = jnp.zeros((batch, max_steps, num_points, 3), jnp.float32)
        self.valid = jnp.zeros((batch, max_steps, num_points), bool)
        self.feats = jnp.zeros(
            (batch, max_steps, num_points, feat_dim), jnp.bfloat16
        )
        self._update = jax.jit(
            lambda buf, t, x: buf.at[:, t].set(x),
            static_argnums=1,
            donate_argnums=0,
        )

    def set_step(self, t: int, pc, valid, feats):
        self.pc = self._update(self.pc, t, jnp.asarray(pc, jnp.float32))
        self.valid = self._update(self.valid, t, jnp.asarray(valid, bool))
        self.feats = self._update(self.feats, t, jnp.asarray(feats, jnp.bfloat16))


def gather_and_splat(projector, pc_buf, valid_buf, feat_buf,
                     step_sel, step_ok, T_w2c, S_w2c):
    """Device-side neighbourhood gather + egocentric splat.

    pc_buf (B, T, P, 3); step_sel (B, S) step indices per sample;
    step_ok (B, S) slot validity. Returns bev features (B, cells, C).
    """
    idx = step_sel[:, :, None, None]
    pc = jnp.take_along_axis(pc_buf, idx, axis=1)
    valid = jnp.take_along_axis(valid_buf, step_sel[:, :, None], axis=1)
    feats = jnp.take_along_axis(feat_buf, idx, axis=1)
    b, s, p, _ = pc.shape
    pc = pc.reshape(b, s * p, 3)
    valid = (valid & step_ok[:, :, None]).reshape(b, s * p)
    feats = feats.reshape(b, s * p, -1)
    cell, geo_ok = projector.ego_cells(pc, T_w2c, S_w2c)
    bev, _, _, _ = projector.splat(cell, valid & geo_ok, feats)
    return bev


class GMapNavAgent:
    def __init__(self, cfg: FinetuneConfig, env: R2RNavBatch, seed: int = 0,
                 mesh=None):
        """``mesh``: optional dp Mesh — the replay update then runs
        data-parallel with replicated params and a batch-sharded bundle (the
        reference fine-tunes under DDP, agent_base.py:121-123; env.batch_size
        is the GLOBAL batch and must divide by the mesh size)."""
        self.cfg = cfg
        self.env = env
        self.mesh = mesh
        if mesh is not None and env is not None:
            n_dev = mesh.devices.size
            assert env.batch_size % n_dev == 0, (
                f"global batch {env.batch_size} not divisible by mesh size {n_dev}"
            )
        self.model = GlocalTextPathNavCMT(cfg.model)
        self.projector = BevProjector(
            vfov=math.radians(90.0),
            grid_hw=cfg.shapes.grid_hw,
            num_views=cfg.shapes.num_views,
            map_dim=cfg.model.bev_dim,
            map_res=cfg.model.bev_res,
            z_clip=0.5,
        )
        self.polar = bev_polar_pos(cfg.model.bev_dim).reshape(-1, 3)
        self.np_rng = np.random.default_rng(seed)
        from ..utils.rng import train_key

        self.rng = train_key(seed)  # rbg: cheap dropout masks on TPU
        self.params = None
        self.opt_state = None
        self.tx = None
        self._jitted: Dict[str, Any] = {}
        self.logs: Dict[str, List[float]] = {"IL_loss": [], "entropy": []}

    # ------------------------------------------------------------------ init
    def init_params(self, obs=None, pretrained_params=None):
        """Initialise (or adopt pretrained backbone) parameters."""
        sh, m = self.cfg.shapes, self.cfg.model
        B = self.env.batch_size
        dummy_nav = self._dummy_nav_batch(B)
        variables = jax.jit(
            lambda r: self.model.init(r, "navigation", dummy_nav)
        )(jax.random.key(0))
        params = variables["params"]
        # language/panorama params come from the shared bert subtree, which
        # the navigation init doesn't touch; init those too
        lang_vars = jax.jit(
            lambda r: self.model.init(
                r,
                "language",
                {
                    "txt_ids": np.zeros((B, 8), np.int32),
                    "txt_masks": np.ones((B, 8), bool),
                },
            )
        )(jax.random.key(1))
        O = sh.max_objects if m.obj_feat_size > 0 else 0
        pano_batch = {
            "view_fts": np.zeros((B, sh.max_pano_len, m.image_feat_size), np.float32),
            "loc_fts": np.zeros((B, sh.max_pano_len + O, m.angle_feat_size + 3), np.float32),
            "nav_types": np.zeros((B, sh.max_pano_len + O), np.int32),
            "view_lens": np.full((B,), 4, np.int32),
        }
        if O:
            pano_batch["obj_fts"] = np.zeros((B, O, m.obj_feat_size), np.float32)
            pano_batch["obj_lens"] = np.ones((B,), np.int32)
        pano_vars = jax.jit(
            lambda r: self.model.init(r, "panorama", pano_batch)
        )(jax.random.key(2))

        def merge(a, b):
            out = dict(a)
            for k, v in b.items():
                if k in out and isinstance(v, dict):
                    out[k] = merge(out[k], v)
                elif k not in out:
                    out[k] = v
            return out

        params = merge(
            merge(dict(params), dict(lang_vars["params"])),
            dict(pano_vars["params"]),
        )
        if pretrained_params is not None:
            from ..models.surgery import transfer_pretrained

            params = transfer_pretrained(pretrained_params, params)
        self.params = params
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.cfg.grad_norm),
            # bf16 first moment: the replay update is HBM-bound like the
            # pretrain one (see OptimConfig.mu_dtype)
            optax.adamw(self.cfg.learning_rate,
                        weight_decay=self.cfg.weight_decay,
                        mu_dtype=jnp.bfloat16),
        )
        self.opt_state = self.tx.init(self.params)
        if self.mesh is not None:
            from ..parallel.mesh import replicate_tree

            self.params = replicate_tree(self.mesh, self.params)
            self.opt_state = replicate_tree(self.mesh, self.opt_state)
        return self.params

    def _dummy_nav_batch(self, B):
        sh, m = self.cfg.shapes, self.cfg.model
        N, K, C = sh.max_gmap_len, sh.max_local_len, m.num_bev_tokens
        D, A = m.hidden_size, m.angle_feat_size
        L = 8
        return {
            "txt_embeds": np.zeros((B, L, D), np.float32),
            "txt_masks": np.ones((B, L), bool),
            "gmap_img_embeds": np.zeros((B, N, D), np.float32),
            "gmap_step_ids": np.zeros((B, N), np.int32),
            "gmap_pos_fts": np.zeros((B, N, A + 3), np.float32),
            "gmap_masks": np.ones((B, N), bool),
            "gmap_pair_dists": np.zeros((B, N, N), np.float32),
            "gmap_visited_masks": np.zeros((B, N), bool),
            "bev_fts": np.zeros((B, C, m.bev_grid_feat_size), np.float32),
            "bev_pos_fts": np.zeros((B, C, A + 3 + 3), np.float32),
            "bev_masks": np.ones((B, C), bool),
            "bev_nav_masks": np.zeros((B, C), bool),
            "bev_cand_idxs": np.zeros((B, K), np.int32),
            "local_masks": np.ones((B, K), bool),
            "fuse_map": np.zeros((B, N, K), np.float32),
            **(
                {
                    "obj_embeds": np.zeros((B, sh.max_objects, D), np.float32),
                    "obj_masks": np.ones((B, sh.max_objects), bool),
                }
                if m.obj_feat_size > 0
                else {}
            ),
        }

    # ------------------------------------------------------------ jitted fns
    def _fn(self, name):
        if name in self._jitted:
            return self._jitted[name]
        model = self.model
        if name == "language":
            f = jax.jit(lambda p, b: model.apply({"params": p}, "language", b))
        elif name == "panorama":
            f = jax.jit(lambda p, b: model.apply({"params": p}, "panorama", b))
        elif name == "navigation":
            f = jax.jit(lambda p, b: model.apply({"params": p}, "navigation", b))
        elif name == "lift":
            f = jax.jit(self.projector.lift)
        elif name == "gather_splat":
            import functools

            f = jax.jit(functools.partial(gather_and_splat, self.projector))
        elif name == "loss_grad":
            f = jax.jit(jax.value_and_grad(self._episode_loss))
        elif name == "update":

            def update(params, opt_state, grads):
                updates, opt_state = self.tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state

            f = jax.jit(update)
        else:
            raise KeyError(name)
        self._jitted[name] = f
        return f

    # ---------------------------------------------------------- episode loss
    def _episode_loss(self, params, rb: Dict[str, jnp.ndarray]):
        """Replay: exact single-backward episode loss.

        rb holds step-stacked tensors with leading axis T; pano tokens are
        encoded for all steps jointly, then a scan over steps rebuilds the
        per-step global-map features through the recorded aggregation
        matrices (gradient flows into every contributing pano encoding).
        """
        model = self.model
        use_bev = self.cfg.model.use_bev
        T, B, V = rb["view_fts"].shape[:3]
        txt_embeds = model.apply(
            {"params": params}, "language",
            {"txt_ids": rb["txt_ids"], "txt_masks": rb["txt_masks"]},
            deterministic=False, rngs={"dropout": rb["rng_lang"]},
        )
        flat = lambda x: x.reshape(T * B, *x.shape[2:])
        pano_in = {
            "view_fts": flat(rb["view_fts"]),
            "loc_fts": flat(rb["loc_fts"]),
            "nav_types": flat(rb["nav_types"]),
            "view_lens": flat(rb["view_lens"]),
        }
        with_objects = "obj_fts" in rb
        if with_objects:
            pano_in["obj_fts"] = flat(rb["obj_fts"])
            pano_in["obj_lens"] = flat(rb["obj_lens"])
        pano_embeds, pano_masks = model.apply(
            {"params": params}, "panorama", pano_in,
            deterministic=False, rngs={"dropout": rb["rng_pano"]},
        )
        D = pano_embeds.shape[-1]
        P = pano_embeds.shape[1]  # view slots + object slots
        tokens4d = (pano_embeds * pano_masks[..., None]).reshape(T, B, P, D)
        tokens4d = jnp.transpose(tokens4d, (1, 0, 2, 3))  # (B, T, P, D)
        tokens = tokens4d.reshape(B, T * P, D)
        num_view_slots = rb["view_fts"].shape[2]

        def step_loss(carry, xs):
            gmap_img = jnp.einsum(
                "bnm,bmd->bnd", xs["gmap_agg"], tokens,
                preferred_element_type=jnp.float32,
            )
            nav_in = {
                "txt_embeds": txt_embeds,
                "txt_masks": rb["txt_masks"],
                "gmap_img_embeds": gmap_img,
                "gmap_step_ids": xs["gmap_step_ids"],
                "gmap_pos_fts": xs["gmap_pos_fts"],
                "gmap_masks": xs["gmap_masks"],
                "gmap_pair_dists": xs["gmap_pair_dists"],
                "gmap_visited_masks": xs["gmap_visited_masks"],
            }
            if use_bev:
                nav_in.update({
                    "bev_fts": xs["bev_fts"],
                    "bev_pos_fts": xs["bev_pos_fts"],
                    "bev_masks": jnp.ones(xs["bev_fts"].shape[:2], bool),
                    "bev_nav_masks": xs["bev_nav_masks"],
                    "bev_cand_idxs": xs["bev_cand_idxs"],
                    "local_masks": xs["local_masks"],
                    "fuse_map": xs["fuse_map"],
                })
            if with_objects:
                step_tokens = jax.lax.dynamic_slice_in_dim(
                    tokens4d, xs["step_idx"], 1, axis=1
                )[:, 0]  # (B, P, D)
                nav_in["obj_embeds"] = step_tokens[:, num_view_slots:]
                nav_in["obj_masks"] = (
                    jnp.arange(P - num_view_slots)[None, :]
                    < xs["obj_lens"][:, None]
                )
            outs = model.apply(
                {"params": params}, "navigation", nav_in, deterministic=False,
                rngs={"dropout": xs["rng"]},
            )

            def masked_ce(logits, targets):
                valid = targets != IGNORE_ID
                safe = jnp.where(valid, targets, 0)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
                return jnp.where(valid, nll, 0.0).sum()

            # sum-reduction CE with ignore_index (ref agent_base criterion);
            # the supervised head follows the fusion selection (agent.py:555)
            logits_key = {
                "avg": "fused_logits",
                "global": "global_logits",
                "local": "local_logits",
            }[self.cfg.fusion] if use_bev else "global_logits"
            loss = masked_ce(outs[logits_key], xs["targets"])
            if with_objects:
                loss = loss + masked_ce(outs["obj_logits"], xs["obj_targets"])
            return carry + loss, None

        xs_keys = [
            "gmap_agg", "gmap_step_ids", "gmap_pos_fts", "gmap_masks",
            "gmap_pair_dists", "gmap_visited_masks",
            "targets", "rng", "step_idx",
        ]
        if use_bev:
            xs_keys += [
                "bev_fts", "bev_pos_fts", "bev_nav_masks", "bev_cand_idxs",
                "local_masks", "fuse_map",
            ]
        if with_objects:
            xs_keys += ["obj_lens", "obj_targets"]
        xs = {k: rb[k] for k in xs_keys}
        # remat the per-step navigation forward: at full scale the scan would
        # otherwise store every step's cross-modal activations for the
        # backward (bev branch alone is ~50MB/step) and OOM a single chip;
        # recomputing trades ~1/3 more FLOPs for O(1) residency
        total, _ = jax.lax.scan(
            jax.checkpoint(step_loss), jnp.zeros((), jnp.float32), xs
        )
        return total * self.cfg.ml_weight / B

    # ------------------------------------------------------------- variables
    def _language_variable(self, obs):
        # bucket text length to multiples of 32 to bound recompilation
        raw = max(len(ob["instr_encoding"]) for ob in obs)
        L = min(((raw + 31) // 32) * 32, self.cfg.max_instr_len)
        B = len(obs)
        ids = np.zeros((B, L), np.int32)
        masks = np.zeros((B, L), bool)
        for i, ob in enumerate(obs):
            enc = np.asarray(ob["instr_encoding"])[:L]
            ids[i, : len(enc)] = enc
            masks[i, : len(enc)] = True
        return {"txt_ids": ids, "txt_masks": masks}

    @property
    def with_objects(self) -> bool:
        return self.cfg.model.obj_feat_size > 0

    def _panorama_variable(self, obs):
        """(ref _panorama_feature_variable, agent.py:70-113; object slots per
        reverie/agent_obj.py) static slots: views [0:V), objects [V:V+O)."""
        sh, m = self.cfg.shapes, self.cfg.model
        B, V = len(obs), sh.max_pano_len
        O = sh.max_objects if self.with_objects else 0
        A = m.angle_feat_size
        view_fts = np.zeros((B, V, m.image_feat_size), np.float32)
        loc_fts = np.zeros((B, V + O, A + 3), np.float32)
        nav_types = np.zeros((B, V + O), np.int32)
        view_lens = np.zeros(B, np.int32)
        cand_vpids: List[List[str]] = []
        obj_fts = np.zeros((B, O, m.obj_feat_size), np.float32) if O else None
        obj_lens = np.zeros(B, np.int32) if O else None
        obj_ids: List[List[str]] = []
        for i, ob in enumerate(obs):
            used = set()
            k = 0
            cands = []
            for cand in ob["candidate"]:
                if k >= V:
                    break
                view_fts[i, k] = cand["feature"][: m.image_feat_size]
                loc_fts[i, k, :A] = cand["feature"][m.image_feat_size :]
                loc_fts[i, k, A:] = 1.0
                nav_types[i, k] = 1
                used.add(cand["pointId"])
                cands.append(cand["viewpointId"])
                k += 1
            feat36 = ob["feature"]
            for view in range(36):
                if view in used or k >= V:
                    continue
                view_fts[i, k] = feat36[view, : m.image_feat_size]
                loc_fts[i, k, :A] = feat36[view, m.image_feat_size :]
                loc_fts[i, k, A:] = 1.0
                k += 1
            view_lens[i] = k
            cand_vpids.append(cands)
            if O:
                n_obj = min(len(ob.get("obj_ids", [])), O)
                if n_obj:
                    obj_fts[i, :n_obj] = ob["obj_img_fts"][:n_obj, : m.obj_feat_size]
                    loc_fts[i, V : V + n_obj, :A] = ob["obj_ang_fts"][:n_obj]
                    loc_fts[i, V : V + n_obj, A:] = ob["obj_box_fts"][:n_obj]
                    nav_types[i, V : V + n_obj] = 2
                obj_lens[i] = n_obj
                obj_ids.append(list(ob.get("obj_ids", []))[:O])
            else:
                obj_ids.append([])
        out = {
            "view_fts": view_fts, "loc_fts": loc_fts, "nav_types": nav_types,
            "view_lens": view_lens,
        }
        if O:
            out["obj_fts"] = obj_fts
            out["obj_lens"] = obj_lens
        return out, cand_vpids, obj_ids

    def lift(self, obs):
        """World point clouds from the 12 agent-relative camera grids
        (ref agent.py:115-141). Depth is stored metres/10."""
        B = len(obs)
        nv = self.cfg.shapes.num_views
        xyzhe = np.zeros((B, nv, 5), np.float32)
        for i, ob in enumerate(obs):
            x, y, z = ob["position"]
            xyzhe[i, :, 0] = x
            xyzhe[i, :, 1] = z
            xyzhe[i, :, 2] = -y
            xyzhe[i, :, 3] = -(
                np.arange(nv) * (2 * math.pi / nv) + ob["heading"]
            )
            xyzhe[i, :, 4] = math.pi
        T = se3_from_xyzhe(xyzhe.reshape(-1, 5)).reshape(B, nv, 4, 4)
        depths = np.stack([ob["depth"] for ob in obs]).astype(np.float32) * 10.0
        pc, no_depth = self._fn("lift")(depths, T)
        feats = jax.device_put(
            np.stack([ob["rgb"] for ob in obs]).reshape(
                B, -1, self.cfg.model.bev_grid_feat_size
            )
        )
        return pc, ~no_depth, feats  # device arrays

    def _make_pc_store(self, B: int) -> DevicePcStore:
        return DevicePcStore(
            B, self.cfg.max_action_len, self.cfg.shapes.num_points,
            self.cfg.model.bev_grid_feat_size,
        )

    @property
    def num_pano_slots(self) -> int:
        sh = self.cfg.shapes
        return sh.max_pano_len + (sh.max_objects if self.with_objects else 0)

    def _nav_gmap_variable(self, obs, gmaps, pano_store):
        """Global-map tensors + aggregation matrix + node embeds for the
        policy (ref _nav_gmap_variable, agent.py:194-267)."""
        sh, m = self.cfg.shapes, self.cfg.model
        B, N = len(obs), sh.max_gmap_len
        V = self.num_pano_slots
        T = self.cfg.max_action_len
        A = m.angle_feat_size
        out = {
            "gmap_vpids": [],
            "gmap_agg": np.zeros((B, N, T * V), np.float32),
            "gmap_step_ids": np.zeros((B, N), np.int32),
            "gmap_pos_fts": np.zeros((B, N, A + 3), np.float32),
            "gmap_masks": np.zeros((B, N), bool),
            "gmap_visited_masks": np.zeros((B, N), bool),
            "gmap_pair_dists": np.zeros((B, N, N), np.float32),
            "no_vp_left": [],
        }
        act_visited = getattr(self.cfg, "act_visited_nodes", False)
        for i, (ob, gmap) in enumerate(zip(obs, gmaps)):
            if act_visited:
                # only the CURRENT node counts as visited, so previously
                # visited nodes stay actionable (ref agent.py:205-210
                # --act_visited_nodes)
                visited = [k for k in gmap.node_positions
                           if k == ob["viewpoint"]]
                unvisited = [k for k in gmap.node_positions
                             if k != ob["viewpoint"]]
            else:
                visited = [k for k in gmap.node_positions
                           if gmap.graph.visited(k)]
                unvisited = [k for k in gmap.node_positions
                             if not gmap.graph.visited(k)]
            out["no_vp_left"].append(len(unvisited) == 0)
            vpids = ([None] + visited + unvisited)[:N]
            n = len(vpids)
            out["gmap_vpids"].append(vpids)
            out["gmap_masks"][i, :n] = True
            out["gmap_visited_masks"][i, 1 : 1 + len(visited)] = True
            out["gmap_step_ids"][i, :n] = [
                min(gmap.node_step_ids.get(vp, 0), m.max_action_steps - 1)
                for vp in vpids
            ]
            out["gmap_pos_fts"][i, :n] = gmap.get_pos_fts(
                ob["viewpoint"], vpids, ob["heading"], ob["elevation"], A
            )
            for a in range(1, n):
                for b in range(a + 1, n):
                    d = gmap.graph.distance(vpids[a], vpids[b]) / 30.0
                    out["gmap_pair_dists"][i, a, b] = d
                    out["gmap_pair_dists"][i, b, a] = d
            n_view_slots = self.cfg.shapes.max_pano_len
            for node, vp in enumerate(vpids):
                if vp is None:
                    continue
                refs = gmap.node_embed_refs.get(vp, [])
                if not refs:
                    continue
                w = 1.0 / len(refs)
                for (t, slot, _wt) in refs:
                    if slot == -1:
                        # visited: masked mean over ALL tokens of that step's
                        # pano (views + objects; ref avg_pano_embeds,
                        # agent.py:489-490)
                        vl = int(pano_store["view_lens"][t][i])
                        ol = int(pano_store["obj_lens"][t][i]) if self.with_objects else 0
                        total = max(vl + ol, 1)
                        out["gmap_agg"][i, node, t * V : t * V + vl] += w / total
                        if ol:
                            base = t * V + n_view_slots
                            out["gmap_agg"][i, node, base : base + ol] += w / total
                    else:
                        out["gmap_agg"][i, node, t * V + slot] += w
        return out

    def _nav_bev_variable(self, obs, gmaps, pc_store: DevicePcStore):
        """Gather neighbourhood point clouds (device-side, from the
        DevicePcStore), splat to egocentric BEV, map candidates to cells
        (ref agent.py:269-337)."""
        sh, m = self.cfg.shapes, self.cfg.model
        B = len(obs)
        C, K = m.num_bev_tokens, sh.max_local_len
        S_max = sh.max_pc_steps
        A = m.angle_feat_size
        step_sel = np.zeros((B, S_max), np.int32)
        step_ok = np.zeros((B, S_max), bool)
        S_w2c = np.zeros((B, 3), np.float32)
        T_w2c = np.zeros((B, 4, 4), np.float32)
        bev_nav_masks = np.zeros((B, C), bool)
        bev_cand_idxs = np.zeros((B, K), np.int32)
        local_masks = np.zeros((B, K), bool)
        bev_cand_vpids: List[List[Optional[str]]] = []
        bev_pos_fts = np.zeros((B, C, A + 3 + 3), np.float32)
        for i, (ob, gmap) in enumerate(zip(obs, gmaps)):
            steps = gmap.gather_pc_steps(ob["viewpoint"], self.cfg.pc_order)[-S_max:]
            step_sel[i, : len(steps)] = steps
            step_ok[i, : len(steps)] = True
            x, y, z = ob["position"]
            S_w2c[i] = [x, z, -y]
            T_w2c[i] = se3_from_xyzhe(
                np.array([[0, 0, 0, ob["heading"], 0]], np.float32)
            )[0]
            cand_pos = np.array(
                [c["position"] for c in ob["candidate"]], np.float64
            ).reshape(-1, 3)
            cells = world_to_ego_cells_stop_centre(
                cand_pos, np.asarray(ob["position"]), ob["heading"],
                m.bev_dim, m.bev_res,
            )[:K]
            bev_cand_idxs[i, : len(cells)] = cells
            local_masks[i, : len(cells)] = True
            bev_nav_masks[i, cells] = True
            bev_cand_vpids.append(
                ([None] + [c["viewpointId"] for c in ob["candidate"]])[:K]
            )
            gpos = gmap.get_pos_fts(
                ob["viewpoint"], [gmap.start_vp], ob["heading"], ob["elevation"], A
            )[0]
            bev_pos_fts[i, :, : A + 3] = gpos
            bev_pos_fts[i, :, A + 3 :] = self.polar
        bev_fts = self._fn("gather_splat")(
            pc_store.pc, pc_store.valid, pc_store.feats,
            step_sel, step_ok, T_w2c, S_w2c,
        )
        return {
            "bev_fts": bev_fts,
            "bev_pos_fts": bev_pos_fts,
            "bev_nav_masks": bev_nav_masks,
            "bev_cand_idxs": bev_cand_idxs,
            "local_masks": local_masks,
            "bev_cand_vpids": bev_cand_vpids,
        }

    def _build_fuse_map(self, gmap_vpids, gmap_visited_masks, bev_cand_vpids):
        sh = self.cfg.shapes
        B, N, K = len(gmap_vpids), sh.max_gmap_len, sh.max_local_len
        fm = np.zeros((B, N, K), np.float32)
        for i in range(B):
            fm[i, 0, 0] = 1.0
            visited = {
                vp for vp, m in zip(gmap_vpids[i], gmap_visited_masks[i]) if m and vp
            }
            back_cols = [
                k for k, vp in enumerate(bev_cand_vpids[i])
                if k > 0 and vp in visited
            ]
            fresh = {
                vp: k for k, vp in enumerate(bev_cand_vpids[i])
                if k > 0 and vp not in visited
            }
            for n, vp in enumerate(gmap_vpids[i]):
                if n == 0 or vp is None or vp in visited:
                    continue
                if vp in fresh:
                    fm[i, n, fresh[vp]] = 1.0
                else:
                    for k in back_cols:
                        fm[i, n, k] = 1.0
        return fm

    # --------------------------------------------------------------- teacher
    def _teacher_action(self, obs, vpids, ended, visited_masks=None,
                        imitation_learning=False, t=None, traj=None):
        """(ref _teacher_action_r4r, agent.py:371-417)."""
        a = np.full(len(obs), IGNORE_ID, np.int64)
        for i, ob in enumerate(obs):
            if ended[i]:
                continue
            g = self.env.graphs[ob["scan"]]
            if imitation_learning:
                if ob["viewpoint"] != ob["gt_path"][t]:
                    # agent deviated (shouldn't happen under teacher forcing)
                    a[i] = IGNORE_ID
                    continue
                if t == len(ob["gt_path"]) - 1:
                    a[i] = 0
                else:
                    goal = ob["gt_path"][t + 1]
                    for j, vp in enumerate(vpids[i]):
                        if vp == goal:
                            a[i] = j
                            break
                continue
            if ob["viewpoint"] == ob["gt_path"][-1]:
                a[i] = 0
                continue
            best, best_j = math.inf, IGNORE_ID
            for j, vp in enumerate(vpids[i]):
                if j == 0 or vp is None:
                    continue
                if visited_masks is not None and visited_masks[i][j]:
                    continue
                if self.cfg.expert_policy == "ndtw":
                    cand_path = (
                        sum(traj[i]["path"], [])
                        + self.env.graphs[ob["scan"]].path(ob["viewpoint"], vp)
                    )
                    cost = -compute_dtw_metrics(
                        g.distance, cand_path, ob["gt_path"], threshold=3.0
                    )["nDTW"]
                else:  # spl expert
                    cost = g.distance(vp, ob["gt_path"][-1]) + g.distance(
                        ob["viewpoint"], vp
                    )
                if cost < best:
                    best, best_j = cost, j
            a[i] = best_j
        return a

    def _teacher_object(self, obs, ended, obj_ids):
        """Ground-truth object index at goal viewpoints
        (ref _teacher_object, reverie/agent_obj.py:384-401)."""
        targets = np.full(len(obs), IGNORE_ID, np.int64)
        for i, ob in enumerate(obs):
            if ended[i] or ob["viewpoint"] not in ob.get("gt_end_vps", []):
                continue
            for j, oid in enumerate(obj_ids[i]):
                if str(oid) == str(ob.get("gt_obj_id")):
                    targets[i] = j
                    break
        return targets

    # --------------------------------------------------------------- rollout
    def rollout(self, feedback: str = "sample", train: bool = True):
        cfg = self.cfg
        obs = self.env.reset()
        B = len(obs)
        T = cfg.max_action_len

        gmaps = [GraphMap(ob["viewpoint"]) for ob in obs]
        for i, ob in enumerate(obs):
            gmaps[i].update_graph(ob)
        traj = [
            {"instr_id": ob["instr_id"], "path": [[ob["viewpoint"]]],
             "pred_objid": None}
            for ob in obs
        ]
        lang = self._language_variable(obs)
        txt_embeds = self._fn("language")(self.params, lang)

        ended = np.zeros(B, bool)
        just_ended = np.zeros(B, bool)
        pano_store = {"view_lens": {}, "obj_lens": {}, "embeds": {}}
        pc_store = self._make_pc_store(B)
        records: List[StepRecord] = []

        for t in range(T):
            for i, gmap in enumerate(gmaps):
                if not ended[i]:
                    gmap.node_step_ids[obs[i]["viewpoint"]] = t + 1

            # dispatch the pano forward (async under jax), then do every piece
            # of host work that does not need its result before forcing it —
            # lift prep, graph bookkeeping, gmap/bev variable building all
            # overlap the device forward (SURVEY §7 hard-part (b))
            pano_in, cand_vpids, obj_ids = self._panorama_variable(obs)
            pano_embeds, pano_masks = self._fn("panorama")(self.params, pano_in)
            if _EAGER_SYNC:  # diagnostic: measure what the overlap buys
                np.asarray(pano_embeds)
            pano_store["view_lens"][t] = pano_in["view_lens"]
            if self.with_objects:
                pano_store["obj_lens"][t] = pano_in["obj_lens"]

            pc, pc_valid, pc_feats = self.lift(obs)
            pc_store.set_step(t, pc, pc_valid, pc_feats)

            for i, gmap in enumerate(gmaps):
                if ended[i]:
                    continue
                vp = obs[i]["viewpoint"]
                gmap.set_visited_embed(vp, t, pano_in["view_lens"][i])
                gmap.set_node_pc(vp, t)
                for j, cand_vp in enumerate(cand_vpids[i]):
                    if not gmap.graph.visited(cand_vp):
                        gmap.add_sighting(cand_vp, t, j)

            nav_g = self._nav_gmap_variable(obs, gmaps, pano_store)
            nav_b = self._nav_bev_variable(obs, gmaps, pc_store)
            fuse_map = self._build_fuse_map(
                nav_g["gmap_vpids"], nav_g["gmap_visited_masks"],
                nav_b["bev_cand_vpids"],
            )
            # first point that needs the pano result on host: force it now
            pano_np = np.asarray(pano_embeds)
            pano_store["embeds"][t] = pano_np
            # node embeds for the policy: host contraction of stored pano
            gmap_img = self._policy_node_embeds(nav_g["gmap_agg"], pano_store, B)
            nav_in = {
                "txt_embeds": txt_embeds,
                "txt_masks": lang["txt_masks"],
                "gmap_img_embeds": gmap_img,
                "gmap_step_ids": nav_g["gmap_step_ids"],
                "gmap_pos_fts": nav_g["gmap_pos_fts"],
                "gmap_masks": nav_g["gmap_masks"],
                "gmap_pair_dists": nav_g["gmap_pair_dists"],
                "gmap_visited_masks": nav_g["gmap_visited_masks"],
                "bev_fts": nav_b["bev_fts"],
                "bev_pos_fts": nav_b["bev_pos_fts"],
                "bev_masks": np.ones((B, self.cfg.model.num_bev_tokens), bool),
                "bev_nav_masks": nav_b["bev_nav_masks"],
                "bev_cand_idxs": nav_b["bev_cand_idxs"],
                "local_masks": nav_b["local_masks"],
                "fuse_map": fuse_map,
            }
            if self.with_objects:
                V = self.cfg.shapes.max_pano_len
                O = self.cfg.shapes.max_objects
                nav_in["obj_embeds"] = pano_np[:, V : V + O]
                nav_in["obj_masks"] = (
                    np.arange(O)[None, :] < pano_in["obj_lens"][:, None]
                )
            nav_outs = self._fn("navigation")(self.params, nav_in)
            if _EAGER_SYNC:
                np.asarray(nav_outs["fused_logits"])
            nav_vpids = (
                nav_b["bev_cand_vpids"] if self.cfg.fusion == "local"
                else nav_g["gmap_vpids"]
            )

            # host teacher (Dijkstra expert) overlaps the device nav forward:
            # it only needs the host-side vpid lists
            targets = self._teacher_action(
                obs, nav_vpids, ended,
                visited_masks=(
                    None if self.cfg.fusion == "local"
                    else nav_g["gmap_visited_masks"]
                ),
                imitation_learning=(feedback == "teacher"), t=t, traj=traj,
            )
            obj_targets = None
            if self.with_objects:
                obj_targets = self._teacher_object(obs, ended, obj_ids)

            # fusion selection (ref agent.py:516-524): fused/global score the
            # map nodes; 'local' scores the current candidates only
            logits_key = {
                "local": "local_logits", "global": "global_logits",
            }.get(self.cfg.fusion, "fused_logits")
            nav_logits = np.asarray(nav_outs[logits_key])
            nav_probs = np.exp(
                nav_logits - nav_logits.max(-1, keepdims=True)
            )
            nav_probs /= nav_probs.sum(-1, keepdims=True)

            for i, gmap in enumerate(gmaps):
                if not ended[i]:
                    vp = obs[i]["viewpoint"]
                    gmap.node_stop_scores[vp] = float(nav_probs[i, 0])
                    if self.with_objects and obj_ids[i]:
                        ol = np.asarray(nav_outs["obj_logits"])[i]
                        gmap.node_og[vp] = obj_ids[i][
                            int(ol[: len(obj_ids[i])].argmax())
                        ]

            if train:
                records.append(
                    StepRecord(
                        active=~ended.copy(),
                        view_fts=pano_in["view_fts"],
                        loc_fts=pano_in["loc_fts"],
                        nav_types=pano_in["nav_types"],
                        view_lens=pano_in["view_lens"],
                        gmap_agg=nav_g["gmap_agg"],
                        gmap_step_ids=nav_g["gmap_step_ids"],
                        gmap_pos_fts=nav_g["gmap_pos_fts"],
                        gmap_masks=nav_g["gmap_masks"],
                        gmap_visited_masks=nav_g["gmap_visited_masks"],
                        gmap_pair_dists=nav_g["gmap_pair_dists"],
                        bev_fts=nav_b["bev_fts"],
                        bev_nav_masks=nav_b["bev_nav_masks"],
                        bev_cand_idxs=nav_b["bev_cand_idxs"],
                        local_masks=nav_b["local_masks"],
                        fuse_map=fuse_map,
                        bev_pos_fts=nav_b["bev_pos_fts"],
                        targets=np.where(ended, IGNORE_ID, targets),
                        step_idx=t,
                        obj_fts=pano_in.get("obj_fts"),
                        obj_lens=pano_in.get("obj_lens"),
                        obj_targets=obj_targets,
                    )
                )

            # pick actions
            if feedback == "teacher":
                a_t = targets
            elif feedback == "argmax":
                a_t = nav_logits.argmax(-1)
            elif feedback == "sample":
                a_t = np.array(
                    [
                        self.np_rng.choice(len(p), p=p)
                        for p in nav_probs
                    ]
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    ent = -np.nansum(
                        np.where(nav_probs > 0,
                                 nav_probs * np.log(nav_probs), 0.0), -1
                    )
                self.logs["entropy"].append(float(ent.sum()))
            elif feedback == "expl_sample":
                # argmax with epsilon exploration over actionable entries
                # (ref agent.py:569-580: explore w.p. 1 - expl_max_ratio)
                a_t = nav_logits.argmax(-1)
                if self.cfg.fusion == "local":
                    actionable = np.asarray(nav_b["bev_nav_masks"], bool)
                else:
                    actionable = np.asarray(nav_g["gmap_masks"], bool) & ~(
                        np.asarray(nav_g["gmap_visited_masks"], bool)
                    )
                explore = self.np_rng.random(B) > self.cfg.expl_max_ratio
                for i in range(B):
                    if explore[i] and actionable[i].any():
                        a_t[i] = self.np_rng.choice(
                            np.arange(actionable.shape[1])[actionable[i]]
                        )
            else:
                raise ValueError(feedback)

            if feedback in ("teacher", "sample"):
                a_t_stop = [ob["viewpoint"] == ob["gt_path"][-1] for ob in obs]
            else:
                a_t_stop = a_t == 0

            actions: List[Optional[str]] = []
            for i in range(B):
                if (
                    a_t_stop[i]
                    or ended[i]
                    or nav_g["no_vp_left"][i]
                    or t == T - 1
                    or targets[i] == IGNORE_ID and feedback == "teacher"
                ):
                    actions.append(None)
                    just_ended[i] = True
                else:
                    actions.append(nav_vpids[i][a_t[i]])

            self._make_equiv_action(actions, gmaps, obs, traj)

            # stop-node backtrack on episode end (ref agent.py:602-615)
            for i in range(B):
                if not ended[i] and just_ended[i]:
                    stop_node, stop_score = None, -math.inf
                    for vp, sc in gmaps[i].node_stop_scores.items():
                        if sc > stop_score:
                            stop_node, stop_score = vp, sc
                    if stop_node is not None and obs[i]["viewpoint"] != stop_node:
                        traj[i]["path"].append(
                            gmaps[i].graph.path(obs[i]["viewpoint"], stop_node)
                        )
                    if self.with_objects and stop_node is not None:
                        traj[i]["pred_objid"] = gmaps[i].node_og.get(stop_node)

            obs = self.env.get_obs()
            for i, ob in enumerate(obs):
                if not ended[i]:
                    gmaps[i].update_graph(ob)
            ended |= np.array([a is None for a in actions])
            if ended.all():
                break

        loss = None
        if train and records:
            loss = self._learn(lang, records)
        return traj, loss

    def _policy_node_embeds(self, gmap_agg, pano_store, B):
        V = self.num_pano_slots
        T = self.cfg.max_action_len
        D = self.cfg.model.hidden_size
        tokens = np.zeros((B, T * V, D), np.float32)
        for t, emb in pano_store["embeds"].items():
            v = emb.shape[1]
            tokens[:, t * V : t * V + v] = emb
        return np.einsum("bnm,bmd->bnd", gmap_agg, tokens).astype(np.float32)

    def _make_equiv_action(self, actions, gmaps, obs, traj):
        """Teleport to the chosen node along the map's shortest path
        (ref make_equiv_action, agent.py:419-435)."""
        for i, ob in enumerate(obs):
            act = actions[i]
            if act is None:
                continue
            path = gmaps[i].graph.path(ob["viewpoint"], act)
            traj[i]["path"].append(path)
            prev = (
                traj[i]["path"][-2][-1] if len(path) == 1 else path[-2]
            )
            cands = self.env.scanvp_cands.get(f"{ob['scan']}_{prev}", {})
            viewidx = cands.get(act, [12])[0]
            heading = (viewidx % 12) * math.radians(30.0)
            self.env.teleport(i, act, heading)

    # ----------------------------------------------------------------- learn
    def _learn(self, lang, records: List[StepRecord]):
        T = self.cfg.max_action_len
        B = records[0].view_fts.shape[0]

        def stack(attr):
            arrs = [np.asarray(getattr(r, attr)) for r in records]
            pad = T - len(arrs)
            if pad:
                arrs = arrs + [np.zeros_like(arrs[0])] * pad
            return np.stack(arrs)

        keys = [
            "view_fts", "loc_fts", "nav_types", "view_lens", "gmap_agg",
            "gmap_step_ids", "gmap_pos_fts", "gmap_masks",
            "gmap_pair_dists", "gmap_visited_masks",
        ]
        if self.cfg.model.use_bev:
            keys += ["bev_nav_masks", "bev_cand_idxs", "local_masks",
                     "fuse_map", "bev_pos_fts"]
        rb = {k: stack(k) for k in keys}
        if self.cfg.model.use_bev:
            bev = [np.asarray(r.bev_fts) for r in records]
            bev += [np.zeros_like(bev[0])] * (T - len(bev))
            rb["bev_fts"] = np.stack(bev)
        tgt = [r.targets for r in records]
        tgt += [np.full_like(tgt[0], IGNORE_ID)] * (T - len(tgt))
        rb["targets"] = np.stack(tgt)
        rb["txt_ids"] = lang["txt_ids"]
        rb["txt_masks"] = lang["txt_masks"]
        rb["step_idx"] = np.arange(T, dtype=np.int32)
        if self.with_objects:
            for attr, fill in (("obj_fts", 0.0), ("obj_lens", 0), ("obj_targets", IGNORE_ID)):
                arrs = [np.asarray(getattr(r, attr)) for r in records]
                pad_arr = (
                    np.full_like(arrs[0], fill)
                    if attr == "obj_targets" else np.zeros_like(arrs[0])
                )
                arrs += [pad_arr] * (T - len(arrs))
                rb[attr] = np.stack(arrs)
        return self.learn_from_bundle(rb)

    def learn_from_bundle(self, rb: Dict[str, Any]) -> float:
        """One replay update from a prepared bundle (online rollouts and the
        teacher-recollection store share this path)."""
        T = rb["targets"].shape[0]
        rb = dict(rb)
        self.rng, sub = jax.random.split(self.rng)
        keys = jax.random.split(sub, T + 2)
        rb["rng"] = keys[:T]
        rb["rng_lang"] = keys[T]
        rb["rng_pano"] = keys[T + 1]
        if self.mesh is not None:
            from ..parallel.mesh import shard_replay_bundle

            rb = shard_replay_bundle(self.mesh, rb)
        # padded steps are fully masked (attn bias NEG_INF, targets ignored)
        loss, grads = self._fn("loss_grad")(self.params, rb)
        self.params, self.opt_state = self._fn("update")(
            self.params, self.opt_state, grads
        )
        loss_val = float(loss)
        self.logs["IL_loss"].append(loss_val)
        return loss_val

    # ----------------------------------------------------------- checkpoints
    def save_ckpt(self, path: str):
        """Params + optimiser state (ref agent_base.py:219-234 save dict)."""
        import os

        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                os.path.abspath(path),
                {"params": self.params, "opt_state": self.opt_state},
                force=True,
            )

    def restore_ckpt(self, path: str, with_opt: bool = True):
        import os

        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            target = {"params": self.params, "opt_state": self.opt_state}
            restored = ckptr.restore(os.path.abspath(path), target)
        self.params = restored["params"]
        if with_opt:
            self.opt_state = restored["opt_state"]

    # ------------------------------------------------------------------ test
    def test(self, max_batches: Optional[int] = None):
        """Greedy evaluation over the dataset until it wraps
        (ref agent_base.py:44-70)."""
        self.env.reset_epoch(shuffle=False)
        results = {}
        n = 0
        while True:
            trajs, _ = self.rollout(feedback="argmax", train=False)
            looped = False
            for tr in trajs:
                if tr["instr_id"] in results:
                    looped = True
                else:
                    results[tr["instr_id"]] = tr
            n += 1
            if looped or (max_batches and n >= max_batches):
                break
        return [
            {
                "instr_id": k,
                "trajectory": v["path"],
                "pred_objid": v.get("pred_objid"),
            }
            for k, v in results.items()
        ]

    def train_iters(self, n_iters: int, feedback: str = "sample"):
        losses = []
        for _ in range(n_iters):
            if feedback == "dagger":
                # DAgger interleaves a teacher-forced and a sampled rollout
                # per iteration (ref agent_base.py:195-202)
                _, l1 = self.rollout(feedback="teacher", train=True)
                _, l2 = self.rollout(feedback="sample", train=True)
                losses += [l for l in (l1, l2) if l is not None]
            else:
                _, loss = self.rollout(feedback=feedback, train=True)
                if loss is not None:
                    losses.append(loss)
        return losses


def make_replay_block(agent: "GMapNavAgent", length: int):
    """Compiled ``lax.scan`` of ``length`` replay updates (episode BPTT loss +
    grad + optimizer) in ONE program.

    One host dispatch covers ``length`` optimizer steps, so the measured time
    is device time — immune to per-dispatch RPC latency on tunnelled dev
    backends (the failure mode that made per-step ft timing meaningless, see
    ROADMAP.md "Environment gotchas"). Usable both as a bench probe and as a
    real replay-training inner loop over a fixed bundle.
    """
    import functools

    loss_grad = jax.value_and_grad(agent._episode_loss)
    tx = agent.tx

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def block(params, opt_state, rb, key):
        T = rb["targets"].shape[0]

        def body(carry, k):
            params, opt_state = carry
            ks = jax.random.split(k, T + 2)
            rb_step = dict(rb)
            rb_step["rng"] = ks[:T]
            rb_step["rng_lang"] = ks[T]
            rb_step["rng_pano"] = ks[T + 1]
            loss, grads = loss_grad(params, rb_step)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, length)
        )
        return params, opt_state, losses

    return block


def make_rollout_block(agent: "GMapNavAgent", episodes: int):
    """Compiled device-time envelope of the LIVE rollout's forward chain:
    language once, then per step the panorama encoder -> node-feature
    contraction over the accumulated pano-token history -> navigation scorer
    — the three per-step programs rollout() dispatches (agent.py:773-846),
    chained as one ``lax.scan`` per episode and scanned over ``episodes``
    episodes so tunnel RPC latency cannot contaminate the measurement (same
    rationale as make_replay_block). Host sim stepping / graph bookkeeping is
    excluded by construction: this is the device-side rollout envelope
    (ref envelope: scripts/ft_r2r.bash:22-62 DAgger rollouts).

    The per-step token history is carried as a (B, T, P, D) buffer updated
    with the step's pano tokens — the device analogue of the rollout's host
    pano_store + _policy_node_embeds contraction.
    """
    import functools

    model = agent.model
    use_bev = agent.cfg.model.use_bev

    def episode_fwd(params, rb):
        T, B = rb["targets"].shape[0], rb["txt_ids"].shape[0]
        txt_embeds = model.apply(
            {"params": params}, "language",
            {"txt_ids": rb["txt_ids"], "txt_masks": rb["txt_masks"]},
        )

        def body(carry, xs):
            buf, acc = carry
            pano_in = {
                "view_fts": xs["view_fts"], "loc_fts": xs["loc_fts"],
                "nav_types": xs["nav_types"], "view_lens": xs["view_lens"],
            }
            pano_embeds, pano_masks = model.apply(
                {"params": params}, "panorama", pano_in
            )
            tok = (pano_embeds * pano_masks[..., None]).astype(buf.dtype)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, tok[:, None], xs["step_idx"], axis=1
            )
            gmap_img = jnp.einsum(
                "bnm,bmd->bnd", xs["gmap_agg"],
                buf.reshape(B, -1, buf.shape[-1]),
                preferred_element_type=jnp.float32,
            )
            nav_in = {
                "txt_embeds": txt_embeds, "txt_masks": rb["txt_masks"],
                "gmap_img_embeds": gmap_img,
                "gmap_step_ids": xs["gmap_step_ids"],
                "gmap_pos_fts": xs["gmap_pos_fts"],
                "gmap_masks": xs["gmap_masks"],
                "gmap_pair_dists": xs["gmap_pair_dists"],
                "gmap_visited_masks": xs["gmap_visited_masks"],
            }
            if use_bev:
                nav_in.update({
                    "bev_fts": xs["bev_fts"], "bev_pos_fts": xs["bev_pos_fts"],
                    "bev_masks": jnp.ones(xs["bev_fts"].shape[:2], bool),
                    "bev_nav_masks": xs["bev_nav_masks"],
                    "bev_cand_idxs": xs["bev_cand_idxs"],
                    "local_masks": xs["local_masks"],
                    "fuse_map": xs["fuse_map"],
                })
            outs = model.apply({"params": params}, "navigation", nav_in)
            return (buf, acc + jnp.sum(outs["fused_logits" if use_bev
                                            else "global_logits"])), None

        xs_keys = [
            "view_fts", "loc_fts", "nav_types", "view_lens",
            "gmap_agg", "gmap_step_ids", "gmap_pos_fts", "gmap_masks",
            "gmap_pair_dists", "gmap_visited_masks", "step_idx",
        ]
        if use_bev:
            xs_keys += ["bev_fts", "bev_pos_fts", "bev_nav_masks",
                        "bev_cand_idxs", "local_masks", "fuse_map"]
        P = rb["view_fts"].shape[2]
        D = agent.cfg.model.hidden_size
        buf0 = jnp.zeros((B, T, P, D), jnp.float32)
        (_, acc), _ = jax.lax.scan(
            body, (buf0, jnp.zeros((), jnp.float32)),
            {k: rb[k] for k in xs_keys},
        )
        return acc

    @functools.partial(jax.jit, static_argnums=())
    def block(params, rb):
        def ep(acc, _):
            return acc + episode_fwd(params, rb), None

        acc, _ = jax.lax.scan(
            ep, jnp.zeros((), jnp.float32), None, length=episodes
        )
        return acc

    return block


class _EnvStub:
    """Just enough env surface for init_params/learn_from_bundle."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size


def make_replay_agent(cfg: FinetuneConfig, batch_size: int, mesh=None,
                      seed: int = 0) -> "GMapNavAgent":
    """An env-less agent for replay-only training (recollection stores,
    sharding tests, the driver's multichip dryrun)."""
    agent = GMapNavAgent(cfg, _EnvStub(batch_size), seed=seed, mesh=mesh)
    agent.init_params()
    return agent


def _dryrun_finetune_step(mesh, n_devices: int) -> None:
    """One mesh-sharded replay update at reduced width — called from
    __graft_entry__.dryrun_multichip.

    Width/depth are cut (hidden 256, 1 layer per stack, 2 BPTT steps): the
    dryrun's job is proving the sharded episode-BPTT program compiles and
    executes over the mesh inside the driver's clock — round 2 ran this at
    hidden 768 and burned ~13 min of an 8x-time-shared single core.
    Hidden-768 replay sharding math is pinned by tests/test_train_step.py's
    DP==single-device equality tests."""
    from ..configs import ModelConfig, ShapeConfig
    from ..data.synthetic import synthetic_replay_bundle

    model_cfg = ModelConfig(
        vocab_size=2048, hidden_size=256, num_attention_heads=4,
        intermediate_size=1024, num_l_layers=1, num_pano_layers=1,
        num_x_layers=1, image_feat_size=256, bev_grid_feat_size=256,
        bev_dim=5, dtype="float32", max_position_embeddings=64,
    )
    shapes = ShapeConfig(
        max_txt_len=16, max_steps=3, max_pano_len=8, max_gmap_len=8,
        max_local_len=4, max_objects=0, num_views=4, grid_hw=4,
        max_pc_steps=2,
    )
    cfg = FinetuneConfig(
        model=model_cfg, shapes=shapes, batch_size=1 * n_devices,
        max_action_len=2, learning_rate=1e-4,
    )
    agent = make_replay_agent(cfg, batch_size=1 * n_devices, mesh=mesh)
    rb = synthetic_replay_bundle(np.random.default_rng(0), cfg, 1 * n_devices)
    loss = agent.learn_from_bundle(rb)
    assert np.isfinite(loss), loss
