"""DAgger / teacher-recollection trainer for the legacy PREVALENT policy.

Role of the reference's registered "dagger" trainer
(/root/reference/bevbert_ce/vlnce_baselines/dagger_trainer.py:186-188):
collect beta-mixed teacher/policy trajectories in the continuous env once per
dagger iteration, persist the per-step training inputs to a disk store (the
reference uses an LMDB with a 1 TB map, dagger_trainer.py:101-111), then run
supervised epochs streaming episodes back from disk — the simulator is never
touched during the epochs.

The trained policy is Recurrent VLN-BERT (PREVALENT, models/legacy.py), the
CMA/Seq2Seq-era baseline the reference's dagger trainer drives through
BaseVLNCETrainer's 'VLNBERT' branch (common/base_il_trainer.py:350-470).
Candidate tokens are embedded by a VisionEncoder-style projection
(vlnbert_PREVALENT.py:345-359: visn_fc -> LayerNorm -> dropout) over
[rgb view feature | spatially-pooled depth feature | direction features] —
the reference's img_feature_dim=2176 concat, rebuilt here because the
policy-net wrapper that did the concat upstream is not part of the reference
repo (its dagger trainer imports it from the VLN-CE baseline lineage).

TPU-first shape discipline: candidate slots are static (K = max_cands + 1
with the stop action in the slot after the last live candidate, masked
beyond), episodes are padded to max_action_len with action=-100, and the
whole BPTT update (language encode + per-step recurrent visual scan + CE
loss + clipped AdamW) is ONE jitted program (the reference loops python
per step and backwards once, dagger_trainer.py:420-462).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..ops.dropout import Dropout
from ..configs import FinetuneConfig, ModelConfig
from ..utils.npz_store import NpzShardStore
from ..geometry import angle_features
from ..models.bert import dense, layer_norm
from ..models.legacy import RecurrentVLNBert
from .geometry_ce import heading_from_quaternion
from .graph_map import estimate_cand_pos
from .waypoint_predictor import WaypointPredictor, extract_waypoints

IGNORE_ID = -100
STOP_RADIUS = 1.5  # ref dagger_trainer.py:224 "within target range"


class PrevalentPolicy(nn.Module):
    """Candidate embedder + RecurrentVLNBert core."""

    cfg: ModelConfig

    def setup(self):
        self.vln_bert = RecurrentVLNBert(self.cfg)
        # VisionEncoder role (vlnbert_PREVALENT.py:345-359)
        self.visn_fc = dense(self.cfg, self.cfg.hidden_size, name="visn_fc")
        self.visn_ln = layer_norm(self.cfg, name="visn_ln")
        self.visn_dropout = Dropout(self.cfg.hidden_dropout_prob)

    def embed_candidates(self, cand_rgb, cand_depth, cand_dir, *,
                         deterministic=True):
        x = jnp.concatenate(
            [cand_rgb, cand_depth, cand_dir], axis=-1
        ).astype(jnp.float32)
        x = self.visn_ln(self.visn_fc(x))
        return self.visn_dropout(x, deterministic=deterministic)

    def __call__(self, mode: str, batch: Dict[str, Any], *,
                 deterministic: bool = True):
        if mode == "language":
            return self.vln_bert(
                "language", batch, deterministic=deterministic
            )
        if mode == "visual":
            img = self.embed_candidates(
                batch["cand_rgb"], batch["cand_depth"], batch["cand_dir"],
                deterministic=deterministic,
            )
            return self.vln_bert(
                "visual",
                {
                    "lang_embeds": batch["lang_embeds"],
                    "txt_masks": batch["txt_masks"],
                    "img_feats": img,
                    "vis_masks": batch["cand_masks"],
                },
                deterministic=deterministic,
            )
        if mode == "init":
            _, seq = self.vln_bert(
                "language", batch, deterministic=deterministic
            )
            return self(
                "visual", {**batch, "lang_embeds": seq},
                deterministic=deterministic,
            )
        raise ValueError(f"unknown mode: {mode}")


class DaggerEpisodeStore(NpzShardStore):
    """Disk-backed episode store (role of the reference's LMDB recollection
    store, dagger_trainer.py:101-111 + recollection_dataset.py): the shared
    NpzShardStore FIFO persistence plus epoch batching."""

    def iter_batches(self, batch_size: int,
                     rng: Optional[np.random.Generator] = None):
        """Stream shuffled fixed-size batches from disk — every batch is full
        (static shapes for the jitted update). When the store holds at least
        batch_size episodes, the trailing remainder is completed from the
        tail of the epoch order (episodes repeat across batches, never within
        one batch); only a store smaller than batch_size wraps cyclically."""
        rng = rng or np.random.default_rng(0)
        order = rng.permutation(len(self))
        n = len(order)
        if n == 0:
            return
        if n < batch_size:
            order = np.resize(order, batch_size)  # tiles cyclically
            n = batch_size
        for i in range(0, n - batch_size + 1, batch_size):
            yield _stack_episodes(
                [self.get(j) for j in order[i : i + batch_size]]
            )
        if n % batch_size:  # remainder: last full window of the order
            yield _stack_episodes([self.get(j) for j in order[-batch_size:]])


def _stack_episodes(eps: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    batch = {
        k: np.stack([e[k] for e in eps])
        for k in ("cand_rgb", "cand_depth", "cand_dir", "cand_masks", "action")
    }
    L = max(len(e["instruction_enc"]) for e in eps)
    L = ((L + 31) // 32) * 32  # bucket like the agents' language variable
    ids = np.zeros((len(eps), L), np.int32)
    masks = np.zeros((len(eps), L), bool)
    for i, e in enumerate(eps):
        enc = e["instruction_enc"][:L]
        ids[i, : len(enc)] = enc
        masks[i, : len(enc)] = True
    batch["txt_ids"] = ids
    batch["txt_masks"] = masks
    return batch


class PrevalentDaggerAgent:
    """Collect-and-train driver for the PREVALENT policy in the CE env."""

    def __init__(self, cfg: FinetuneConfig, env, seed: int = 0,
                 max_candidates: int = 5, grad_norm: float = 40.0):
        # grad_norm 40: ref dagger_trainer.py:458 clips the VLNBERT branch at
        # 40 (the glocal trainers clip at 5)
        self.cfg = cfg
        self.env = env
        self.max_candidates = max_candidates
        self.K = max_candidates + 1  # + stop slot
        self.depth_dim = env.depth_feat_shape[0]  # channels after spatial pool
        self.np_rng = np.random.default_rng(seed)
        from ..utils.rng import train_key

        self.rng = train_key(seed)
        self.model = PrevalentPolicy(cfg.model)
        self.wp_model = WaypointPredictor(cfg.model)
        self.wp_params = None
        self.params = None
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_norm),
            optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay,
                        mu_dtype=jnp.bfloat16),
        )
        self.opt_state = None
        self._jitted: Dict[str, Any] = {}

    # ------------------------------------------------------------------ init
    def init_params(self, prevalent_state_dict=None, wp_params=None):
        m = self.cfg.model
        B = self.env.batch_size
        dummy = {
            "txt_ids": np.zeros((B, 8), np.int32),
            "txt_masks": np.ones((B, 8), bool),
            "cand_rgb": np.zeros((B, self.K, m.image_feat_size), np.float32),
            "cand_depth": np.zeros((B, self.K, self.depth_dim), np.float32),
            "cand_dir": np.zeros((B, self.K, m.angle_feat_size), np.float32),
            "cand_masks": np.ones((B, self.K), bool),
        }
        self.params = jax.jit(
            lambda r: self.model.init(r, "init", dummy)
        )(jax.random.key(0))["params"]
        if prevalent_state_dict is not None:
            from ..models.legacy import prevalent_to_tree

            self.params = dict(self.params)
            self.params["vln_bert"] = prevalent_to_tree(prevalent_state_dict)
        if wp_params is None:
            wdummy = np.zeros(
                (B * self.env.num_views, *self.env.depth_feat_shape),
                np.float32,
            )
            wp_params = jax.jit(
                lambda r: self.wp_model.init(r, wdummy)
            )(jax.random.key(7))["params"]
        self.wp_params = wp_params  # frozen
        self.opt_state = self.tx.init(self.params)
        return self.params

    # ------------------------------------------------------------ jitted fns
    def _fn(self, name):
        if name in self._jitted:
            return self._jitted[name]
        model = self.model
        if name == "language":
            f = jax.jit(lambda p, b: model.apply({"params": p}, "language", b))
        elif name == "visual":
            f = jax.jit(lambda p, b: model.apply({"params": p}, "visual", b))
        elif name == "waypoint":
            f = jax.jit(
                lambda p, d: self.wp_model.apply({"params": p}, d)
            )
        elif name == "update":
            f = jax.jit(self._update)
        else:
            raise KeyError(name)
        self._jitted[name] = f
        return f

    # ------------------------------------------------------------ collection
    def _candidate_features(self, obs, cand_angles, cand_dists):
        """Static-slot candidate tensors; slot ``k`` (after the last live
        candidate) is the stop action with zero features, mirroring the
        reference's stop-as-last-candidate convention
        (dagger_trainer.py:222-228)."""
        m = self.cfg.model
        B = len(obs)
        n_cam = self.env.num_views
        rgb = np.zeros((B, self.K, m.image_feat_size), np.float32)
        dep = np.zeros((B, self.K, self.depth_dim), np.float32)
        dirs = np.zeros((B, self.K, m.angle_feat_size), np.float32)
        masks = np.zeros((B, self.K), bool)
        stop_idx = np.zeros(B, np.int32)
        for i, ob in enumerate(obs):
            k = 0
            depth_pooled = ob["depth_features"].reshape(
                n_cam, self.depth_dim, -1
            ).mean(-1)
            for ang, dis in zip(cand_angles[i], cand_dists[i]):
                if k >= self.max_candidates:
                    break
                cam = int(round(ang / (2 * math.pi / n_cam))) % n_cam
                rgb[i, k] = ob["view_fts"][cam][: m.image_feat_size]
                dep[i, k] = depth_pooled[cam]
                dirs[i, k] = angle_features([ang], [0.0], m.angle_feat_size)[0]
                k += 1
            masks[i, : k + 1] = True  # candidates + the stop slot
            stop_idx[i] = k
        return rgb, dep, dirs, masks, stop_idx

    def _teacher(self, obs, cand_angles, cand_dists, stop_idx):
        """Oracle action (ref dagger_trainer._teacher_action:214-228): stop
        when within STOP_RADIUS of the goal, else the candidate whose
        estimated position minimises geodesic distance to goal. All of a
        slot's candidate distances ride ONE batched dists_to_goal query —
        under the subprocess pool each oracle call is a pipe round-trip, and
        in habitat each is a geodesic solve."""
        B = len(obs)
        a = np.zeros(B, np.int64)
        for i, ob in enumerate(obs):
            if self.env.dist_to_goal(i) < STOP_RADIUS or not len(cand_angles[i]):
                a[i] = stop_idx[i]
                continue
            pos = estimate_cand_pos(
                ob["position"], ob["orientation"],
                cand_angles[i][: self.max_candidates],
                cand_dists[i][: self.max_candidates],
            )
            a[i] = int(np.argmin(self.env.dists_to_goal(i, pos)))
        return a

    def collect(self, store: DaggerEpisodeStore, n_rollouts: int,
                beta: float = 1.0) -> int:
        """Teacher-policy-mixed rollouts; per step the executed action is the
        oracle w.p. ``beta`` else the policy argmax
        (dagger_trainer.py:304-307); the STORED action label is always the
        oracle (``observations['action']``, :327)."""
        m = self.cfg.model
        T = self.cfg.max_action_len
        total = 0
        for _ in range(n_rollouts):
            obs = self.env.reset()
            B = len(obs)
            raw = max(len(ob["instr_encoding"]) for ob in obs)
            L = ((raw + 31) // 32) * 32
            ids = np.zeros((B, L), np.int32)
            masks = np.zeros((B, L), bool)
            for i, ob in enumerate(obs):
                enc = np.asarray(ob["instr_encoding"])[:L]
                ids[i, : len(enc)] = enc
                masks[i, : len(enc)] = True
            lang = {"txt_ids": ids, "txt_masks": masks}
            h_t, lang_feats = self._fn("language")(self.params, lang)
            h_t, lang_feats = np.asarray(h_t), np.asarray(lang_feats)

            eps = [
                {
                    "instruction_enc": ids[i][masks[i]],
                    "cand_rgb": np.zeros((T, self.K, m.image_feat_size), np.float16),
                    "cand_depth": np.zeros((T, self.K, self.depth_dim), np.float16),
                    "cand_dir": np.zeros((T, self.K, m.angle_feat_size), np.float16),
                    "cand_masks": np.zeros((T, self.K), bool),
                    "action": np.full((T,), IGNORE_ID, np.int32),
                }
                for i in range(B)
            ]
            ended = np.zeros(B, bool)
            for t in range(T):
                depth_feats = np.concatenate(
                    [ob["depth_features"] for ob in obs], 0
                ).reshape(B * self.env.num_views, *self.env.depth_feat_shape)
                heat = np.asarray(
                    self._fn("waypoint")(self.wp_params, depth_feats)
                )
                cand_angles, cand_dists, _ = extract_waypoints(
                    heat, max_candidates=self.max_candidates,
                    in_train=False, rng=self.np_rng,
                )
                rgb, dep, dirs, cmask, stop_idx = self._candidate_features(
                    obs, cand_angles, cand_dists
                )
                # recurrent step: h_t substituted into lang slot 0
                # (base_il_trainer.py:455-456)
                lf = lang_feats.copy()
                lf[:, 0] = h_t
                h_new, scores = self._fn("visual")(
                    self.params,
                    {
                        "lang_embeds": lf, "txt_masks": lang["txt_masks"],
                        "cand_rgb": rgb, "cand_depth": dep, "cand_dir": dirs,
                        "cand_masks": cmask,
                    },
                )
                h_t = np.asarray(h_new)
                scores = np.where(cmask, np.asarray(scores), -np.inf)
                oracle = self._teacher(obs, cand_angles, cand_dists, stop_idx)
                act = scores.argmax(-1)
                mix = self.np_rng.uniform(size=B) <= beta
                act = np.where(mix, oracle, act)
                for i in range(B):
                    if ended[i]:
                        continue
                    eps[i]["cand_rgb"][t] = rgb[i]
                    eps[i]["cand_depth"][t] = dep[i]
                    eps[i]["cand_dir"][t] = dirs[i]
                    eps[i]["cand_masks"][t] = cmask[i]
                    eps[i]["action"][t] = oracle[i]
                    if act[i] == stop_idx[i] or t == T - 1:
                        self.env.stop(i)
                        ended[i] = True
                    else:
                        pos = estimate_cand_pos(
                            obs[i]["position"], obs[i]["orientation"],
                            [cand_angles[i][act[i]]], [cand_dists[i][act[i]]],
                        )[0]
                        # cand angles are ego-relative clockwise
                        # (estimate_cand_pos); teleport takes the ABSOLUTE
                        # world heading, so face the travelled direction
                        new_heading = (
                            heading_from_quaternion(obs[i]["orientation"])
                            + float(cand_angles[i][act[i]])
                        ) % (2 * math.pi)
                        self.env.teleport(i, pos, new_heading)
                if ended.all():
                    break
                obs = self.env.observations()
            for e in eps:
                store.append(e)
            total += B
        return total

    # --------------------------------------------------------------- training
    def _update(self, params, opt_state, batch, rng):
        """One BPTT update over a stacked episode batch — the role of the
        reference's _update_agent (dagger_trainer.py:420-462) as a single
        compiled program: language encode, lax.scan of recurrent visual
        steps, summed CE over valid actions / total_actions, clip + AdamW."""
        T = batch["action"].shape[1]

        def loss_fn(p):
            h_t, lang_feats = self.model.apply(
                {"params": p}, "language",
                {"txt_ids": batch["txt_ids"], "txt_masks": batch["txt_masks"]},
                deterministic=False, rngs={"dropout": rng},
            )

            def body(carry, xs):
                h_t, lang_feats = carry
                rgb, dep, dirs, cmask, action, key = xs
                lf = lang_feats.at[:, 0].set(h_t)
                h_new, scores = self.model.apply(
                    {"params": p}, "visual",
                    {
                        "lang_embeds": lf, "txt_masks": batch["txt_masks"],
                        "cand_rgb": rgb, "cand_depth": dep, "cand_dir": dirs,
                        "cand_masks": cmask,
                    },
                    deterministic=False, rngs={"dropout": key},
                )
                scores = jnp.where(cmask, scores, -1e9)
                valid = action != IGNORE_ID
                tgt = jnp.where(valid, action, 0)
                logp = jax.nn.log_softmax(scores, axis=-1)
                ce = -jnp.take_along_axis(logp, tgt[:, None], 1)[:, 0]
                return (h_new, lang_feats), (
                    jnp.sum(ce * valid), jnp.sum(valid)
                )

            keys = jax.random.split(rng, T)
            xs = (
                jnp.moveaxis(batch["cand_rgb"].astype(jnp.float32), 0, 1),
                jnp.moveaxis(batch["cand_depth"].astype(jnp.float32), 0, 1),
                jnp.moveaxis(batch["cand_dir"].astype(jnp.float32), 0, 1),
                jnp.moveaxis(batch["cand_masks"], 0, 1),
                jnp.moveaxis(batch["action"], 0, 1),
                keys,
            )
            _, (losses, counts) = jax.lax.scan(
                body, (h_t, lang_feats), xs
            )
            return jnp.sum(losses) / jnp.maximum(jnp.sum(counts), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def train_epochs(self, store: DaggerEpisodeStore, epochs: int,
                     batch_size: Optional[int] = None) -> List[float]:
        batch_size = batch_size or self.env.batch_size
        losses = []
        for _ in range(epochs):
            for batch in store.iter_batches(batch_size, self.np_rng):
                self.rng, sub = jax.random.split(self.rng)
                self.params, self.opt_state, loss = self._fn("update")(
                    self.params, self.opt_state, batch, sub
                )
                losses.append(float(loss))
        return losses

    # ------------------------------------------------------------ checkpoint
    def save_ckpt(self, path: str):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                os.path.abspath(path),
                {"params": self.params, "opt_state": self.opt_state},
                force=True,
            )

    def restore_ckpt(self, path: str, with_opt: bool = True):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            target = {"params": self.params, "opt_state": self.opt_state}
            restored = ckptr.restore(os.path.abspath(path), target)
        self.params = restored["params"]
        if with_opt:
            self.opt_state = restored["opt_state"]


def run_dagger(agent, store_dir: str, *, policy: str,
               dagger_iters: int = 3, update_size: int = 32, p: float = 0.75,
               epochs: int = 2, capacity: Optional[int] = None,
               log_fn=None) -> Dict[str, Any]:
    """The reference dagger loop (dagger_trainer.train:536-560 + IL.DAGGER
    defaults): per iteration collect ``update_size`` episodes at
    beta = p**iter (0.0**0.0 treated as 0, :478-480), then train ``epochs``
    over everything collected so far.

    ``agent`` is a PrevalentDaggerAgent (policy='prevalent') or a glocal
    CEAgent (policy in {'bev','etp'} — collected through the
    TeacherRecollectionStore bundle path, which shares learn_from_bundle).
    """
    history: Dict[str, Any] = {"collected": [], "losses": []}
    if policy == "prevalent":
        store = DaggerEpisodeStore(store_dir, capacity=capacity)
        for it in range(dagger_iters):
            beta = 0.0 if p == 0.0 else p ** it
            batch = agent.env.batch_size
            n_roll = max(1, (update_size + batch - 1) // batch)
            n = agent.collect(store, n_roll, beta=beta)
            losses = agent.train_epochs(store, epochs)
            history["collected"].append(n)
            history["losses"].append(
                float(np.mean(losses)) if losses else float("nan")
            )
            if log_fn:
                log_fn(it, {"dagger/beta": beta, "dagger/collected": n,
                            "dagger/loss": history["losses"][-1],
                            "dagger/store_size": len(store)})
    else:
        from ..nav.recollection import TeacherRecollectionStore

        store = TeacherRecollectionStore(
            agent, capacity=capacity or 1024, spill_dir=store_dir
        )
        for it in range(dagger_iters):
            beta = 0.0 if p == 0.0 else p ** it
            batch = agent.env.batch_size
            n_roll = max(1, (update_size + batch - 1) // batch)
            n = store.collect(n_roll, beta=beta) * batch
            losses = store.train_epochs(epochs, rng=agent.np_rng)
            history["collected"].append(n)
            history["losses"].append(
                float(np.mean(losses)) if losses else float("nan")
            )
            if log_fn:
                log_fn(it, {"dagger/beta": beta, "dagger/collected": n,
                            "dagger/loss": history["losses"][-1],
                            "dagger/store_size": len(store)})
    return history
