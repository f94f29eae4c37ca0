"""Discrete-environment fine-tuning CLI — role of
/root/reference/map_nav_src/r2r/main_nav.py + scripts/ft_*.bash: DAgger
training with periodic full evaluation, best-checkpoint selection on sr+spl
(main_nav.py:216-231), and submission-format prediction dumps.
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument("--data_root", default=None)
    p.add_argument("--dataset", default="r2r",
                   choices=["r2r", "r4r", "rxr", "reverie", "soon"])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--output_dir", default="runs/finetune")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--log_every", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--act_visited_nodes", action="store_true",
                   help="only the current node counts visited "
                        "(ref parser.py --act_visited_nodes)")
    p.add_argument("--eval_first", action="store_true",
                   help="evaluate before training (ref parser.py --eval_first)")
    p.add_argument("--expert_policy", default=None, choices=["spl", "ndtw"],
                   help="teacher policy (ref ft_r2r.bash:30 spl, ft_rxr.bash:30 ndtw)")
    p.add_argument("--feedback", default="dagger",
                   choices=["dagger", "teacher", "sample", "expl_sample"])
    p.add_argument("--pretrain_ckpt", default=None,
                   help="orbax checkpoint from bevbert-pretrain")
    p.add_argument("--test", action="store_true", help="evaluate only")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synth_dir", default="/tmp/bevbert_synth_nav")
    p.add_argument("--aug_path", default=None,
                   help="augmented-instruction annotations (jsonl; synthetic "
                        "mode synthesises a set when 'synth' is passed) — "
                        "training alternates gt/aug envs 1:1 per iteration "
                        "(ref main_nav.py:160-174 prevalent_aug schedule)")
    p.add_argument("--val_splits", default=None,
                   help="comma-separated eval splits; defaults to the "
                        "reference's val_train_seen,val_seen,val_unseen for "
                        "real data (main_nav.py:71-75) and val_unseen for "
                        "synthetic runs. Missing split files are skipped with "
                        "a warning. Best-ckpt selection stays on val_unseen.")
    p.add_argument("--submit", action="store_true",
                   help="also build the leaderboard test split(s) as eval "
                        "envs and dump predictions for them "
                        "(ref main_nav.py:77-81)")
    p.add_argument("--tokenizer", default="bert", choices=["bert", "xlm"],
                   help="annotation tokenizer variant (selects REVERIE "
                        "_enc vs _enc_xlmr files, ref reverie/data_utils.py:57-63)")
    return p.parse_args(argv)


def build_envs(cfg, args):
    import numpy as np

    from ..data.feature_db import H5FeatureDB, write_synthetic_features
    from ..data.loader import make_synthetic_annotations
    from ..data.nav_graph import (
        build_scanvp_cands,
        load_nav_graphs,
        write_synthetic_connectivity,
    )
    from ..nav.env import R2RNavBatch

    if args.synthetic or not args.data_root:
        tmpdir = args.synth_dir
        rng = np.random.default_rng(args.seed)
        conn = os.path.join(tmpdir, "conn")
        fts = os.path.join(tmpdir, "fts")
        if not os.path.exists(os.path.join(conn, "scans.txt")):
            write_synthetic_connectivity(conn, rng, n_scans=3, n_nodes=16)
        graphs = load_nav_graphs(conn)
        cands = build_scanvp_cands(graphs)
        if not os.path.exists(os.path.join(fts, "view_fts.hdf5")):
            write_synthetic_features(
                fts, rng, {s: g.node_ids for s, g in graphs.items()},
                image_feat_size=cfg.model.image_feat_size,
                grid_feat_size=cfg.model.bev_grid_feat_size,
                grid_hw=cfg.shapes.grid_hw, num_views=cfg.shapes.num_views,
            )
        train_annos = make_synthetic_annotations(graphs, rng, n_items=64)
        val_splits = (
            args.val_splits.split(",") if args.val_splits else ["val_unseen"]
        )
        val_annos = {
            s: make_synthetic_annotations(graphs, rng, n_items=16)
            for s in val_splits
        }
        aug_annos = (
            make_synthetic_annotations(graphs, np.random.default_rng(args.seed + 41),
                                       n_items=64)
            if args.aug_path else None
        )
        dbs = dict(
            view_db=H5FeatureDB(os.path.join(fts, "view_fts.hdf5")),
            # grid features stay float16 end-to-end: the agent uploads them
            # raw and the device-resident store converts to bf16 (halves
            # host->device traffic per step)
            grid_db=H5FeatureDB(os.path.join(fts, "grid_fts.hdf5"),
                                dtype=np.float16),
            depth_db=H5FeatureDB(os.path.join(fts, "depth.hdf5")),
        )
    else:
        graphs = load_nav_graphs(os.path.join(args.data_root, "connectivity"))
        cands_file = os.path.join(
            args.data_root, "scanvp_candview_relangles.json"
        )
        if os.path.exists(cands_file):
            with open(cands_file) as f:
                cands = json.load(f)
        else:
            cands = build_scanvp_cands(graphs)

        # accepts both the native jsonl and the published reference formats
        # (R2R_%s_enc.json JSON lists, rxr guide jsonl, REVERIE/SOON shapes)
        # — resolution + schema sniff in data/annotations.py
        from ..data.annotations import construct_instrs

        def load_annos(split):
            return construct_instrs(
                args.data_root, args.dataset, [split],
                tokenizer=args.tokenizer, is_test=args.test,
                rng=np.random.default_rng(args.seed),
            )

        train_annos = load_annos("train")
        val_splits = (
            args.val_splits.split(",") if args.val_splits
            else ["val_train_seen", "val_seen", "val_unseen"]
        )
        if args.submit:
            # leaderboard splits (ref main_nav.py:77-81)
            val_splits += (
                ["test_challenge_public", "test_standard_public"]
                if args.dataset == "rxr" else ["test"]
            )
        val_annos = {}
        for s in val_splits:
            try:
                annos = load_annos(s)
                if args.dataset == "rxr" and not args.test:
                    # rxr val is large; the reference evaluates every 8th
                    # item during training (main_nav.py:86-89)
                    annos = annos[::8]
                if annos:
                    val_annos[s] = annos
                else:
                    print(f"[finetune] skipping empty eval split {s}")
            except FileNotFoundError as e:
                print(f"[finetune] skipping eval split {s}: {e}")
        if not val_annos:
            raise FileNotFoundError(
                f"none of the eval splits {val_splits} found under "
                f"{args.data_root}"
            )
        aug_annos = None
        if args.aug_path:
            # explicit path — construct_instrs sniffs reference vs native shape
            aug_annos = construct_instrs(
                args.data_root, args.dataset, [args.aug_path],
                tokenizer=args.tokenizer, is_test=args.test,
            )
        dbs = dict(
            view_db=H5FeatureDB(os.path.join(args.data_root, "view_fts.hdf5")),
            grid_db=H5FeatureDB(os.path.join(args.data_root, "grid_fts.hdf5"),
                                dtype=np.float16),
            depth_db=H5FeatureDB(os.path.join(args.data_root, "depth.hdf5")),
        )

    if args.expert_policy:
        cfg.expert_policy = args.expert_policy
    if args.act_visited_nodes:
        cfg.act_visited_nodes = True
    if args.dataset in ("reverie", "soon"):
        t, v = _make_obj_envs(
            cfg, args, graphs, cands, dbs, train_annos, val_annos
        )
        return t, v, None  # object pipelines train on gt episodes only
    mk = lambda annos, name, seed: R2RNavBatch(
        annos, graphs, cands, batch_size=cfg.batch_size,
        image_feat_size=cfg.model.image_feat_size, seed=seed, name=name, **dbs,
    )
    aug_env = mk(aug_annos, "aug", args.seed + 2) if aug_annos else None
    val_envs = {
        name: mk(annos, name, args.seed + 1 + i)
        for i, (name, annos) in enumerate(val_annos.items())
    }
    return mk(train_annos, "train", args.seed), val_envs, aug_env


def _make_obj_envs(cfg, args, graphs, cands, dbs, train_annos, val_annos):
    """REVERIE/SOON object-grounded envs (ref reverie/main_nav_obj.py:25-77,
    soon/main.py). Synthetic mode synthesises a per-viewpoint object DB; real
    mode reads BBoxes.json + an object-feature HDF5."""
    import numpy as np

    from ..nav.obj_env import ObjectDB, ReverieObjectNavBatch, SoonObjectNavBatch

    m = cfg.model
    if args.synthetic or not args.data_root:
        rng = np.random.default_rng(args.seed + 17)
        obj_data, obj2vps = {}, {}
        oid = 0
        for scan, g in graphs.items():
            for vp in g.node_ids:
                ids = [str(oid), str(oid + 1)]
                oid += 2
                obj_data[f"{scan}_{vp}"] = {
                    "fts": rng.normal(
                        size=(2, m.obj_feat_size + m.obj_prob_size)
                    ).astype(np.float32),
                    "directions": rng.uniform(-1, 1, (2, 2)).astype(np.float32),
                    "sizes": rng.uniform(20, 100, (2, 2)).astype(np.float32),
                    "obj_ids": ids,
                }
                for i in ids:
                    obj2vps[f"{scan}_{i}"] = [vp]
        for annos in (train_annos, *val_annos.values()):
            for a in annos:
                scan, goal = a["scan"], a["path"][-1]
                a["objId"] = obj_data[f"{scan}_{goal}"]["obj_ids"][0]
                a["end_vps"] = [goal]
    else:
        with open(os.path.join(args.data_root, "BBoxes.json")) as f:
            raw = json.load(f)
        obj_data = raw["objects"] if "objects" in raw else raw
        with open(os.path.join(args.data_root, "obj2vps.json")) as f:
            obj2vps = json.load(f)
    env_cls = SoonObjectNavBatch if args.dataset == "soon" else ReverieObjectNavBatch
    mk = lambda annos, name, seed: env_cls(
        annos, graphs, cands, batch_size=cfg.batch_size,
        image_feat_size=m.image_feat_size, seed=seed, name=name,
        obj_db=ObjectDB(obj_data), obj2vps=obj2vps,
        max_objects=cfg.shapes.max_objects,
        multi_endpoints=(name == "train"), **dbs,
    )
    val_envs = {
        name: mk(annos, name, args.seed + 1 + i)
        for i, (name, annos) in enumerate(val_annos.items())
    }
    return mk(train_annos, "train", args.seed), val_envs


def main(argv=None):
    args = parse_args(argv)

    from ..configs import FinetuneConfig, load_config
    from ..nav.agent import GMapNavAgent
    from ..utils.logging import MetricLogger

    overrides = {"dataset": args.dataset, "seed": args.seed,
                 "output_dir": args.output_dir}
    if args.iters:
        overrides["iters"] = args.iters
    if args.log_every:
        overrides["log_every"] = args.log_every
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    cfg = load_config(FinetuneConfig, args.config, **overrides)
    if args.dataset == "rxr":
        cfg.model.lang_bert_name = "xlm-roberta-base"
        cfg.model.vocab_size = 250002
        cfg.expert_policy = "ndtw"
        cfg.ml_weight = 0.8
    if args.expert_policy:
        cfg.expert_policy = args.expert_policy
    if args.act_visited_nodes:
        cfg.act_visited_nodes = True
    if args.dataset in ("reverie", "soon"):
        # object tokens + OG head (ref scripts/ft_rvr.bash:8 obj_ft_dim=768,
        # :39 max_objects=20)
        cfg.model.obj_feat_size = cfg.model.obj_feat_size or 768

    # cfg.batch_size is per chip; the envs run the global batch and the
    # replay update shards it over the dp mesh (ref fine-tunes 4-GPU DDP,
    # agent_base.py:121-123)
    import jax

    from ..parallel.mesh import make_mesh

    n_dev = jax.device_count()
    mesh = make_mesh() if n_dev > 1 else None
    cfg.batch_size = cfg.batch_size * n_dev

    train_env, val_envs, aug_env = build_envs(cfg, args)
    agent = GMapNavAgent(cfg, train_env, seed=cfg.seed, mesh=mesh)

    pretrained = None
    if args.pretrain_ckpt:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(args.pretrain_ckpt))
        pretrained = restored["params"]
    agent.init_params(pretrained_params=pretrained)

    os.makedirs(cfg.output_dir, exist_ok=True)
    logger = MetricLogger(cfg.output_dir)

    def evaluate_split(tag, step):
        val_env = val_envs[tag]
        agent.env = val_env
        preds = agent.test()
        if val_env.gt_trajs:
            avg, _ = val_env.eval_metrics(preds)
            logger.log(step, {f"{tag}/{k}": v for k, v in avg.items()})
        else:
            # leaderboard test splits carry no gt paths — submission dump
            # only (ref main_nav.py:270-291 score_only on val splits)
            avg = {}
        with open(os.path.join(cfg.output_dir, f"preds_{tag}_{step}.json"), "w") as f:
            # R2R leaderboard submission format: (viewpoint, heading,
            # elevation) triples (ref agent_base.py:37, main_nav.py:287-291);
            # REVERIE adds the grounded object id (main_nav_obj.py:278-281
            # submit dump; 'predObjId' in the leaderboard schema)
            def entry(p):
                e = {
                    "instr_id": p["instr_id"],
                    "trajectory": [
                        [vp, 0.0, 0.0] for vp in sum(p["trajectory"], [])
                    ],
                }
                if p.get("pred_objid") is not None:
                    e["predObjId"] = p["pred_objid"]
                return e

            json.dump([entry(p) for p in preds], f)
        agent.env = train_env
        return avg

    # evaluate every built split each interval (ref main_nav.py:232-259 loops
    # val_envs); best-ckpt selection stays on val_unseen (main_nav.py:216-231)
    best_split = "val_unseen" if "val_unseen" in val_envs else next(iter(val_envs))

    def evaluate_all(step):
        per_split = {tag: evaluate_split(tag, step) for tag in val_envs}
        return per_split[best_split]

    if args.test:
        evaluate_all(0)
        return

    best = {"score": -1.0}
    if args.eval_first:
        evaluate_all(0)
    log_every = cfg.log_every
    done = 0
    while done < cfg.iters:
        n = min(log_every, cfg.iters - done)
        if aug_env is None:
            losses = agent.train_iters(n, feedback=args.feedback)
        else:
            # alternate gt/aug envs 1:1 per iteration, keyed by the global
            # iteration parity so odd intervals stay exact
            # (ref main_nav.py:160-174 alternates per iteration)
            losses = []
            for i in range(n):
                agent.env = train_env if (done + i) % 2 == 0 else aug_env
                losses += agent.train_iters(1, feedback=args.feedback)
            agent.env = train_env
        done += n
        logger.log(done, {"train/IL_loss": float(sum(losses) / max(len(losses), 1))})
        avg = evaluate_all(done)
        score = avg.get("sr", 0.0) + avg.get("spl", 0.0)
        if score > best["score"]:
            best = {"score": score, "step": done, **avg}
            _save_agent(agent, os.path.join(cfg.output_dir, "ckpt_best"))
    _save_agent(agent, os.path.join(cfg.output_dir, "ckpt_latest"))
    logger.log(done, {f"best/{k}": v for k, v in best.items() if k != "step"})


def _save_agent(agent, path):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(path),
            {"params": agent.params, "opt_state": agent.opt_state},
            force=True,
        )


if __name__ == "__main__":
    main()
