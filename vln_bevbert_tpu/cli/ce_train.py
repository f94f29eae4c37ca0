"""Continuous-environment (R2R-CE) training CLI — role of
/root/reference/bevbert_ce/run.py + run_r2r/main.bash: scheduled-sampling
SS-BEV training with ratio decay, periodic evaluation, checkpointing.

Runs on the synthetic ContinuousEnv by default; a habitat binding plugs in by
constructing any object with the SyntheticContinuousEnv surface and passing
it to CEAgent.
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument("--output_dir", default="runs/ce")
    p.add_argument("--iters", type=int, default=10000)
    p.add_argument("--log_every", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--sample_ratio", type=float, default=0.75)
    p.add_argument("--decay_interval", type=int, default=2000)
    p.add_argument("--n_episodes", type=int, default=64)
    p.add_argument("--pretrain_ckpt", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--test", action="store_true")
    p.add_argument("--trainer", default="ss-bev",
                   choices=["ss-bev", "ss-etp", "dagger"],
                   help="ss-etp = topo-only ETP architecture; dagger = "
                        "recollection-store DAgger training (ref run.py "
                        "TRAINER_NAME registry: SS-BEV / SS-ETP / dagger)")
    p.add_argument("--policy", default="bev",
                   choices=["bev", "etp", "prevalent"],
                   help="dagger: policy to train — glocal BEV / topo-only "
                        "ETP via the replay-bundle store, or the legacy "
                        "Recurrent VLN-BERT (PREVALENT) via the transition "
                        "store (ref MODEL.policy_name VLNBERT branch)")
    p.add_argument("--dagger_iters", type=int, default=3,
                   help="dagger iterations (ref IL.DAGGER.iterations)")
    p.add_argument("--update_size", type=int, default=32,
                   help="episodes collected per dagger iteration "
                        "(ref IL.DAGGER.update_size)")
    p.add_argument("--dagger_p", type=float, default=0.75,
                   help="teacher-mix decay base: beta = p**iter "
                        "(ref IL.DAGGER.p)")
    p.add_argument("--dagger_epochs", type=int, default=2,
                   help="training epochs over the store per iteration "
                        "(ref IL.epochs)")
    p.add_argument("--store_dir", default=None,
                   help="disk directory for the recollection store (ref "
                        "IL.DAGGER.lmdb_features_dir; default "
                        "<output_dir>/store)")
    p.add_argument("--store_capacity", type=int, default=None,
                   help="max episodes kept (FIFO eviction); None = unbounded")
    p.add_argument("--num_env_workers", type=int, default=0,
                   help=">0: subprocess env pool with this many workers "
                        "(ref env_utils.py NUM_ENVIRONMENTS=8/rank)")
    p.add_argument("--run_type", default="train",
                   choices=["train", "eval", "inference"],
                   help="ref run.py --run-type: train loop, checkpoint(-dir) "
                        "evaluation, or leaderboard inference")
    p.add_argument("--ckpt_path_dir", default=None,
                   help="eval: directory of checkpoints to evaluate in step "
                        "order (ref EVAL.CKPT_PATH_DIR / base_il_trainer eval "
                        "loop); inference: single checkpoint to load")
    p.add_argument("--predictions_file", default="preds.json",
                   help="inference output (ref INFERENCE.PREDICTIONS_FILE)")
    p.add_argument("--task_type", default="r2r", choices=["r2r", "rxr"],
                   help="inference format: R2R-CE json / RxR jsonl")
    p.add_argument("--back_algo", default=None,
                   choices=["control", "teleport"],
                   help="eval-mode backtrack execution (ref IL.back_algo)")
    p.add_argument("--eval_batches", type=int, default=4)
    p.add_argument("--loc_noise", type=float, default=0.5,
                   help="candidate merge radius in metres (ref IL.loc_noise)")
    p.add_argument("--ghost_aug", type=float, default=0.0,
                   help="train-time ghost position noise (ref IL.ghost_aug)")
    p.add_argument("--ml_weight", type=float, default=None,
                   help="imitation loss weight (ref IL.ml_weight)")
    p.add_argument("--no_waypoint_aug", action="store_true",
                   help="disable train-time waypoint sampling augmentation "
                        "(ref IL.waypoint_aug)")
    p.add_argument("--data_path", default=None,
                   help="VLN-CE episode file ({split}.json.gz; RxR: template "
                        "with {role}) — loads real episodes instead of the "
                        "synthetic set (ref TASK_CONFIG.DATASET.DATA_PATH)")
    p.add_argument("--gt_path", default=None,
                   help="{split}_gt.json.gz dense gt locations for nDTW "
                        "(ref TASK.NDTW.GT_PATH)")
    # ----- real frozen stack (ref ss_trainer_BEV.py:236-243, 262-275) -----
    p.add_argument("--waypoint_ckpt", default=None,
                   help="frozen waypoint-predictor checkpoint: torch file "
                        "(the published data/wp_pred/check_cwp_bestdist_* "
                        "format, ['predictor']['state_dict']), .npz, or "
                        "orbax dir of a remapped tree")
    p.add_argument("--ddppo_ckpt", default=None,
                   help="frozen DDPPO point-nav depth ResNet50 checkpoint "
                        "(torch gibson-2plus-resnet50.pth layout / remapped "
                        "tree); requires --habitat_config (the synthetic env "
                        "synthesises depth features directly)")
    p.add_argument("--clip_ckpt", default=None,
                   help="frozen CLIP-B/16 vision tower: HF model dir/name, "
                        "torch state dict, or remapped tree; requires "
                        "--habitat_config")
    p.add_argument("--habitat_config", default=None,
                   help="habitat config YAML — constructs the real "
                        "HabitatContinuousEnv instead of the synthetic world "
                        "(ref run.py --exp-config; requires habitat-sim/lab)")
    p.add_argument("--habitat_split", default="train",
                   help="dataset split for --habitat_config episode loading")
    p.add_argument("--allow_random_frozen", action="store_true",
                   help="explicitly allow a RANDOM-initialised frozen "
                        "waypoint predictor (synthetic tests/smoke only — a "
                        "real run without --waypoint_ckpt is meaningless)")
    return p.parse_args(argv)


def build_frozen(args):
    """Resolve the --waypoint_ckpt/--ddppo_ckpt/--clip_ckpt flags into
    (wp_params, clip_encoder, depth_encoder). Guards the random-frozen
    trap: without --waypoint_ckpt the waypoint predictor would be random
    init (useless for any real run), so that path needs an explicit
    --allow_random_frozen (ref loads the published ckpt unconditionally,
    ss_trainer_BEV.py:236-243)."""
    wp_params = None
    if args.waypoint_ckpt:
        from ..ce.frozen import load_waypoint_params

        wp_params = load_waypoint_params(args.waypoint_ckpt)
    elif not args.allow_random_frozen:
        raise SystemExit(
            "no --waypoint_ckpt: the frozen waypoint predictor would be "
            "RANDOM-initialised. Pass the published checkpoint "
            "(data/wp_pred/check_cwp_bestdist_hfov90) or opt in explicitly "
            "with --allow_random_frozen (synthetic smoke runs only)."
        )
    clip_encoder = depth_encoder = None
    if args.clip_ckpt or args.ddppo_ckpt:
        if not args.habitat_config:
            raise SystemExit(
                "--clip_ckpt/--ddppo_ckpt configure the habitat sensor "
                "stack and require --habitat_config (the synthetic env "
                "synthesises features directly)"
            )
        if args.clip_ckpt:
            from ..ce.frozen import load_clip_params
            from ..precompute.pipeline import JaxClipEncoder

            clip_encoder = JaxClipEncoder(load_clip_params(args.clip_ckpt))
        if args.ddppo_ckpt:
            from ..ce.frozen import JaxDepthEncoder, load_depth_params

            depth_encoder = JaxDepthEncoder(load_depth_params(args.ddppo_ckpt))
    return wp_params, clip_encoder, depth_encoder


def main(argv=None):
    import numpy as np

    from ..ce.agent import CEAgent
    from ..ce.env import SyntheticContinuousEnv, make_synthetic_ce_episodes
    from ..configs import FinetuneConfig, load_config
    from ..utils.logging import MetricLogger

    args = parse_args(argv)
    overrides = {"seed": args.seed, "output_dir": args.output_dir}
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    cfg = load_config(FinetuneConfig, args.config, **overrides)
    # CE defaults: 11x11 BEV at 1m (ref ss_trainer_BEV.py:204-218)
    if cfg.model.bev_dim == 21:
        cfg.model.bev_dim = 11
        cfg.model.bev_res = 1.0
    if args.trainer == "ss-etp" or (
        args.trainer == "dagger" and args.policy == "etp"
    ):
        # topo-only: no local BEV branch at all (ref ss_trainer_ETP.py +
        # models/etp/vilmodel_cmt.py:721-751)
        cfg.model.use_bev = False
        cfg.fusion = "global"
    if args.back_algo:
        cfg.ce_back_algo = args.back_algo

    # cfg.batch_size is per chip; scale to the global batch for the dp mesh
    # (ref CE trains DDP with 8 envs/rank, ss_trainer_BEV.py:247-251)
    import jax

    from ..parallel.mesh import make_mesh

    n_dev = jax.device_count()
    mesh = make_mesh() if n_dev > 1 else None
    cfg.batch_size = cfg.batch_size * n_dev

    wp_params, clip_encoder, depth_encoder = build_frozen(args)

    rng = np.random.default_rng(cfg.seed)
    if args.habitat_config:
        if args.num_env_workers > 0:
            raise SystemExit(
                "--habitat_config with --num_env_workers is not supported "
                "yet: habitat env factories are not spawn-picklable here"
            )
        from ..ce.habitat_binding import make_habitat_env

        env = make_habitat_env(
            args.habitat_config, batch_size=cfg.batch_size,
            data_path=args.data_path, split=args.habitat_split,
            clip_encoder=clip_encoder, depth_encoder=depth_encoder,
            grid_hw=cfg.shapes.grid_hw,
        )
        episodes = None
    elif args.data_path:
        from ..ce.dataset import (apply_gt_paths, load_gt_paths,
                                  load_rxr_episodes, load_vlnce_episodes)

        if args.task_type == "rxr":
            episodes = load_rxr_episodes(args.data_path)
        else:
            episodes = load_vlnce_episodes(args.data_path)
        if args.gt_path:
            apply_gt_paths(episodes, load_gt_paths(args.gt_path))
    else:
        episodes = make_synthetic_ce_episodes(rng, n=args.n_episodes)
    if episodes is not None:  # synthetic world (habitat env built above)
        env_kwargs = dict(
            grid_hw=cfg.shapes.grid_hw,
            grid_feat_size=cfg.model.bev_grid_feat_size,
            view_feat_size=cfg.model.image_feat_size,
        )
        if args.num_env_workers > 0:
            from ..ce.env_pool import make_synthetic_pool

            assert cfg.batch_size % args.num_env_workers == 0
            env = make_synthetic_pool(
                episodes, num_workers=args.num_env_workers,
                slots_per_worker=cfg.batch_size // args.num_env_workers,
                seed=cfg.seed, **env_kwargs,
            )
        else:
            env = SyntheticContinuousEnv(
                episodes, batch_size=cfg.batch_size, seed=cfg.seed,
                **env_kwargs,
            )
    if args.ml_weight is not None:
        cfg.ml_weight = args.ml_weight

    pretrained = None
    if args.pretrain_ckpt:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            pretrained = ckptr.restore(
                os.path.abspath(args.pretrain_ckpt)
            )["params"]

    if args.trainer == "dagger":
        from ..ce.dagger import PrevalentDaggerAgent, run_dagger

        os.makedirs(cfg.output_dir, exist_ok=True)
        logger = MetricLogger(cfg.output_dir)
        store_dir = args.store_dir or os.path.join(cfg.output_dir, "store")
        if args.policy == "prevalent":
            # PREVALENT loads torch-layout state dicts (vlnbert_init.py),
            # not the pretrain orbax tree — --pretrain_ckpt doesn't apply
            if args.pretrain_ckpt:
                raise SystemExit(
                    "--pretrain_ckpt is the glocal pretrain tree; the "
                    "prevalent policy loads torch weights via "
                    "models.legacy.prevalent_to_tree instead"
                )
            agent = PrevalentDaggerAgent(cfg, env, seed=cfg.seed)
            agent.init_params(wp_params=wp_params)
        else:
            agent = CEAgent(
                cfg, env, seed=cfg.seed, sample_ratio=args.sample_ratio,
                loc_noise=args.loc_noise, ghost_aug=args.ghost_aug,
                waypoint_aug=not args.no_waypoint_aug, mesh=mesh,
            )
            agent.init_params(pretrained_params=pretrained,
                              wp_params=wp_params)
        run_dagger(
            agent, store_dir, policy=args.policy,
            dagger_iters=args.dagger_iters, update_size=args.update_size,
            p=args.dagger_p, epochs=args.dagger_epochs,
            capacity=args.store_capacity, log_fn=logger.log,
        )
        agent.save_ckpt(os.path.join(cfg.output_dir, "ckpt_dagger"))
        return

    agent = CEAgent(cfg, env, seed=cfg.seed, sample_ratio=args.sample_ratio,
                    loc_noise=args.loc_noise, ghost_aug=args.ghost_aug,
                    waypoint_aug=not args.no_waypoint_aug, mesh=mesh)
    agent.init_params(pretrained_params=pretrained, wp_params=wp_params)

    os.makedirs(cfg.output_dir, exist_ok=True)
    logger = MetricLogger(cfg.output_dir)

    if args.run_type == "eval" or args.test:
        from ..ce.inference import evaluate_checkpoint_dir

        if args.ckpt_path_dir and os.path.isdir(args.ckpt_path_dir):
            results = evaluate_checkpoint_dir(
                agent, args.ckpt_path_dir, cfg.output_dir,
                num_batches=args.eval_batches,
            )
            for i, (name, metrics) in enumerate(sorted(results.items())):
                logger.log(i, {f"eval/{name}/{k}": v
                               for k, v in metrics.items()})
        else:
            metrics = agent.evaluate(num_batches=args.eval_batches)
            logger.log(0, {f"eval/{k}": v for k, v in metrics.items()})
        return
    if args.run_type == "inference":
        from ..ce.inference import run_inference

        if args.ckpt_path_dir:
            agent.restore_ckpt(args.ckpt_path_dir, with_opt=False)
        out = os.path.join(cfg.output_dir, args.predictions_file)
        run_inference(agent, out, task_type=args.task_type)
        print(f"wrote {out}", flush=True)
        return

    ratio = args.sample_ratio
    done = 0
    while done < args.iters:
        n = min(args.log_every, args.iters - done)
        losses = []
        for _ in range(n):
            _, loss = agent.rollout(
                feedback="sample", train=True, sample_ratio=ratio
            )
            if loss is not None:
                losses.append(loss)
        done += n
        # scheduled-sampling ratio decay (ref ss_trainer_BEV.py:659-674)
        if args.decay_interval and done % args.decay_interval == 0:
            ratio /= 2.0
        metrics = agent.evaluate(num_batches=2)
        logger.log(
            done,
            {
                "train/loss": float(np.mean(losses)) if losses else float("nan"),
                "train/sample_ratio": ratio,
                **{f"eval/{k}": v for k, v in metrics.items()},
            },
        )
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                os.path.abspath(os.path.join(cfg.output_dir, f"ckpt_{done}")),
                {"params": agent.params, "opt_state": agent.opt_state},
                force=True,
            )


if __name__ == "__main__":
    main()
