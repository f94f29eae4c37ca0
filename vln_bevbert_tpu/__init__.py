"""vln_bevbert_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of BEVBert (MarSaKi/VLN-BEVBert, ICCV 2023).

One shared library replaces the reference's four near-identical package copies
(pretrain_src / map_nav_src / bevbert_ce / bevbert_ce.pretrain):

- ``configs``     : single typed config tree (model / shapes / pretrain / finetune)
- ``geometry``    : host-side numpy geometry (angles, SE(3), polar BEV encodings)
- ``ops``         : device ops — masking, attention, the BEV lift-splat kernel
- ``models``      : flax.linen model library (BERT stack, glocal cross-modal model)
- ``data``        : nav-graph loader, path datasets, proxy-task batching (static shapes)
- ``parallel``    : mesh / sharding / pjit train-step factories
- ``pretrain``    : proxy-task pretraining driver
- ``nav``         : discrete-environment fine-tuning (graph maps, envs, DAgger agent)
"""

__version__ = "0.1.0"
