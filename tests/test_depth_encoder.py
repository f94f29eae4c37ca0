"""DDPPO depth-encoder architectural tests (shape contract + determinism).

Remap parity against a torch replica of habitat's ResNetEncoder is in
tests/test_frozen_remap.py.
"""

import jax
import numpy as np
import pytest

from vln_bevbert_tpu.models.depth_encoder import DdppoDepthEncoder


@pytest.mark.slow
def test_depth_encoder_output_shape():
    enc = DdppoDepthEncoder()
    # VLN-CE depth sensor frames are 256x256
    depth = np.random.default_rng(0).uniform(0, 1, (2, 256, 256, 1)).astype(np.float32)
    params = enc.init(jax.random.key(0), depth)
    out = enc.apply(params, depth)
    # the reference's flattened 2048-d (128 x 4 x 4) depth_features layout
    assert out.shape == (2, 4, 4, 128)
    assert np.isfinite(np.asarray(out)).all()
    out2 = enc.apply(params, depth)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


@pytest.mark.slow
def test_depth_encoder_tiny_variant():
    enc = DdppoDepthEncoder(baseplanes=8, layers=(1, 1),
                            after_compression_flat_size=64)
    depth = np.zeros((1, 64, 64, 1), np.float32)
    params = enc.init(jax.random.key(0), depth)
    out = enc.apply(params, depth)
    # 64 -> avg/2 -> stem/2 -> pool/2 -> stage2/2 = 4x4, 64/(4*4) = 4 channels
    assert out.shape == (1, 4, 4, 4)
