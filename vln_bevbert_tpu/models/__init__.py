from .bert import (
    BertEmbeddings,
    BertLayer,
    BertXLayer,
    MlmHead,
    PanoEncoderLayer,
)
from .encoders import (
    GlobalMapEncoder,
    ImageEmbeddings,
    LanguageEncoder,
    LocalBEVEncoder,
)
from .clip import ClipVisionTower
from .depth_encoder import DdppoDepthEncoder
from .glocal import GlocalTextPathCMT, GlocalTextPathCMTPreTraining
from .nav import Critic, GlocalTextPathNavCMT

__all__ = [
    "BertEmbeddings",
    "BertLayer",
    "BertXLayer",
    "MlmHead",
    "PanoEncoderLayer",
    "LanguageEncoder",
    "ImageEmbeddings",
    "GlobalMapEncoder",
    "LocalBEVEncoder",
    "GlocalTextPathCMT",
    "GlocalTextPathCMTPreTraining",
    "GlocalTextPathNavCMT",
    "Critic",
    "ClipVisionTower",
    "DdppoDepthEncoder",
]
