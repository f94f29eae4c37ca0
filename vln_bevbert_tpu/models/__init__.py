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
from .glocal import GlocalTextPathCMT, GlocalTextPathCMTPreTraining
from .nav import GlocalTextPathNavCMT

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
]
