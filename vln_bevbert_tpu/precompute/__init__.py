from .pipeline import (
    ClipEncoder,
    JaxClipEncoder,
    RandomProjectionEncoder,
    SyntheticImageSource,
    build_feature_files,
)

__all__ = [
    "build_feature_files",
    "SyntheticImageSource",
    "RandomProjectionEncoder",
    "ClipEncoder",
    "JaxClipEncoder",
]
