from .pipeline import (
    ClipEncoder,
    RandomProjectionEncoder,
    SyntheticImageSource,
    build_feature_files,
)

__all__ = [
    "build_feature_files",
    "SyntheticImageSource",
    "RandomProjectionEncoder",
    "ClipEncoder",
]
