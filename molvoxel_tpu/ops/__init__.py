from .dense import voxelize_dense, voxelize_dense_channelwise

__all__ = ["voxelize_dense", "voxelize_dense_channelwise"]
