from openmvs_tpu.io import dmap, mvs, ply

__all__ = ["mvs", "dmap", "ply"]
