from openmvs_tpu.geometry.camera import Camera, scale_K, compose_P

__all__ = ["Camera", "scale_K", "compose_P"]
