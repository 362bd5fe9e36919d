from .flash_attention import flash_area_attention

__all__ = ["flash_area_attention"]
