from .fused_act import fused_snake_activation1d

__all__ = ["fused_snake_activation1d"]
