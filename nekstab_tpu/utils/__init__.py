from .sponge import sponge_fun_box, step_smooth
from .noise import add_noise, symmetric_seed

__all__ = ["sponge_fun_box", "step_smooth", "add_noise", "symmetric_seed"]
