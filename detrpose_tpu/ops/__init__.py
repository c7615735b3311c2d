from .grid_sample import bilinear_grid_sample
from .ms_deform_attn import ms_deform_attn
from .fdr import weighting_function, integral, distance2pose
from .pos_embed import sine_embedding_2d, sine_hw_position_embedding
from .oks import oks, keypoint_sigmas
from .misc import inverse_sigmoid

__all__ = [
    "bilinear_grid_sample",
    "ms_deform_attn",
    "weighting_function",
    "integral",
    "distance2pose",
    "sine_embedding_2d",
    "sine_hw_position_embedding",
    "oks",
    "keypoint_sigmas",
    "inverse_sigmoid",
]
