from .flo import read_flo, write_flo, unknown_flow_mask, TAG_FLOAT, UNKNOWN_FLOW_THRESH
from .images import load_image, save_image
from .color import flow_to_color, make_color_wheel, compute_color
from .pfm import read_pfm, write_pfm

__all__ = [
    "read_flo", "write_flo", "unknown_flow_mask", "TAG_FLOAT",
    "UNKNOWN_FLOW_THRESH", "load_image", "save_image", "flow_to_color",
    "make_color_wheel", "compute_color", "read_pfm", "write_pfm",
]
