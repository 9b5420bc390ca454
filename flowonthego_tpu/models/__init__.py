from .dis_flow import DISFlow, compute_flow, dis_flow_padded

__all__ = ["DISFlow", "compute_flow", "dis_flow_padded"]
