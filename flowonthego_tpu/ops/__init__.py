from . import pyramid, patches, interp, dis, densify, variational

__all__ = ["pyramid", "patches", "interp", "dis", "densify", "variational"]
