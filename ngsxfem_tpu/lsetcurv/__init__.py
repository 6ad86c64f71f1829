from .lsetcurv import LevelSetMeshAdaptation  # noqa: F401
