from .detector import NbmModel, build_model  # noqa: F401
