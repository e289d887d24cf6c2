from .frontend import SpectrogramFrontend, FrontendResult  # noqa: F401
from .wavio import load_audio  # noqa: F401
