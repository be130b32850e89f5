from .state import ObjectRecord, SlamState  # noqa: F401
from .system import System  # noqa: F401
from .tracking import Tracking  # noqa: F401
