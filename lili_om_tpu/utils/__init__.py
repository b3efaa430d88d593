from . import math  # noqa: F401
from .timing import Timer  # noqa: F401
