from .args import ArgsParser  # noqa: F401
from .timer import Timer  # noqa: F401
