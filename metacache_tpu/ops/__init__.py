from . import encode, hashes, sketch  # noqa: F401
