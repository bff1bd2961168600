from . import errors, features, registry, train

__all__ = ["errors", "features", "registry", "train"]
