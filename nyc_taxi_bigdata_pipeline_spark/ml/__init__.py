from . import errors, features, predict, registry, train

__all__ = ["errors", "features", "predict", "registry", "train"]
