import functools
import inspect


class _Config(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def register_to_config(init):
    @functools.wraps(init)
    def wrapped(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items()
               if k not in ("self",) and not k.startswith("_")}
        self._internal_config = _Config(cfg)
        init(self, *args, **kwargs)
    return wrapped


class ConfigMixin:
    @property
    def config(self):
        return getattr(self, "_internal_config", _Config())

    @classmethod
    def from_config(cls, config: dict):
        sig = inspect.signature(cls.__init__)
        kwargs = {k: v for k, v in config.items()
                  if k in sig.parameters and k != "self"}
        return cls(**kwargs)
